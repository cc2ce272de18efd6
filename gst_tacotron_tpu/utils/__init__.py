"""Utility subsystems: profiling, debugging (SURVEY.md §5)."""

from .profiling import profile_trace, maybe_start_server

__all__ = ["profile_trace", "maybe_start_server"]
