"""Pallas TPU kernels for the named hot paths (SURVEY.md §2.2):
mel-STFT features, fused decode step, WaveRNN sampling."""

from .stft_pallas import PallasDSP, stft_features_pallas

__all__ = ["PallasDSP", "stft_features_pallas"]
