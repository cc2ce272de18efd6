"""Flat-buffer parameter passing for inference programs.

Measured on the axon v5e runtime: every ARGUMENT BUFFER of a jitted program
costs ~10 ms of per-call overhead, so a 44-leaf parameter tree adds ~450 ms
to every invocation of an otherwise-microseconds encoder (CLAUDE.md). The
fix: concatenate the whole tree into one buffer per dtype on the host, pass
those few buffers, and carve the original leaves back out INSIDE the
compiled program (static slices + reshapes — free at run time).

Usage:
    fp = FlatTree(variables)          # host-side, once per checkpoint
    @jax.jit
    def f(flat, x):
        variables = fp.unpack(flat)   # inside the trace
        ...
    f(fp.flat, x)
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class FlatTree:
    def __init__(self, tree: Any):
        leaves, self.treedef = jax.tree_util.tree_flatten(tree)
        self.shapes: List[Tuple[int, ...]] = [tuple(l.shape) for l in leaves]
        self.dtypes = [jnp.asarray(l).dtype for l in leaves]
        # group leaves by dtype -> one buffer each
        self.groups: Dict[str, List[int]] = {}
        for i, dt in enumerate(self.dtypes):
            self.groups.setdefault(str(dt), []).append(i)
        self.offsets: Dict[str, List[int]] = {}
        buffers: Dict[str, jnp.ndarray] = {}
        for dt, idxs in self.groups.items():
            offs, cursor, parts = [], 0, []
            for i in idxs:
                size = int(np.prod(self.shapes[i])) if self.shapes[i] else 1
                offs.append(cursor)
                cursor += size
                parts.append(jnp.ravel(jnp.asarray(leaves[i])))
            self.offsets[dt] = offs
            buffers[dt] = (
                jnp.concatenate(parts) if parts else
                jnp.zeros((0,), jnp.dtype(dt))
            )
        # deterministic ordering of buffers
        self.dtype_order = sorted(buffers)
        self.flat: Tuple[jnp.ndarray, ...] = tuple(
            buffers[d] for d in self.dtype_order
        )

    def unpack(self, flat: Tuple[jnp.ndarray, ...]) -> Any:
        """Rebuild the original tree from the flat buffers (trace-time)."""
        by_dtype = dict(zip(self.dtype_order, flat))
        leaves: List[Any] = [None] * len(self.shapes)
        for dt, idxs in self.groups.items():
            buf = by_dtype[dt]
            for off, i in zip(self.offsets[dt], idxs):
                size = int(np.prod(self.shapes[i])) if self.shapes[i] else 1
                leaves[i] = buf[off : off + size].reshape(self.shapes[i])
        return jax.tree_util.tree_unflatten(self.treedef, leaves)

    @property
    def num_buffers(self) -> int:
        return len(self.flat)
