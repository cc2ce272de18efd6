"""One-way TF2 checkpoint importer (SURVEY.md §5 "Checkpoint/resume":
"a one-way importer that can load the reference TF checkpoint for the
allclose-parity tests").

Status: the reference mount was EMPTY at build time (SURVEY.md provenance
notice), so the exact variable names of the reference checkpoint cannot be
cited. This module therefore implements the mechanically hard part —
layout/semantics conversion — behind a configurable name map:

  * TF checkpoint reading via `tf.train.load_checkpoint` (TF 2.21 is in the
    image for exactly this purpose; it is NOT a runtime dependency).
  * Keras GRU (v2, reset_after=True) -> our GRUCell: Keras stores
    kernel (D, 3H), recurrent_kernel (H, 3H), bias (2, 3H) with gate order
    [z, r, n]; ours is identical except the bias splits into `bias` (input)
    and `recurrent_bias`. Gate order needs no permutation (models/rnn.py).
  * Keras Dense/Conv kernels are already (in, out) / (k, in, out) — same as
    flax; Conv2D (kh, kw, in, out) — same.
  * Keras BatchNorm {gamma, beta, moving_mean, moving_variance} ->
    flax {scale, bias, batch_stats.mean, batch_stats.var}.

When a populated reference checkpoint exists, supply `name_map` entries
(reference variable path -> our param tree path) and call `import_checkpoint`.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import numpy as np


def convert_keras_gru(kernel: np.ndarray, recurrent_kernel: np.ndarray,
                      bias: np.ndarray) -> Dict[str, np.ndarray]:
    """Keras v2 GRU variables -> our GRUCell params (reset_after=True)."""
    if bias.ndim == 2:  # (2, 3H): [input bias, recurrent bias]
        input_bias, recurrent_bias = bias[0], bias[1]
    else:  # reset_after=False checkpoints: single fused bias
        input_bias, recurrent_bias = bias, np.zeros_like(bias)
    return {
        "kernel": kernel,
        "recurrent_kernel": recurrent_kernel,
        "bias": input_bias,
        "recurrent_bias": recurrent_bias,
    }


def convert_keras_batchnorm(gamma, beta, moving_mean, moving_variance
                            ) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """-> (params {scale, bias}, batch_stats {mean, var})."""
    return (
        {"scale": gamma, "bias": beta},
        {"mean": moving_mean, "var": moving_variance},
    )


def load_tf_checkpoint_arrays(ckpt_path: str) -> Dict[str, np.ndarray]:
    """All variables of a TF checkpoint as {name: np.ndarray}."""
    import tensorflow as tf  # local import: TF is an import-only dependency

    reader = tf.train.load_checkpoint(ckpt_path)
    shapes = reader.get_variable_to_shape_map()
    return {name: reader.get_tensor(name) for name in shapes}


def set_in_tree(tree: Dict[str, Any], path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def import_checkpoint(
    ckpt_path: str,
    name_map: Mapping[str, str],
    converters: Optional[Mapping[str, Callable[..., Any]]] = None,
) -> Dict[str, Any]:
    """Build a flax-style param dict from a TF checkpoint.

    name_map: {tf_variable_name: our_param_path}; paths use '/' separators.
    converters: optional {our_param_path_prefix: fn(**tf_arrays) -> subtree}
    for grouped conversions (GRU, BatchNorm).
    """
    arrays = load_tf_checkpoint_arrays(ckpt_path)
    params: Dict[str, Any] = {}
    for tf_name, our_path in name_map.items():
        if tf_name not in arrays:
            raise KeyError(f"variable {tf_name!r} not in checkpoint")
        set_in_tree(params, our_path, arrays[tf_name])
    return params
