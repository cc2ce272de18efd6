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

from typing import Any, Dict, Mapping, Tuple

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
) -> Dict[str, Any]:
    """Build a flax-style param dict from a TF checkpoint.

    name_map: {tf_variable_name: our_param_path}; paths use '/' separators.
    Grouped conversions (GRU, BatchNorm) go through `keras_gru_params` /
    `keras_bn_params` on the loaded array dict instead.
    """
    arrays = load_tf_checkpoint_arrays(ckpt_path)
    params: Dict[str, Any] = {}
    for tf_name, our_path in name_map.items():
        if tf_name not in arrays:
            raise KeyError(f"variable {tf_name!r} not in checkpoint")
        set_in_tree(params, our_path, arrays[tf_name])
    return params


# ---------------------------------------------------------------------------
# Keras object-graph checkpoint helpers
# ---------------------------------------------------------------------------

_ATTR = "/.ATTRIBUTES/VARIABLE_VALUE"


def keras_variable(arrays: Mapping[str, np.ndarray], prefix: str,
                   name: str) -> np.ndarray:
    """Fetch `<prefix>/<name>/.ATTRIBUTES/VARIABLE_VALUE` from a loaded
    `tf.train.Checkpoint` array dict (the object-graph naming scheme)."""
    key = f"{prefix}/{name}{_ATTR}"
    if key not in arrays:
        # Keras 3 stores some layer variables under private attribute names
        # (e.g. Conv2D kernel -> "_kernel")
        head, _, leaf = name.rpartition("/")
        alt = f"{prefix}/{head + '/' if head else ''}_{leaf}{_ATTR}"
        if alt in arrays:
            return arrays[alt]
        close = sorted(k for k in arrays if k.startswith(prefix))
        raise KeyError(f"{key!r} not in checkpoint; variables under the "
                       f"prefix: {close}")
    return arrays[key]


def keras_gru_params(arrays: Mapping[str, np.ndarray], prefix: str
                     ) -> Dict[str, np.ndarray]:
    """Keras GRU layer at `prefix` (cell/kernel, cell/recurrent_kernel,
    cell/bias) -> our GRU/GRUCell param subtree."""
    try:
        kernel = keras_variable(arrays, prefix, "cell/kernel")
        rec = keras_variable(arrays, prefix, "cell/recurrent_kernel")
        bias = keras_variable(arrays, prefix, "cell/bias")
    except KeyError:
        # layers checkpointed without the cell wrapper (tf.keras.layers.GRU
        # exposes the variables at the layer level too)
        kernel = keras_variable(arrays, prefix, "kernel")
        rec = keras_variable(arrays, prefix, "recurrent_kernel")
        bias = keras_variable(arrays, prefix, "bias")
    return convert_keras_gru(kernel, rec, bias)


def keras_bn_params(arrays: Mapping[str, np.ndarray], prefix: str
                    ) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """Keras BatchNormalization at `prefix` -> (params, batch_stats)."""
    return convert_keras_batchnorm(
        keras_variable(arrays, prefix, "gamma"),
        keras_variable(arrays, prefix, "beta"),
        keras_variable(arrays, prefix, "moving_mean"),
        keras_variable(arrays, prefix, "moving_variance"),
    )


def import_reference_encoder(ckpt_path: str, num_conv_layers: int,
                             conv_prefix: str = "conv", bn_prefix: str = "bn",
                             gru_prefix: str = "gru") -> Dict[str, Any]:
    """Import a Keras reference-encoder checkpoint (conv2d-s2 stack + BN +
    GRU; SURVEY.md §2.1 "GST reference encoder") saved as
    `tf.train.Checkpoint(conv0=…, bn0=…, …, gru=…)` into our
    ReferenceEncoder variable tree {"params": …, "batch_stats": …}."""
    arrays = load_tf_checkpoint_arrays(ckpt_path)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in range(num_conv_layers):
        params[f"conv_{i}"] = {
            "kernel": keras_variable(arrays, f"{conv_prefix}{i}", "kernel")
        }
        bn_p, bn_s = keras_bn_params(arrays, f"{bn_prefix}{i}")
        params[f"bn_{i}"] = bn_p
        stats[f"bn_{i}"] = bn_s
    params["gru"] = keras_gru_params(arrays, gru_prefix)
    return {"params": params, "batch_stats": stats}
