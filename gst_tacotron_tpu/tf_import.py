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


def convert_conv_bank(kernels) -> np.ndarray:
    """K Keras Conv1D SAME kernels (widths 1..K, each (k, C_in, C_out)) ->
    our ConvBankBlock's fused `bank_kernel` block matrix
    (nshift*C_in, K*C_out); see models/modules.py::ConvBankBlock.tap_mask.

    Output position t of width-k SAME conv reads x[t + j - (k-1)//2] * W[j];
    our shifted-copy s covers x[t + s], so tap j of conv k lands in shift
    block s = j - (k-1)//2.
    """
    bank_k = len(kernels)
    c_in, channels = kernels[0].shape[1], kernels[0].shape[2]
    smin = -((bank_k - 1) // 2)
    smax = bank_k // 2
    nshift = smax - smin + 1
    w4 = np.zeros((nshift, c_in, bank_k, channels), np.float32)
    for k in range(1, bank_k + 1):
        kern = np.asarray(kernels[k - 1], np.float32)
        assert kern.shape == (k, c_in, channels), kern.shape
        for j in range(k):
            w4[j - (k - 1) // 2 - smin, :, k - 1, :] = kern[j]
    return w4.reshape(nshift * c_in, bank_k * channels)


def import_cbhg(arrays: Mapping[str, np.ndarray], prefix: str, bank_k: int,
                num_projs: int, num_highways: int
                ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Keras CBHG (export convention of tests/keras_ref_model.py::KerasCBHG)
    at `prefix` -> (params, batch_stats) subtrees for models/modules.py::CBHG."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["bank"] = {"bank_kernel": convert_conv_bank([
        keras_variable(arrays, f"{prefix}/bank_conv_{k}", "kernel")
        for k in range(bank_k)
    ])}
    bn_p, bn_s = keras_bn_params(arrays, f"{prefix}/bank_bn")
    params["bank"]["bn"] = bn_p
    stats["bank"] = {"bn": bn_s}
    for i in range(num_projs):
        params[f"proj_{i}"] = {
            "kernel": keras_variable(arrays, f"{prefix}/proj_{i}", "kernel")}
        p, s = keras_bn_params(arrays, f"{prefix}/proj_bn_{i}")
        params[f"proj_bn_{i}"] = p
        stats[f"proj_bn_{i}"] = s
    for opt in ("residual_proj", "pre_highway"):
        key = f"{prefix}/{opt}/kernel{_ATTR}"
        alt = f"{prefix}/{opt}/_kernel{_ATTR}"
        if key in arrays or alt in arrays:
            params[opt] = {
                "kernel": keras_variable(arrays, f"{prefix}/{opt}", "kernel"),
                "bias": keras_variable(arrays, f"{prefix}/{opt}", "bias"),
            }
    for i in range(num_highways):
        params[f"highway_{i}"] = {
            "h": {
                "kernel": keras_variable(arrays, f"{prefix}/highway_{i}_h", "kernel"),
                "bias": keras_variable(arrays, f"{prefix}/highway_{i}_h", "bias"),
            },
            "t": {
                "kernel": keras_variable(arrays, f"{prefix}/highway_{i}_t", "kernel"),
                "bias": keras_variable(arrays, f"{prefix}/highway_{i}_t", "bias"),
            },
        }
    params["bigru"] = {
        "forward": keras_gru_params(arrays, f"{prefix}/gru_fwd"),
        "backward": keras_gru_params(arrays, f"{prefix}/gru_bwd"),
    }
    return params, stats


def _dense(arrays, prefix, use_bias=True) -> Dict[str, np.ndarray]:
    p = {"kernel": keras_variable(arrays, prefix, "kernel")}
    if use_bias:
        p["bias"] = keras_variable(arrays, prefix, "bias")
    return p


def import_gst_tacotron(ckpt_path: str, cfg) -> Dict[str, Any]:
    """Import a FULL reference-architecture checkpoint (export convention of
    tests/keras_ref_model.py::KerasGSTTacotron.save_checkpoint) into the
    complete GSTTacotron variable tree {"params", "batch_stats"}.

    cfg is our ModelConfig: layer counts/kinds are read from it, so the same
    importer covers Bahdanau and location-sensitive decoder cells and both
    CBHGs. (SURVEY.md §5 "one-way importer ... for the allclose-parity
    tests"; the reference mount is empty, so the naming convention is defined
    by keras_ref_model.py — a populated reference checkpoint would be
    re-exported into it by a ~30-line re-save script.)
    """
    arrays = load_tf_checkpoint_arrays(ckpt_path)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    # -- encoder
    enc_p: Dict[str, Any] = {
        "embedding": {
            "embedding": keras_variable(arrays, "encoder/embedding",
                                        "embeddings")},
        "prenet": {
            f"dense_{i}": _dense(arrays, f"encoder/prenet_{i}")
            for i in range(len(cfg.encoder.prenet_dims))},
    }
    cb_p, cb_s = import_cbhg(
        arrays, "encoder/cbhg", cfg.encoder.cbhg_bank_k,
        len(cfg.encoder.cbhg_proj_channels), cfg.encoder.cbhg_highway_layers)
    enc_p["cbhg"] = cb_p
    params["encoder"] = enc_p
    stats["encoder"] = {"cbhg": cb_s}

    # -- GST
    if cfg.gst.enabled:
        ref_p: Dict[str, Any] = {}
        ref_s: Dict[str, Any] = {}
        for i in range(len(cfg.gst.ref_conv_channels)):
            ref_p[f"conv_{i}"] = {
                "kernel": keras_variable(arrays, f"gst/ref_conv_{i}", "kernel")}
            p, s = keras_bn_params(arrays, f"gst/ref_bn_{i}")
            ref_p[f"bn_{i}"] = p
            ref_s[f"bn_{i}"] = s
        ref_p["gru"] = keras_gru_params(arrays, "gst/ref_gru")
        params["gst"] = {
            "reference_encoder": ref_p,
            "stl": {
                "tokens": arrays[f"gst/tokens{_ATTR}"],
                "query_proj": _dense(arrays, "gst/stl_q", use_bias=False),
                "key_proj": _dense(arrays, "gst/stl_k", use_bias=False),
                "value_proj": _dense(arrays, "gst/stl_v", use_bias=False),
            },
        }
        stats["gst"] = {"reference_encoder": ref_s}

    # -- decoder cell
    attn_p: Dict[str, Any] = {
        "query_proj": _dense(arrays, "decoder/attn_query", use_bias=False),
        "memory_proj": _dense(arrays, "decoder/attn_memory", use_bias=False),
        "score_v": _dense(arrays, "decoder/attn_v", use_bias=False),
    }
    if cfg.attention.kind == "location_sensitive":
        attn_p["location_conv"] = {
            "kernel": keras_variable(arrays, "decoder/loc_conv", "kernel")}
        attn_p["location_proj"] = _dense(arrays, "decoder/loc_proj",
                                         use_bias=False)
    cell_p: Dict[str, Any] = {
        "prenet": {
            f"dense_{i}": _dense(arrays, f"decoder/prenet_{i}")
            for i in range(len(cfg.decoder.prenet_dims))},
        "attention_rnn": keras_gru_params(arrays, "decoder/attention_rnn"),
        "attention": attn_p,
        "decoder_input_proj": _dense(arrays, "decoder/dec_input_proj"),
        "frame_proj": _dense(arrays, "decoder/frame_proj"),
        "stop_proj": _dense(arrays, "decoder/stop_proj"),
    }
    for i in range(cfg.decoder.num_decoder_rnn_layers):
        cell_p[f"decoder_rnn_{i}"] = keras_gru_params(arrays,
                                                      f"decoder/rnn_{i}")
    params["decoder"] = {"cell": cell_p}

    # -- postnet
    po_p, po_s = import_cbhg(
        arrays, "postnet/cbhg", cfg.postnet.cbhg_bank_k,
        len(cfg.postnet.cbhg_proj_channels), cfg.postnet.cbhg_highway_layers)
    params["postnet"] = {
        "cbhg": po_p,
        "linear_proj": _dense(arrays, "postnet/linear"),
    }
    stats["postnet"] = {"cbhg": po_s}

    def to_jnp(tree):
        return {k: (to_jnp(v) if isinstance(v, dict) else np.asarray(v))
                for k, v in tree.items()}

    return {"params": to_jnp(params), "batch_stats": to_jnp(stats)}


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
