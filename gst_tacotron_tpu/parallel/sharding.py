"""Parameter partitioning rules (tensor parallelism; SURVEY.md §2.3).

The model is small enough that most parameters replicate; the targeted
tensor-parallel shards (BASELINE.json:5 "decoder and style-token attention
sharded where they exceed one chip") are expressed as regex rules from
parameter tree paths to PartitionSpecs. `jit` with these shardings lets
GSPMD insert the all-gathers/reduce-scatters over the `model` axis — the
TPU-native replacement for hand-written NCCL calls.

Rules (path regex -> spec over (in_dim, out_dim) kernels):
  * style-token attention projections: output-dim sharded (heads split)
  * decoder frame/stop projections and decoder-input projection: output-dim
  * decoder GRU kernels: output-dim (gate blocks split)
  * embedding tables: vocab-dim sharded
Biases stay replicated (tiny).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

# (path regex, PartitionSpec factory by rank)
_RULES: List[Tuple[str, Dict[int, P]]] = [
    (r".*stl/(query_proj|key_proj|value_proj)/kernel$", {2: P(None, MODEL_AXIS)}),
    (r".*decoder/cell/frame_proj/kernel$", {2: P(None, MODEL_AXIS)}),
    (r".*decoder/cell/decoder_input_proj/kernel$", {2: P(None, MODEL_AXIS)}),
    (r".*decoder/cell/decoder_rnn_\d+/kernel$", {2: P(None, MODEL_AXIS)}),
    # feature-dim sharding (vocab sizes are small and rarely divisible)
    (r".*encoder/embedding/embedding$", {2: P(None, MODEL_AXIS)}),
    # WaveRNN vocoder: matches both an embedded `wavernn/...` subtree and the
    # standalone VocoderTrainer tree (anchored at root so the GST reference
    # encoder's nested `.../gru/...` params never match)
    (r".*wavernn.*/(gru|fc1|fc2)/(kernel|recurrent_kernel)$",
     {2: P(None, MODEL_AXIS)}),
    (r"^(gru|fc1|fc2|cond_proj)/(kernel|recurrent_kernel)$",
     {2: P(None, MODEL_AXIS)}),
]


def spec_for_path(path: str, ndim: int) -> P:
    for pattern, by_rank in _RULES:
        if re.match(pattern, path) and ndim in by_rank:
            return by_rank[ndim]
    return P()  # replicate


def _flatten_paths(tree: Any, prefix: str = "") -> Dict[str, Any]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten_paths(v, f"{prefix}/{k}" if prefix else k))
    else:
        out[prefix] = tree
    return out


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """PyTree of NamedShardings matching `params` (for jit in_shardings)."""

    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            return {
                k: walk(v, f"{prefix}/{k}" if prefix else k)
                for k, v in tree.items()
            }
        spec = spec_for_path(prefix, getattr(tree, "ndim", 0))
        return NamedSharding(mesh, spec)

    return walk(params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a parameter tree onto the mesh per the TP rules."""
    shardings = param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def state_shardings(state: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for a TrainState: params per the TP rules, Adam
    moments (mu/nu mirror the param tree) sharded identically so the donated
    step's output shardings match its inputs, everything else replicated."""
    rep = NamedSharding(mesh, P())
    pshard = param_shardings(state.params, mesh)

    def opt_entry(s):
        base = jax.tree_util.tree_map(lambda _: rep, s)
        if hasattr(s, "mu") and hasattr(s, "nu"):
            return base._replace(mu=pshard, nu=pshard)
        return base

    opt = state.opt_state
    opt_sh = (tuple(opt_entry(s) for s in opt)
              if isinstance(opt, tuple) else opt_entry(opt))
    sh = jax.tree_util.tree_map(lambda _: rep, state)
    return sh.replace(params=pshard, opt_state=opt_sh)


def place_state(state: Any, mesh: Mesh) -> Any:
    """Place a TrainState onto a (possibly multi-process) mesh: TP-sharded
    params + matching optimizer moments, replicated rest. The host values
    must be identical on every process (init is deterministic per seed and
    orbax restore is coordinated), exactly as replicate_tree assumes."""
    from .mesh import place_tree

    return place_tree(jax.device_get(state), state_shardings(state, mesh))


def describe_sharding(params: Any) -> Dict[str, str]:
    """Human-readable {path: spec} map for the sharded params (debugging)."""
    flat = _flatten_paths(params)
    return {
        path: str(spec_for_path(path, getattr(v, "ndim", 0)))
        for path, v in flat.items()
    }
