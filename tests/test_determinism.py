"""Deterministic-PRNG training test (SURVEY.md §5 "Race detection /
sanitizers": deterministic-PRNG tests): identically-seeded trainers produce
bit-identical parameters; a different seed diverges."""

import jax
import numpy as np
import pytest

from gst_tacotron_tpu.config import apply_overrides
from gst_tacotron_tpu.data import generate_patterns, synthetic_utterances
from gst_tacotron_tpu.train import Trainer

from tests.test_train_smoke import small_cfg


@pytest.fixture(scope="module")
def patterns(tmp_path_factory):
    cfg = small_cfg()
    out = str(tmp_path_factory.mktemp("p"))
    generate_patterns(synthetic_utterances(6), cfg.audio, out)
    return out


def _train(patterns, tmp_path, name, seed):
    cfg = apply_overrides(small_cfg(), {"train.seed": seed})
    trainer = Trainer(cfg, patterns, str(tmp_path / name))
    return jax.device_get(trainer.train(total_steps=3).params)


def test_same_seed_bitwise_identical(patterns, tmp_path):
    p1 = _train(patterns, tmp_path, "a", seed=7)
    p2 = _train(patterns, tmp_path, "b", seed=7)
    for l1, l2 in zip(jax.tree_util.tree_leaves(p1),
                      jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_different_seed_diverges(patterns, tmp_path):
    p1 = _train(patterns, tmp_path, "c", seed=7)
    p2 = _train(patterns, tmp_path, "d", seed=8)
    diff = any(
        not np.array_equal(np.asarray(l1), np.asarray(l2))
        for l1, l2 in zip(jax.tree_util.tree_leaves(p1),
                          jax.tree_util.tree_leaves(p2))
    )
    assert diff
