"""Parity harness (SURVEY.md §7 stage 10): mel MAE / allclose report between
a candidate model and golden fixtures.

Golden fixtures are (text, ref_wav?, expected_mel) triples stored as .npz.
With a populated reference checkout + checkpoint, generate fixtures from the
reference (tf_import.py) and run this harness; until then the harness also
serves as a self-regression gate (fixtures from an earlier build of this
framework)."""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

from .synthesize import Synthesizer


@dataclass
class ParityResult:
    name: str
    mel_mae: float
    mel_max_err: float
    mcd_db: float
    allclose_1e2: bool
    allclose_1e3: bool


def save_fixture(path: str, text: str, mel: np.ndarray,
                 ref_wav: Optional[np.ndarray] = None) -> None:
    arrays = {"text": np.str_(text), "mel": mel.astype(np.float32)}
    if ref_wav is not None:
        arrays["ref_wav"] = ref_wav.astype(np.float32)
    np.savez_compressed(path, **arrays)


def run_parity(synth: Synthesizer, fixture_dir: str,
               report_path: Optional[str] = None) -> List[ParityResult]:
    results = []
    for fname in sorted(os.listdir(fixture_dir)):
        if not fname.endswith(".npz"):
            continue
        with np.load(os.path.join(fixture_dir, fname), allow_pickle=False) as z:
            if "text" not in z or "mel" not in z:
                continue  # non-fixture npz (e.g. the golden params pack)
            text = str(z["text"])
            expected = z["mel"]
            ref_wav = z["ref_wav"] if "ref_wav" in z else None
        out = synth([text],
                    reference_wavs=[ref_wav] if ref_wav is not None else None,
                    seed=0)
        frames = min(int(out["frame_lengths"][0]), expected.shape[0])
        got = out["mel"][0, :frames]
        exp = expected[:frames]
        err = np.abs(got - exp)
        from .metrics import mel_cepstral_distortion

        results.append(ParityResult(
            name=fname,
            mel_mae=float(err.mean()),
            mel_max_err=float(err.max()),
            mcd_db=mel_cepstral_distortion(got, exp),
            allclose_1e2=bool(np.allclose(got, exp, atol=1e-2)),
            allclose_1e3=bool(np.allclose(got, exp, atol=1e-3)),
        ))
    if report_path:
        with open(report_path, "w") as f:
            json.dump([r.__dict__ for r in results], f, indent=2)
    return results
