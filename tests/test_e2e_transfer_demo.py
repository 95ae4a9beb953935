"""Committed flagship real-audio e2e style-transfer evidence (ref:
inference/inference_e2e_style_transfer.py:439-466 bundle layout;
test_tcn_style_transfer.py "converged >= 20% reduction" criterion).

`artifacts/e2e_transfer_demo/` is produced by
`scripts/make_e2e_transfer_demo.sh`:

  input   = the reference's real asset song_A.wav, separated by the
            committed SCNet artifact
  target  = the SAME separated stems re-mixed under a fresh mixing style
            (separation/synth_v2.render_style, seed 5) — content held
            fixed so the transfer target is well-posed on real audio
  both mixtures gain-staged to -16 dB RMS, the synth training operating
  point (the raw asset sits ~11 dB below it; the conv stack is not
  scale-equivariant)
  stage 1 = zero-shot trained v2 encoder + FiLM-TCN forward pass
  stage 2 = 200-step per-pair optimization (eval/per_pair.py)

These tests validate the committed bundle's metadata against the
protocol's expectations; regeneration is deterministic on forced CPU.
"""

import json
import wave
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]
DEMO = ROOT / "artifacts" / "e2e_transfer_demo"


@pytest.fixture(scope="module")
def meta():
    if not (DEMO / "metadata.json").exists():
        pytest.skip("e2e transfer demo bundle not committed")
    m = json.loads((DEMO / "metadata.json").read_text())
    if "per_pair" not in m:
        pytest.skip("bundle predates stage 2 (regeneration in flight)")
    return m


def test_bundle_complete(meta):
    for name in ("input_mix", "target_mix", "transferred_mix",
                 "transferred_vocals", "transferred_bass",
                 "transferred_drums", "transferred_other",
                 "optimized_mix"):
        path = DEMO / f"{name}.wav"
        assert path.exists(), name
        with wave.open(str(path)) as w:
            assert w.getnframes() / w.getframerate() >= 9.0, name
    for key in ("initial_distance", "final_distance", "improvement",
                "transfer_quality", "baseline_quality", "per_pair",
                "gain_stage", "config"):
        assert key in meta, key


def test_protocol_pinned(meta):
    """The committed bundle must be the documented protocol, not a stray
    run: real asset, self-target style seed 5, -16 dB staging."""
    assert meta["input_audio"].endswith("song_A.wav")
    assert meta["self_target_style_seed"] == 5
    assert meta["gain_stage_rms_db"] == -16
    # staging recorded for both mixtures, and the raw asset really is the
    # quiet one the staging exists for
    assert meta["gain_stage"]["input"]["raw_rms_db"] < -20
    assert meta["gain_stage"]["input"]["gain"] > 1.0


def test_zero_shot_moves_spectrum_toward_target(meta):
    """The zero-shot TCN pass must beat the do-nothing baseline on the
    spectral axes the mixing style changes (centroid); level axes are
    already matched by the gain staging so they cannot improve."""
    tq, bq = meta["transfer_quality"], meta["baseline_quality"]
    assert tq["spectral_centroid_diff"] < bq["spectral_centroid_diff"], (
        tq["spectral_centroid_diff"], bq["spectral_centroid_diff"])


def test_per_pair_stage_converges(meta):
    """Stage 2 is the reference's own per-pair protocol; its 'converged'
    criterion (>= 20% embedding-distance reduction,
    test_tcn_style_transfer.py) must hold on the committed bundle."""
    pp = meta["per_pair"]
    assert pp["steps"] >= 100
    assert pp["converged"] is True
    assert pp["improvement"] >= 0.2, pp["improvement"]
    assert pp["final_distance"] < meta["initial_distance"]
