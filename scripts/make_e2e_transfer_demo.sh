#!/usr/bin/env bash
# Regenerates the committed flagship real-audio e2e transfer demo bundle
# (artifacts/e2e_transfer_demo/) — the protocol tests/test_e2e_transfer_demo.py
# regression-checks.
#
# Protocol (ref: inference/inference_e2e_style_transfer.py:439-466 bundle
# layout; test_tcn_style_transfer.py per-pair converged criterion):
#   input   = the reference's real asset song_A.wav (10 s segment),
#             separated by the committed SCNet artifact
#   target  = the SAME separated stems re-mixed under a fresh mixing style
#             (separation/synth_v2.render_style, seed 5 — the most distinct
#             of seeds 1..16 at embedding initial_distance 0.18 raw /
#             0.30 gain-staged)
#   both mixtures gain-staged to -16 dB RMS, the synth training operating
#   point (real asset sits ~11 dB below it; the conv stack is not
#   scale-equivariant)
#   stage 1 = zero-shot trained v2 encoder + FiLM-TCN forward pass
#   stage 2 = 200-step per-pair optimization (eval/per_pair.py)
#
# Deterministic given the committed artifacts; runs on forced CPU so CI can
# reproduce it bit-for-bit (the QA programs' long sequential scans are also
# wedge-prone on the remote-compile axon backend).
set -euo pipefail
cd "$(dirname "$0")/.."

python - << 'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
from mst_tpu.cli.inference_e2e_style_transfer import main
main(["--input_audio", "/root/reference/assets/song_A.wav",
      "--self_target_style_seed", "5",
      "--gain_stage_rms_db", "-16",
      "--per_pair_steps", "200",
      "--encoder_npz", "artifacts/encoder_synth2_best.npz",
      "--tcn_npz", "artifacts/tcn_synth2_best.npz",
      "--output_dir", "artifacts/e2e_transfer_demo"])
EOF
