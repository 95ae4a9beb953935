#!/usr/bin/env bash
# Regenerates the committed flagship real-audio e2e transfer bundles
# (artifacts/e2e_transfer_demo/ + artifacts/e2e_transfer_demo_cross/) —
# the protocols tests/test_e2e_transfer_demo.py regression-checks.
#
# Protocol (ref: inference/inference_e2e_style_transfer.py:439-466 bundle
# layout; test_tcn_style_transfer.py per-pair converged criterion):
#
# Bundle 1 (self-target, content held fixed):
#   input   = the reference's real asset song_A.wav (10 s segment),
#             separated by the flagship SCNet artifact
#   target  = the SAME separated stems re-mixed under a fresh mixing style
#             (separation/synth_v2.render_style, seed 5)
#   stage 1 = zero-shot separator-domain FiLM-TCN forward pass
#   stage 2 = 200-step per-pair optimization (eval/per_pair.py)
#
# Bundle 2 (cross-content, the reference's two-different-songs protocol
# approximated on the one available asset,
# ref: inference_e2e_style_transfer.py:249-253):
#   input   = song_A 7 s segment @ 0.0 s
#   target  = a DISJOINT 7 s segment @ 7.6 s under a different style
#             (--target_style_seed): different content AND known style gap
#
# Gain staging to -16 dB RMS is the inference CLI's DEFAULT (input
# normalization, round-4 verdict #6) — no manual flag is passed.
#
# Deterministic given the committed artifacts; runs on forced CPU so CI can
# reproduce it bit-for-bit (the QA programs' long sequential scans are also
# wedge-prone on the remote-compile axon backend).
set -euo pipefail
cd "$(dirname "$0")/.."

TCN=${TCN:-artifacts/tcn_synth2_sep_best.npz}
# The TCN is separator-DOMAIN trained: its training stems came from this
# exact SCNet artifact, so the demo pins the same one rather than taking
# the default flagship resolution (which moves as better separators land).
SCNET=${SCNET:-artifacts/scnet_synth2_lru_best.npz}

python - << EOF
import jax
jax.config.update("jax_platforms", "cpu")
from mst_tpu.cli.inference_e2e_style_transfer import main
main(["--input_audio", "/root/reference/assets/song_A.wav",
      "--self_target_style_seed", "5",
      "--per_pair_steps", "200",
      "--encoder_npz", "artifacts/encoder_synth2_best.npz",
      "--tcn_npz", "$TCN",
      "--scnet_checkpoint", "$SCNET",
      "--output_dir", "artifacts/e2e_transfer_demo"])
EOF

python - << EOF
import jax
jax.config.update("jax_platforms", "cpu")
from mst_tpu.cli.inference_e2e_style_transfer import main
main(["--input_audio", "/root/reference/assets/song_A.wav",
      "--target_audio", "/root/reference/assets/song_A.wav",
      "--clip_duration", "7.0",
      "--segment_offset", "0.0",
      "--target_segment_offset", "7.6",
      "--target_style_seed", "5",
      "--per_pair_steps", "100",
      "--encoder_npz", "artifacts/encoder_synth2_best.npz",
      "--tcn_npz", "$TCN",
      "--scnet_checkpoint", "$SCNET",
      "--output_dir", "artifacts/e2e_transfer_demo_cross"])
EOF
