#!/bin/bash
#
# FiLM-TCN style-transfer training on the synth-v2 corpus (the recipe that
# produced artifacts/tcn_synth2_best.*).  Stage 1: fresh 2000-step run
# against the frozen v2 encoder.  Stage 2: warm-start continuation at a
# lower LR (--init_npz); the trainer only overwrites the best artifact
# when the held-out e2e improvement beats the recorded value.
#
# Ref roles: src/train_style_transfer.py (trainer),
# inference/test_tcn_style_transfer.py:200 (>=20% convergence criterion).
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=${OUT:-artifacts}
ENC=${ENC:-artifacts/encoder_synth2_best.npz}

COMMON=(
    --on_device_synth --synth_version 2 --encoder_npz "$ENC"
    --hidden_channels 64 --num_blocks 10 --kernel_size 15
    --batch_size 1 --gradient_accumulation_steps 8
    --eval_interval 250 --eval_pairs 16 --log_interval 20
    --matmul_precision highest --remat
    --checkpoint_dir "$OUT" --log_dir logs/
)

python -m mst_tpu.cli.train_style_transfer "${COMMON[@]}" \
    --learning_rate 2e-4 --max_steps 2000

python -m mst_tpu.cli.train_style_transfer "${COMMON[@]}" \
    --init_npz "$OUT/tcn_synth2_best.npz" \
    --learning_rate 1e-4 --max_steps 3000
