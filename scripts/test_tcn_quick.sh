#!/bin/bash
# Quick per-pair TCN smoke (ref: scripts/test_tcn_quick.sh: 10 pairs x 200 steps).
set -euo pipefail

SEPARATED_PATH=${SEPARATED_PATH:-/data/musdb_balanced}
CHECKPOINT=${CHECKPOINT:-checkpoints/baseline/best}

python -m mst_tpu.cli.test_tcn_style_transfer \
    --separated_path "$SEPARATED_PATH" \
    --checkpoint "$CHECKPOINT" \
    --sample_rate 44100 --clip_duration 10.0 \
    --n_fft 2048 --hop_length 512 --n_mels 80 \
    --band_split_size 16 --band_overlap 8 --encoder_dim 512 \
    --num_pairs 10 --num_steps 200 \
    --output_dir tcn_quick_results \
    "$@"
