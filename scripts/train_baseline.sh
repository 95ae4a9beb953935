#!/bin/bash
# Stage-1 baseline training — the reference's actually-trained configuration
# (ref: scripts/train_baseline.sh:36-57): n_fft 2048, hop 512, mel 80,
# band split 16/8, embed 512, feature_dim 64, batch 100, tau 0.1.
set -euo pipefail

SEPARATED_PATH=${SEPARATED_PATH:-/data/fma_separated}

python -m mst_tpu.cli.train \
    --separated_path "$SEPARATED_PATH" \
    --sample_rate 44100 \
    --clip_duration 10.0 \
    --n_fft 2048 \
    --hop_length 512 \
    --n_mels 80 \
    --band_split_size 16 \
    --band_overlap 8 \
    --encoder_dim 512 \
    --feature_dim 64 \
    --batch_size 100 \
    --num_segments 2 \
    --num_epochs 100 \
    --learning_rate 2e-4 \
    --weight_decay 0.01 \
    --temperature 0.1 \
    --checkpoint_dir checkpoints/baseline \
    --log_dir logs/baseline \
    "$@"
