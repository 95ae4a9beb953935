#!/bin/bash
# Retrieval validation with the trained config (ref: scripts/run_validation.sh).
set -euo pipefail

SEPARATED_PATH=${SEPARATED_PATH:-/data/fma_separated}
CHECKPOINT=${CHECKPOINT:-checkpoints/baseline/best}

python -m mst_tpu.cli.validate_retrieval \
    --separated_path "$SEPARATED_PATH" \
    --checkpoint "$CHECKPOINT" \
    --sample_rate 44100 --clip_duration 10.0 \
    --n_fft 2048 --hop_length 512 --n_mels 80 \
    --band_split_size 16 --band_overlap 8 --encoder_dim 512 \
    --cache_dir validation_cache \
    --output_dir validation_results \
    "$@"
