#!/bin/bash
# Offline FMA corpus separation (ref: scripts/preprocess_fma_large.sh +
# run_preprocessing_dual_gpu.sh).  Shard across processes/hosts with
# --shard_index/--num_shards, or rely on the lock-file protocol when
# several workers share one output dir.
set -euo pipefail

AUDIO_ROOT=${AUDIO_ROOT:-/data/fma_large}
OUTPUT_ROOT=${OUTPUT_ROOT:-/data/fma_separated}
SCNET_CKPT=${SCNET_CKPT:-checkpoints/scnet}

python -m mst_tpu.cli.preprocess_separation \
    --audio_root "$AUDIO_ROOT" \
    --output_root "$OUTPUT_ROOT" \
    --scnet_checkpoint "$SCNET_CKPT" \
    --format mp3 --bitrate 192k \
    "$@"
