#!/bin/bash
# Multi-worker corpus separation (ref: scripts/run_preprocessing_dual_gpu.sh).
#
# The reference pins two GPU processes via CUDA_VISIBLE_DEVICES and shares
# the corpus through lock files.  TPU equivalent: N worker processes/hosts,
# each taking a static shard (--shard_index/--num_shards); the lock-file
# protocol still guards against overlap if shards are not used.
set -euo pipefail

AUDIO_ROOT=${AUDIO_ROOT:-/data/fma_large}
OUTPUT_ROOT=${OUTPUT_ROOT:-/data/fma_separated}
SCNET_CKPT=${SCNET_CKPT:-checkpoints/scnet}
NUM_WORKERS=${NUM_WORKERS:-2}

pids=()
for i in $(seq 0 $((NUM_WORKERS - 1))); do
    python -m mst_tpu.cli.preprocess_separation \
        --audio_root "$AUDIO_ROOT" \
        --output_root "$OUTPUT_ROOT" \
        --scnet_checkpoint "$SCNET_CKPT" \
        --shard_index "$i" --num_shards "$NUM_WORKERS" \
        "$@" &
    pids+=($!)
done
for pid in "${pids[@]}"; do wait "$pid"; done
echo "all $NUM_WORKERS workers done"
