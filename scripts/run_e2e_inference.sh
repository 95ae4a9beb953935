#!/bin/bash
# End-to-end style transfer (ref: scripts/run_e2e_inference.sh).
set -euo pipefail

INPUT=${1:?usage: run_e2e_inference.sh input.wav target.wav}
TARGET=${2:?usage: run_e2e_inference.sh input.wav target.wav}
ENCODER_CKPT=${ENCODER_CKPT:-checkpoints/baseline/best}
TCN_CKPT=${TCN_CKPT:-checkpoints_st/final}
SCNET_CKPT=${SCNET_CKPT:-checkpoints/scnet}

python -m mst_tpu.cli.inference_e2e_style_transfer \
    --input_audio "$INPUT" \
    --target_audio "$TARGET" \
    --encoder_checkpoint "$ENCODER_CKPT" \
    --tcn_checkpoint "$TCN_CKPT" \
    --scnet_checkpoint "$SCNET_CKPT" \
    --sample_rate 44100 --clip_duration 10.0 \
    --n_fft 2048 --hop_length 512 --n_mels 80 \
    --band_split_size 16 --band_overlap 8 --encoder_dim 512 \
    --output_dir e2e_output \
    "${@:3}"
