#!/bin/bash
#
# Distinctive-pairs chain on the v2 synthetic corpus with the committed
# trained encoder — the reference's select->transfer demo
# (inference/select_distinctive_pairs.py + run_distinctive_pairs_transfer.py)
# end-to-end from .npz artifacts, producing committed evidence
# (artifacts/distinctive_pairs_v2/).
set -euo pipefail
cd "$(dirname "$0")/.."

CORPUS=${CORPUS:-/tmp/synth2_dp_corpus}
OUT=${OUT:-artifacts/distinctive_pairs_v2}
ENC=${ENC:-artifacts/encoder_synth2_best.npz}

python -m mst_tpu.cli.make_synth_corpus --output "$CORPUS" \
    --n_songs 12 --duration 11 --sample_rate 44100 --synth_version 2 \
    --seed 21

mkdir -p "$OUT"
# 2 pairs: the P-way vmapped optimization holds every pair's TCN
# activations in HBM at once; 4x 10 s pairs exceed one v5e chip
python -m mst_tpu.cli.select_distinctive_pairs \
    --separated_path "$CORPUS" --encoder_npz "$ENC" \
    --num_pairs 2 --output "$OUT/pairs.json"

python -m mst_tpu.cli.run_distinctive_pairs_transfer \
    --pairs_json "$OUT/pairs.json" --encoder_npz "$ENC" \
    --num_steps 150 --learning_rate 1e-3 --output_dir "$OUT"

# wavs are large; evidence = pairs.json + results.json
rm -f "$OUT"/pair*_transferred.wav
