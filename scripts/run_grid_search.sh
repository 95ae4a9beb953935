#!/bin/bash
#
# TCN hyperparameter grid search launcher
# (ref: scripts/run_grid_search.sh — the reference runs 72 configs x 5 pairs
# serially on one GPU for ~30-50 h; here each config's pairs run as one
# vmapped program sharded over the TPU mesh.)
#
set -euo pipefail
cd "$(dirname "$0")/.."

SEPARATED_PATH=${SEPARATED_PATH:-/data/musdb_separated}
CHECKPOINT=${CHECKPOINT:-checkpoints/baseline/best}
OUTPUT_DIR=${OUTPUT_DIR:-grid_search_results/}

echo "TCN grid search: optimizer {adam,adamw} x lr {5e-4,1e-3,2e-3}"
echo "  x steps {300,500} x hidden {8,16} x RF {1.5,2.0,3.0}s, 5 pairs"

python -m mst_tpu.cli.grid_search_tcn \
    --separated_path "$SEPARATED_PATH" \
    --checkpoint "$CHECKPOINT" \
    --output_dir "$OUTPUT_DIR" \
    --num_pairs 5 \
    --seed 42
