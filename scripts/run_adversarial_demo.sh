#!/bin/bash
#
# Adversarial song-identity removal — end-to-end demonstration.
#
# The reference trains its GRL/discriminator stack (src/train.py:130-204,
# src/grl.py, src/model.py:545-587) but never evaluates whether song
# identity was actually removed.  This recipe does, on a materialized
# synth-v2 corpus whose mixing styles come from a SHARED POOL
# (--n_styles): 64 songs x 16 styles, so identity and style are decoupled
# — a style-only embedding cannot identify the song (ceiling = the
# style-cluster size), which is what makes identity removal measurable at
# all.  (With per-song styles the factors are confounded and no identity
# drop is possible without destroying retrieval — measured: both probes
# pin at 1.0.)
#
#   1. write a seeded style-pool synth-v2 stem corpus (+ styles.json)
#   2. extract the song-ID cache (cli/extract_song_identity)
#   3. train twin encoders - baseline vs --use_adversarial - same budget
#   4. probe both (cli/probe_song_identity): song-ID decodability should
#      drop toward the style-cluster ceiling under GRL while same-style
#      other-song retrieval (content-free by construction) holds
#
# Outputs: artifacts/encoder_adv_{baseline,demo}.npz + probe JSONs +
# artifacts/adversarial_demo/metrics.json (committed evidence).
#
set -euo pipefail
cd "$(dirname "$0")/.."

CORPUS=${CORPUS:-/tmp/synth2_adv_corpus_pool}
OUT=${OUT:-artifacts}
SR=22050
CLIP=5.0
STEPS=${STEPS:-500}
EPOCHS=${EPOCHS:-160}
N_STYLES=${N_STYLES:-16}

COMMON_TRAIN_ARGS=(
    --separated_path "$CORPUS" --sample_rate $SR --clip_duration $CLIP
    --n_fft 2048 --hop_length 512 --n_mels 80 --mel_method gemm
    --encoder_dim 512 --band_split_size 16 --band_overlap 8
    --batch_size 16 --num_epochs $EPOCHS --max_steps $STEPS
    --num_workers 2 --log_interval 20 --matmul_precision highest
    --log_dir logs/
)

python -m mst_tpu.cli.make_synth_corpus --output "$CORPUS" \
    --n_songs 64 --duration 11 --sample_rate $SR --synth_version 2 \
    --n_styles $N_STYLES --seed 0

python -m mst_tpu.cli.extract_song_identity \
    --separated_path "$CORPUS" --output "$CORPUS/songid.npz" \
    --sample_rate $SR

python -m mst_tpu.cli.train "${COMMON_TRAIN_ARGS[@]}" \
    --checkpoint_dir /tmp/ckpt_adv_baseline \
    --artifact_out "$OUT/encoder_adv_baseline.npz"

# disc_* flags: without them the adversary shares the encoder's
# warmup-cosine schedule and never trains on a short run (LR < 5e-5 for
# all 500 steps) — measured zero probe movement; see Stage1Config.
# The heavy lambdas trade InfoNCE convergence (val 1.15 vs 0.02) for the
# best measured style embedding: leakage cosine 0.906->0.777 and
# content-free style match UP 0.797->0.844 (the pressure forces the
# encoder onto style).  A fresh linear probe still identifies songs at
# 0.97 top1 — the known limit of adversarial removal — which is why the
# INLP stage below exists; stacked, they reach 0.22 with style at 0.77.
python -m mst_tpu.cli.train "${COMMON_TRAIN_ARGS[@]}" \
    --use_adversarial --song_id_cache_path "$CORPUS/songid.npz" \
    --adversarial_warmup_steps 60 \
    --initial_adversarial_lambda 3.0 --adversarial_lambda 10.0 \
    --fixed_grl_lambda 2.0 \
    --disc_detach_train --disc_learning_rate 2e-3 --disc_steps 8 \
    --discriminator_dropout 0.0 \
    --checkpoint_dir /tmp/ckpt_adv_demo \
    --artifact_out "$OUT/encoder_adv_demo.npz"

mkdir -p "$OUT/adversarial_demo"
for tag in baseline demo; do
    python -m mst_tpu.cli.probe_song_identity \
        --encoder_npz "$OUT/encoder_adv_$tag.npz" \
        --separated_path "$CORPUS" --song_id_cache "$CORPUS/songid.npz" \
        --styles_json "$CORPUS/styles.json" \
        --output "$OUT/adversarial_demo/probe_$tag.json"
done

# Post-hoc closed-form removal (eval/inlp.py) on both frozen encoders:
# 8 rounds x rank 8 lands the baseline's held-out probe exactly on the
# 0.25 style-cluster ceiling (the floor any style-carrying embedding can
# reach on this corpus); stacked on the GRL encoder it cuts below the
# ceiling (GRL disentangles identity from style first).
for pair in "baseline baseline" "demo adv"; do
    set -- $pair; tag=$1; suffix=$2
    python -m mst_tpu.cli.remove_song_identity \
        --encoder_npz "$OUT/encoder_adv_$tag.npz" \
        --separated_path "$CORPUS" --song_id_cache "$CORPUS/songid.npz" \
        --rounds 8 --rank 8 \
        --output "$OUT/identity_nullspace_$suffix.npz"
    python -m mst_tpu.cli.probe_song_identity \
        --encoder_npz "$OUT/encoder_adv_$tag.npz" \
        --separated_path "$CORPUS" --song_id_cache "$CORPUS/songid.npz" \
        --styles_json "$CORPUS/styles.json" \
        --projection_npz "$OUT/identity_nullspace_$suffix.npz" \
        --output "$OUT/adversarial_demo/probe_${tag}_inlp.json"
done

python - "$OUT" <<'EOF'
import json, sys
from pathlib import Path
out = Path(sys.argv[1]) / "adversarial_demo"
m = {t: json.loads((out / f"probe_{t}.json").read_text())
     for t in ("baseline", "demo", "baseline_inlp", "demo_inlp")}
summary = {
    "corpus": {"n_songs": 64, "n_styles": 16, "sample_rate": 22050,
               "duration": 11.0, "synth_version": 2, "seed": 0,
               "clip_duration": 5.0},
    "baseline": m["baseline"], "adversarial": m["demo"],
    "inlp": m["baseline_inlp"],
    "grl_plus_inlp": m["demo_inlp"],
    "probe_id_top1_drop": m["baseline"]["probe_id_top1"] - m["demo"]["probe_id_top1"],
    "probe_cosine_drop": m["baseline"]["probe_cosine"] - m["demo"]["probe_cosine"],
    "style_match_kept": m["demo"]["style_match_top1_excl_self"],
    "inlp_probe_id_top1_drop": m["baseline"]["probe_id_top1"] - m["baseline_inlp"]["probe_id_top1"],
    "inlp_style_match_kept": m["baseline_inlp"]["style_match_top1_excl_self"],
}
(out / "metrics.json").write_text(json.dumps(summary, indent=2))
print(json.dumps(summary, indent=2))
EOF
