"""v2-corpus trained-artifact regression tests (round-2 verdict item 1:
regression bars near the ACHIEVED values recorded in each artifact's
metadata, not a fixed low-ball).  Each test skips until its artifact is
trained and committed; all are `slow` (run in the verify flow)."""

import json
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

ROOT = Path(__file__).resolve().parents[1]


def _load_meta(stem):
    npz = ROOT / "artifacts" / f"{stem}.npz"
    meta = ROOT / "artifacts" / f"{stem}.json"
    if not npz.exists():
        pytest.skip(f"{stem} not trained yet")
    return npz, json.loads(meta.read_text())


@pytest.mark.slow
@pytest.mark.parametrize("stem", ["scnet_synth2_best",
                                  "scnet_synth2_lru_best",
                                  "scnet_synth2_xl_best"])
def test_scnet_v2_artifact_regression(stem):
    """Held-out v2 SI-SDR regression for both dual-path cores under the
    artifact's recorded protocol.  Equal 24k-step budget A/B (12k balanced
    + 12k SI-SDR continuation): LRU 2.74 vs BiLSTM 2.67 on the training
    eval key; 1.90 vs 1.45 on this test's fresh key."""
    from mst_tpu.checkpoints.npz_io import load_params_npz
    from mst_tpu.separation import SCNet, SCNetConfig
    from mst_tpu.separation.train import make_synth_eval_fn

    npz, meta = _load_meta(stem)
    assert meta["synth_version"] == 2
    model = SCNet(SCNetConfig.from_meta(meta["config"]))
    params = load_params_npz(npz)
    chunk = int(meta["chunk_seconds"] * meta["sample_rate"])
    eval_fn = make_synth_eval_fn(model, 8, chunk, float(meta["sample_rate"]),
                                 synth_version=2)
    r = eval_fn(params, jax.random.key(20260817))  # fresh held-out mixes
    sdr = float(r["si_sdr"])
    base = float(r["input_si_sdr"])
    if "si_sdr_freshkey" in meta:
        # round-4 artifacts record the value measured under EXACTLY this
        # protocol (key 20260817, 8 songs, CPU), so the bar can sit tight:
        # the fresh key's input mix distribution differs from the training
        # eval key's (-2.3 vs -3.9 input SI-SDR), which meta-relative bars
        # conflated
        assert sdr > meta["si_sdr_freshkey"] - 0.5, (sdr, meta["si_sdr_freshkey"])
        assert sdr > base + 3.0, (sdr, base)  # separates by a wide margin
    else:
        assert sdr > meta["si_sdr"] - 1.5, (sdr, meta["si_sdr"])
        assert sdr > base + 1.0, (sdr, base)  # meaningfully separates


@pytest.mark.slow
def test_encoder_v2_artifact_regression():
    """Retrieval on fresh held-out v2 songs, under the exact protocol the
    artifact's metadata records (confuser protocol: the pool holds an
    alpha-close different-style render of each song's content, so top1
    measures mixing-style resolution and sits below the 1.0 ceiling —
    round-2 verdict item 1)."""
    from mst_tpu.cli.train_style_transfer import _encoder_from_npz
    from mst_tpu.pipeline import embed_stems
    from mst_tpu.separation.synth_v2 import (
        synth_confuser_batch_v2,
        synth_two_crop_batch_v2,
    )

    npz, meta = _load_meta("encoder_synth2_best")
    assert meta["synth_version"] == 2
    confuser = meta.get("eval_protocol") == "confuser"
    enc, variables, ecfg, fcfg = _encoder_from_npz(npz)
    T = ecfg.audio.clip_samples
    sr = float(ecfg.audio.sample_rate)
    per = 3 if confuser else 2

    @jax.jit
    def chunk_embs(key):
        if confuser:
            stems = synth_confuser_batch_v2(
                key, 8, T, sr, confuser_alpha=meta["confuser_alpha"])
        else:
            stems, _ = synth_two_crop_batch_v2(key, 8, T, sr)
        return embed_stems(enc, variables, stems, fcfg)

    qs, ps, cs = [], [], []
    n_songs = 64
    for i in range(0, n_songs, 8):
        emb = np.asarray(chunk_embs(jax.random.fold_in(
            jax.random.key(20260817), i)))
        qs.append(emb[0::per])
        ps.append(emb[1::per])
        if confuser:
            cs.append(emb[2::per])
    q = np.concatenate(qs)
    p = np.concatenate(ps)
    if confuser:
        p = np.concatenate([p, np.concatenate(cs)])
    q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    p /= np.maximum(np.linalg.norm(p, axis=1, keepdims=True), 1e-12)
    top1 = float((np.argsort(-(q @ p.T), 1)[:, 0] == np.arange(len(q))).mean())
    # bar near the achieved value (smaller pool here -> easier, so the
    # recorded top1 minus noise headroom is a fair floor)
    assert top1 >= meta["top1"] - 0.15, (top1, meta["top1"])


@pytest.mark.slow
def test_adversarial_demo_evidence():
    """Committed adversarial-demo evidence (scripts/run_adversarial_demo.sh):
    GRL training measurably reduced song-identity decodability versus the
    same-budget baseline while style retrieval survived — the evaluation
    the reference's adversarial stack (src/train.py:130-204, src/grl.py)
    never runs.  Also re-drives the committed adversarial encoder artifact
    to catch load regressions."""
    import jax

    from mst_tpu.cli.train_style_transfer import _encoder_from_npz
    from mst_tpu.pipeline import embed_stems
    from mst_tpu.separation.synth_v2 import synth_batch_v2

    path = ROOT / "artifacts" / "adversarial_demo" / "metrics.json"
    if not path.exists():
        pytest.skip("adversarial demo not run yet")
    m = json.loads(path.read_text())
    base, adv = m["baseline"], m["adversarial"]
    # identity decodability dropped under GRL (style-pool corpus, so the
    # drop is measurable: identity is not determined by style)...
    assert adv["probe_id_top1"] < base["probe_id_top1"], m
    assert adv["probe_cosine"] < base["probe_cosine"], m
    # ...while the content-free style signal survived: nearest OTHER-track
    # neighbor shares the mixing style, well above chance
    assert (adv["style_match_top1_excl_self"]
            >= 3 * adv["style_match_chance"]), adv
    # the closed-form null-space projection (eval/inlp.py) on the frozen
    # baseline encoder reaches the style-cluster ceiling — the floor any
    # embedding that still carries style can reach on this corpus — with
    # the style signal still far above chance
    inlp = m["inlp"]
    assert inlp["probe_id_top1"] <= inlp["style_cluster_id_ceiling"] + 0.05, inlp
    assert (inlp["style_match_top1_excl_self"]
            >= 3 * inlp["style_match_chance"]), inlp
    # stacked GRL+INLP is the strongest protocol: at-or-below the ceiling
    # (GRL first disentangles identity from style, so the projection cuts
    # cleaner) with style match still an order of magnitude above chance
    combo = m["grl_plus_inlp"]
    assert combo["probe_id_top1"] <= combo["style_cluster_id_ceiling"], combo
    assert (combo["style_match_top1_excl_self"]
            >= 10 * combo["style_match_chance"]), combo
    # the committed adversarial encoder loads and embeds finite vectors
    enc, variables, ecfg, fcfg = _encoder_from_npz(
        ROOT / "artifacts" / "encoder_adv_demo.npz")
    stems = synth_batch_v2(jax.random.key(0), 2, ecfg.audio.clip_samples,
                           float(ecfg.audio.sample_rate))
    emb = np.asarray(jax.jit(
        lambda s: embed_stems(enc, variables, s, fcfg))(stems))
    assert emb.shape == (2, ecfg.embed_dim)
    assert np.isfinite(emb).all()


def test_distinctive_pairs_v2_evidence():
    """Committed distinctive-pairs evidence
    (scripts/run_distinctive_pairs_v2.sh): the trained v2 encoder selects
    low-similarity pairs from a v2 corpus and the per-pair optimization
    converges past the reference's >=20% criterion
    (ref: inference/test_tcn_style_transfer.py:200)."""
    out = ROOT / "artifacts" / "distinctive_pairs_v2"
    if not (out / "results.json").exists():
        pytest.skip("distinctive-pairs v2 evidence not produced yet")
    pairs = json.loads((out / "pairs.json").read_text())["pairs"]
    results = json.loads((out / "results.json").read_text())
    assert len(results) == len(pairs) >= 2
    for p, r in zip(pairs, results):
        assert p["similarity"] < 0.5  # genuinely distinctive
        assert r["improvement"] >= 0.2, r
        assert r["converged"] is True
        assert 0.0 <= r["final_distance"] < r["initial_distance"]


@pytest.mark.slow
def test_tcn_v2_artifact_regression():
    """e2e embedding-distance improvement on fresh v2 pairs near the
    recorded value."""
    from mst_tpu.checkpoints.npz_io import load_params_npz
    from mst_tpu.cli.train_style_transfer import _encoder_from_npz
    from mst_tpu.config import StyleTransferConfig, TCNConfig
    from mst_tpu.separation.synth_v2 import synth_batch_v2
    from mst_tpu.train import (
        apply_style_transfer,
        create_style_transfer_state,
    )

    npz, meta = _load_meta("tcn_synth2_best")
    assert meta["synth_version"] == 2
    enc_npz = ROOT / "artifacts" / "encoder_synth2_best.npz"
    enc, enc_vars, ecfg, fcfg = _encoder_from_npz(enc_npz)
    tc = meta["tcn"]
    cfg = StyleTransferConfig(
        encoder=ecfg, features=fcfg,
        tcn=TCNConfig(hidden_channels=tc["hidden_channels"],
                      num_blocks=tc["num_blocks"],
                      kernel_size=tc["kernel_size"], causal=tc["causal"],
                      use_film=True, film_embed_dim=tc["film_embed_dim"]),
    )
    state, tcn, gen, _ = create_style_transfer_state(cfg, jax.random.key(0), 1)
    w = load_params_npz(npz)
    state = state.replace(tcn_params=w["tcn_params"],
                          tcn_batch_stats=w["tcn_batch_stats"],
                          film_params=w["film_params"])
    T = ecfg.audio.clip_samples
    sr = float(ecfg.audio.sample_rate)

    @jax.jit
    def improvements(key):
        ki, kt = jax.random.split(key)
        inp = synth_batch_v2(ki, 4, T, sr)
        tgt = synth_batch_v2(kt, 4, T, sr)
        _, m = apply_style_transfer(cfg, enc, enc_vars, tcn, gen, state,
                                    inp, tgt)
        return m["improvement"]

    imp = np.concatenate([np.asarray(improvements(
        jax.random.fold_in(jax.random.key(20260817), i))) for i in range(2)])
    mean_imp = float(imp.mean())
    assert mean_imp > meta["improvement"] - 0.2, (mean_imp, meta["improvement"])
    assert mean_imp > 0.0, mean_imp  # transfer helps at all


def test_resolution_curve_artifacts_unsaturated():
    """Committed style-resolution curves (main encoder + FxEncoder) are
    usable psychometric curves, not saturated point estimates (round-3
    verdict item 4): top1 rises with confuser alpha, the fine end sits
    well below 1.0 (the encoder still has unresolved headroom to measure
    against), and the coarse end shows the encoder does resolve clearly
    distinct styles.  Bars are structural, so a regenerated curve from a
    better encoder still passes while a saturated one (all 1.0) fails."""
    for stem in ("encoder_synth2_resolution", "fx_encoder_synth_resolution"):
        path = ROOT / "artifacts" / f"{stem}.json"
        if not path.exists():
            pytest.skip(f"{stem} not generated yet")
        data = json.loads(path.read_text())
        assert data["protocol"] == "confuser"
        assert data["pool_size"] == 2 * data["songs"]
        curve = data["curve"]
        alphas = [r["alpha"] for r in curve]
        assert alphas == sorted(alphas) and len(alphas) >= 4
        top1 = [r["top1"] for r in curve]
        assert top1[0] < 0.95, (stem, top1)   # fine end unsaturated
        assert top1[-1] > 0.90, (stem, top1)  # coarse end resolved
        # broadly monotone in alpha (small noise allowed per point)
        assert all(b >= a - 0.06 for a, b in zip(top1, top1[1:])), (stem, top1)


@pytest.mark.slow
def test_fx_resolution_artifact_regression():
    """Re-run one point of the FxEncoder resolution sweep (alpha=0.05)
    on fresh held-out songs and hold the committed artifact to it:
    within noise of the recorded top1, and still unsaturated."""
    from mst_tpu.cli.style_resolution import _fx_chunk_fn, _topk, get_params

    res_path = ROOT / "artifacts" / "fx_encoder_synth_resolution.json"
    npz, meta = _load_meta("fx_encoder_synth_best")
    if not res_path.exists():
        pytest.skip("fx resolution curve not generated yet")
    res = json.loads(res_path.read_text())
    rec = next(r for r in res["curve"] if abs(r["alpha"] - 0.05) < 1e-9)

    songs, chunk, alpha = 64, 8, 0.05
    args = get_params(["--encoder_npz", str(npz), "--model", "fx",
                       "--chunk", str(chunk)])
    chunk_embs, _, _ = _fx_chunk_fn(args, meta)
    qs, ks, cs = [], [], []
    for i in range(0, songs, chunk):
        key = jax.random.fold_in(jax.random.key(20260818), i)  # fresh seed
        emb = np.asarray(chunk_embs(key, alpha))
        qs.append(emb[0::3]); ks.append(emb[1::3]); cs.append(emb[2::3])
    q = np.concatenate(qs)
    pool = np.concatenate([np.concatenate(ks), np.concatenate(cs)])
    top1 = float(_topk(q, pool, 1).mean())
    # smaller pool (128 vs 512) -> easier task, so recorded-minus-noise is
    # a fair floor; the ceiling check keeps the eval meaningfully hard
    assert top1 > rec["top1"] - 0.15, (top1, rec["top1"])
    assert top1 < 1.0, top1
