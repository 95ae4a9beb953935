"""Fused embedding pipeline: stems -> (shared mel) -> features + encoder.

The encoder front-end and the mixing-feature extractor compute the *same*
power mel spectrogram whenever their audio configs match (both live
reference configs do, SURVEY.md §2.6).  The STFT dominates the pipeline
(~80% of runtime on v5e), so computing it once nearly doubles embedding
throughput.  This helper is the single entry every trainer/eval path uses.
"""

from __future__ import annotations

import jax

from mst_tpu.config import EncoderConfig, FeatureConfig
from mst_tpu.features import extract_mixing_features
from mst_tpu.ops.mel import mel_spectrogram


def _mel_shared(ecfg: EncoderConfig, fcfg: FeatureConfig) -> bool:
    a, b = ecfg.audio, fcfg.audio
    return (a.sample_rate, a.n_fft, a.hop_length, a.n_mels) == (
        b.sample_rate, b.n_fft, b.hop_length, b.n_mels
    )


def embed_stems(
    enc,
    variables: dict,
    stems: jax.Array,
    fcfg: FeatureConfig,
    *,
    train: bool = False,
    rngs=None,
    mutable=False,
):
    """stems (B, 4, 2, T) -> embedding (B, D), computing the mel once when
    the encoder and feature configs agree.  Mirrors
    ``enc.apply(...)`` signatures (mutable/rngs pass through)."""
    ecfg: EncoderConfig = enc.cfg
    mel_pow = None
    if _mel_shared(ecfg, fcfg):
        a = ecfg.audio
        mel_pow = mel_spectrogram(
            stems, a.sample_rate, a.n_fft, a.hop_length, a.n_mels,
            power=2.0, method=getattr(a, "mel_method", "rfft"),
        )
    feats = extract_mixing_features(stems, fcfg, mel_pow=mel_pow)
    kwargs = {}
    if rngs is not None:
        kwargs["rngs"] = rngs
    if mutable:
        kwargs["mutable"] = mutable
    return enc.apply(variables, stems, feats, train=train, mel_pow=mel_pow,
                     **kwargs)
