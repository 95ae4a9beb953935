"""Style-transfer evaluation harness (ref: src/style_transfer_eval.py).

The reference wraps the external st-ito stack (AFx-Rep embeddings + CMA-ES
over pedalboard chains).  This evaluator keeps the same surface —
``run_style_transfer(input, target) -> (output, metrics)`` + audio QA —
with our embedding model and the parametric effect chain from
:mod:`mst_tpu.eval.effects_search` (CMA-ES or gradient mode).
"""

from __future__ import annotations

from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp

from mst_tpu.eval.audio_quality import audio_quality_report
from mst_tpu.eval.effects_search import (
    cma_es_search,
    gradient_search,
    render_effect_chain,
    _unit_to_params,
)


class StyleTransferEvaluator:
    """Effect-chain style transfer via embedding-distance minimization.

    ``embed_fn``: (C, T) audio -> (D,) embedding (any model; for parity with
    the reference pass a mixture-level embedder).
    """

    def __init__(self, embed_fn: Callable, sample_rate: int = 44100,
                 method: str = "gradient", num_steps: int = 100,
                 cma_generations: int = 25, cma_popsize: int = 12):
        self.embed_fn = embed_fn
        self.sr = sample_rate
        self.method = method
        self.num_steps = num_steps
        self.cma_generations = cma_generations
        self.cma_popsize = cma_popsize

    def _distance(self, a_emb, b_emb) -> float:
        a = np.asarray(a_emb).ravel()
        b = np.asarray(b_emb).ravel()
        return float(
            1.0 - np.dot(a, b) / ((np.linalg.norm(a) * np.linalg.norm(b)) + 1e-12)
        )

    def evaluate_transfer_quality(self, target_audio, output_audio) -> dict:
        """Feature-space transfer quality beyond embedding distance: |target
        - output| for LUFS/RMS/crest/centroid plus target-normalized
        centroid (ref: style_transfer_eval.py:277-318)."""
        t = audio_quality_report(jnp.asarray(target_audio), self.sr)
        o = audio_quality_report(jnp.asarray(output_audio), self.sr)
        return {
            "loudness_diff_lufs": abs(t["lufs"] - o["lufs"]),
            "rms_db_diff": abs(t["rms_db"] - o["rms_db"]),
            "crest_factor_diff": abs(t["crest_factor_db"] - o["crest_factor_db"]),
            "spectral_centroid_diff": abs(t["spectral_centroid_hz"]
                                          - o["spectral_centroid_hz"]),
            "spectral_centroid_diff_norm": (
                abs(t["spectral_centroid_hz"] - o["spectral_centroid_hz"])
                / (abs(t["spectral_centroid_hz"]) + 1e-8)),
            "target_features": t,
            "output_features": o,
        }

    def run_style_transfer(self, input_audio: np.ndarray,
                           target_audio: np.ndarray) -> tuple[np.ndarray, dict]:
        """(C, T) input/target -> (output audio, metrics incl. initial/final
        embedding distance; ref: style_transfer_eval.py:139-231)."""
        inp = jnp.asarray(input_audio, jnp.float32)
        tgt = jnp.asarray(target_audio, jnp.float32)
        target_emb = self.embed_fn(tgt)
        initial = self._distance(self.embed_fn(inp), target_emb)

        if self.method == "gradient":
            out, params, losses = gradient_search(
                self.embed_fn, inp, target_emb,
                num_steps=self.num_steps, sample_rate=self.sr,
            )
            out = np.asarray(out)
            best_params = {k: float(v) for k, v in params.items()}
        else:  # CMA-ES, the reference's protocol
            def objective(u: np.ndarray) -> float:
                y = render_effect_chain(inp, u, self.sr)
                return self._distance(self.embed_fn(jnp.asarray(y)), target_emb)

            best_u, best_f, losses = cma_es_search(
                objective, num_generations=self.cma_generations,
                popsize=self.cma_popsize,
            )
            out = render_effect_chain(inp, best_u, self.sr)
            best_params = {
                k: float(v) for k, v in _unit_to_params(jnp.asarray(best_u)).items()
            }

        final = self._distance(self.embed_fn(jnp.asarray(out)), target_emb)
        metrics = {
            "initial_distance": initial,
            "final_distance": final,
            "improvement": (initial - final) / max(initial, 1e-8),
            "effect_params": best_params,
            "input_quality": audio_quality_report(inp, self.sr),
            "output_quality": audio_quality_report(jnp.asarray(out), self.sr),
            "target_quality": audio_quality_report(tgt, self.sr),
            "transfer_quality": self.evaluate_transfer_quality(tgt, out),
        }
        return out, metrics
