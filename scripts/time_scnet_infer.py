"""Time SCNet inference variants on the real TPU (bench headline sizing).

The bench's full-pipeline denominator is SCNet applied to (B, 2, 10 s);
'flax' and 'fused' BiLSTM impls share one checkpoint (scnet.py:305-307),
so whichever is faster can serve the committed artifact unchanged.  'lru'
is a different model (own checkpoints) timed at the same shapes for the
throughput ceiling comparison.

    python scripts/time_scnet_infer.py [batch] [seconds]
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from mst_tpu.checkpoints.npz_io import load_params_npz
from mst_tpu.separation import SCNet, SCNetConfig

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
SECS = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
SR = 44100
T = int(SECS * SR)

root = Path(__file__).resolve().parent.parent
meta = json.loads((root / "artifacts" / "scnet_synth_best.json").read_text())
mc = meta["config"]

rng = np.random.default_rng(0)
mix = jnp.asarray(rng.standard_normal((B, 2, T), dtype=np.float32) * 0.1)
print("devices:", jax.devices(), flush=True)

for impl in ("flax", "fused", "lru"):
    cfg = SCNetConfig(n_fft=mc["n_fft"], hop_length=mc["hop_length"],
                      dims=tuple(mc["dims"]), num_dplayers=mc["num_dplayers"],
                      rnn_impl=impl)
    model = SCNet(cfg)
    if impl == "lru":
        variables = jax.jit(model.init)(jax.random.key(1), mix[:1])
    else:  # shared checkpoint between flax/fused
        variables = {"params": load_params_npz(
            root / "artifacts" / "scnet_synth_best.npz")}
    run = jax.jit(lambda m, v=variables, mod=model: mod.apply(v, m))
    t0 = time.time()
    out = run(mix)
    jax.block_until_ready(out)
    print(f"{impl}: compile+first {time.time() - t0:.1f}s", flush=True)
    rates = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(5):
            out = run(mix)
        jax.block_until_ready(out)
        rates.append(B * 5 / (time.time() - t0))
    r = sorted(rates)[1]
    print(f"{impl}: {r:.1f} clips/s ({1e3 * B / r:.1f} ms/batch)", flush=True)
