"""Time one SCNet synth train step on the real TPU (sizing the round-2 run)."""
import sys, time
import jax
import jax.numpy as jnp

from mst_tpu.separation import SCNetConfig
from mst_tpu.separation.train import (
    create_separation_state, make_synth_train_step, make_synth_eval_fn,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
SECS = float(sys.argv[2]) if len(sys.argv) > 2 else 2.0
SR = 44100
T = int(SECS * SR)
cfg = SCNetConfig(n_fft=2048, hop_length=512)
print("devices:", jax.devices(), flush=True)

t0 = time.time()
state, model, tx = create_separation_state(cfg, jax.random.key(0), 20000, 5e-4, T)
n_params = sum(x.size for x in jax.tree.leaves(state.params))
print(f"init {time.time()-t0:.1f}s, params {n_params/1e6:.2f}M", flush=True)

step = make_synth_train_step(model, tx, B, T, SR)
rng = jax.random.key(1)
t0 = time.time()
state, m = step(state, rng)
jax.block_until_ready(m["loss"])
print(f"compile+first step {time.time()-t0:.1f}s loss={float(m['loss']):.4f}", flush=True)

t0 = time.time()
N = 10
for _ in range(N):
    state, m = step(state, rng)
jax.block_until_ready(m["loss"])
dt = (time.time() - t0) / N
print(f"steady step {dt*1e3:.1f} ms ({B*SECS/dt:.1f} audio-s/s) loss={float(m['loss']):.4f}", flush=True)

ev = make_synth_eval_fn(model, 4, T, SR)
t0 = time.time()
r = ev(state.params, jax.random.key(999))
jax.block_until_ready(r["si_sdr"])
print(f"eval compile+run {time.time()-t0:.1f}s si_sdr={float(r['si_sdr']):.2f} "
      f"input={float(r['input_si_sdr']):.2f}", flush=True)
