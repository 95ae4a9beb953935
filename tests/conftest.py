"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip sharding is validated on a fake 8-device CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8) since real multi-chip
TPU hardware is not available in CI.  Must run before jax is imported.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# The container's sitecustomize imports jax at interpreter startup with the
# axon TPU platform; override via config (still possible pre-backend-init).
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="module")
def rng():
    """Module-scoped fresh generator: draws within a module are stable in
    file order, and no state leaks across modules (session scope made test
    data depend on which other modules ran first — three order-dependent
    failures came from that)."""
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def song_a():
    """The only in-repo audio asset of the reference: 15 s stereo 44.1 kHz wav."""
    from mst_tpu.data.audio_io import read_wav

    path = "/root/reference/assets/song_A.wav"
    if not os.path.exists(path):
        pytest.skip("song_A.wav not available")
    audio, sr = read_wav(path)
    return audio, sr
