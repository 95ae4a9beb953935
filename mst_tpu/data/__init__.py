"""Host-side data pipeline: audio IO, datasets, collation."""

from mst_tpu.data.audio_io import read_wav, write_wav, resample

__all__ = ["read_wav", "write_wav", "resample"]
