"""Host-side data pipeline: audio IO, datasets, collation."""

from mst_tpu.data.audio_io import read_wav, write_wav, read_audio, resample
from mst_tpu.data.datasets import (
    FMABaselineDataset,
    StyleTransferDataset,
    MUSDB18Dataset,
    MUSDB18EmbeddingDataset,
    baseline_collate,
    style_transfer_collate,
    load_stems,
    find_stem_dirs,
    train_val_split,
    make_synthetic_corpus,
)
from mst_tpu.data.loader import PrefetchLoader

__all__ = [
    "read_wav",
    "write_wav",
    "read_audio",
    "resample",
    "FMABaselineDataset",
    "StyleTransferDataset",
    "MUSDB18Dataset",
    "MUSDB18EmbeddingDataset",
    "baseline_collate",
    "style_transfer_collate",
    "load_stems",
    "find_stem_dirs",
    "train_val_split",
    "make_synthetic_corpus",
    "PrefetchLoader",
]
