"""Host-side datasets (ref: src/data.py, src/musdb_dataset.py).

Differences from the reference, by design (SURVEY.md §7):
- Items return stacked stems ``(4, 2, T)`` float32 (STEM ORDER vocals, bass,
  drums, other), not dicts; features are computed on-device inside the
  jitted train step, so the host does IO + cropping only (the reference
  burns CPU workers on per-clip DSP; ref: data.py:235-274).
- Failure handling matches the reference: unreadable tracks are skipped
  with a warning (ref: data.py:419-440).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from mst_tpu import STEMS
from mst_tpu.data.audio_io import read_audio

STEM_FILENAMES = STEMS  # vocals/bass/drums/other.<ext>
AUDIO_EXTS = (".wav", ".mp3", ".flac")


def find_stem_dirs(root: str | Path) -> list[Path]:
    """Track dirs containing all four stem files (ref: data.py:122-166)."""
    root = Path(root)
    out = []
    for d in sorted(p for p in root.rglob("*") if p.is_dir()):
        if _stem_paths(d) is not None:
            out.append(d)
    if _stem_paths(root) is not None:
        out.append(root)
    return out


def _stem_paths(d: Path) -> dict | None:
    paths = {}
    for stem in STEM_FILENAMES:
        for ext in AUDIO_EXTS:
            p = d / f"{stem}{ext}"
            if p.exists():
                paths[stem] = p
                break
        else:
            return None
    return paths


def load_stems(track_dir: str | Path, sample_rate: int = 44100) -> np.ndarray:
    """Load 4 stems -> (4, 2, T) float32, trimmed to the shortest stem."""
    paths = _stem_paths(Path(track_dir))
    if paths is None:
        raise FileNotFoundError(f"{track_dir}: missing stem files")
    stems = []
    for name in STEMS:
        audio, _ = read_audio(paths[name], target_sr=sample_rate)
        if audio.shape[0] == 1:
            audio = np.repeat(audio, 2, axis=0)
        stems.append(audio[:2])
    T = min(s.shape[1] for s in stems)
    return np.stack([s[:, :T] for s in stems]).astype(np.float32)


class FMABaselineDataset:
    """Contrastive dataset over pre-separated stem dirs (ref: data.py:111-288).

    ``__getitem__`` -> (segments (num_segments, 4, 2, T), song_idx, track_dir)
    with non-overlapping random crops when the track is long enough
    (ref two-clip sampling: data.py:235-267).
    """

    def __init__(
        self,
        separated_path: str | Path,
        sample_rate: int = 44100,
        clip_duration: float = 10.0,
        num_segments: int = 2,
        seed: int = 42,
    ):
        self.track_dirs = find_stem_dirs(separated_path)
        if not self.track_dirs:
            raise FileNotFoundError(f"no stem dirs under {separated_path}")
        self.sr = sample_rate
        self.clip_samples = int(clip_duration * sample_rate)
        self.num_segments = num_segments
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.track_dirs)

    def __getitem__(self, idx: int):
        track_dir = self.track_dirs[idx]
        stems = load_stems(track_dir, self.sr)  # (4, 2, T)
        T = stems.shape[-1]
        n = self.clip_samples
        segs = []
        if T < n:
            pad = np.zeros((4, 2, n), np.float32)
            pad[..., :T] = stems
            segs = [pad] * self.num_segments
        elif self.num_segments == 2 and T >= 2 * n:
            # two non-overlapping crops: first from [0, T/2 - n], second
            # from [T/2, T - n] (ref: data.py:244-258)
            half = T // 2
            s1 = int(self.rng.integers(0, max(half - n, 1)))
            s2 = int(self.rng.integers(half, max(T - n, half + 1)))
            segs = [stems[..., s1 : s1 + n], stems[..., s2 : s2 + n]]
        else:
            for _ in range(self.num_segments):
                s = int(self.rng.integers(0, max(T - n, 1)))
                segs.append(stems[..., s : s + n])
        return np.stack(segs), idx, str(track_dir)


def baseline_collate(items) -> dict:
    """Flatten segments into one batch (ref: data.py:291-328):
    stems (B*num_segments, 4, 2, T), song_labels, track_dirs."""
    stems = np.concatenate([it[0] for it in items], axis=0)
    labels = np.concatenate(
        [np.full(it[0].shape[0], it[1], np.int32) for it in items]
    )
    dirs = [it[2] for it in items]
    return {"stems": stems, "song_labels": labels, "track_dirs": dirs}


class StyleTransferDataset:
    """Pairs of different songs: (input stems, target stems)
    (ref: data.py:332-538).  Target features are computed on device.

    ``separator``: when given (an ``SCNetSeparator``), ``separated_path`` is
    scanned for raw *mixture* audio files which are separated on the fly per
    item instead of reading pre-separated stem dirs (ref: data.py:503-509,
    ``use_preseparated=False``)."""

    def __init__(
        self,
        separated_path: str | Path,
        sample_rate: int = 44100,
        clip_duration: float = 10.0,
        seed: int = 42,
        separator=None,
    ):
        self.sr = sample_rate
        self.clip_samples = int(clip_duration * sample_rate)
        self.rng = np.random.default_rng(seed)
        self.separator = separator
        if separator is None:
            self.track_dirs = find_stem_dirs(separated_path)
            if len(self.track_dirs) < 2:
                raise FileNotFoundError(
                    f"need >=2 stem dirs under {separated_path}")
        else:
            self.audio_files = sorted(
                p for p in Path(separated_path).rglob("*")
                if p.suffix.lower() in AUDIO_EXTS and p.is_file()
            )
            if len(self.audio_files) < 2:
                raise FileNotFoundError(
                    f"need >=2 audio files under {separated_path}")

    def __len__(self) -> int:
        return (len(self.track_dirs) if self.separator is None
                else len(self.audio_files))

    def _load(self, idx: int) -> np.ndarray:
        if self.separator is None:
            return load_stems(self.track_dirs[idx], self.sr)
        audio, _ = read_audio(self.audio_files[idx], target_sr=self.sr)
        if audio.shape[0] == 1:
            audio = np.repeat(audio, 2, axis=0)
        return self.separator.separate(audio[:2])  # (4, 2, T)

    def _crop(self, stems: np.ndarray) -> np.ndarray:
        T = stems.shape[-1]
        n = self.clip_samples
        if T < n:
            pad = np.zeros((4, 2, n), np.float32)
            pad[..., :T] = stems
            return pad
        s = int(self.rng.integers(0, max(T - n, 1)))
        return stems[..., s : s + n]

    def __getitem__(self, idx: int):
        tgt_idx = int(self.rng.integers(0, len(self) - 1))
        if tgt_idx >= idx:
            tgt_idx += 1
        inp = self._crop(self._load(idx))
        tgt = self._crop(self._load(tgt_idx))
        return inp, tgt


def style_transfer_collate(items) -> dict:
    return {
        "input_stems": np.stack([it[0] for it in items]),
        "target_stems": np.stack([it[1] for it in items]),
    }


class MUSDB18Dataset:
    """MUSDB18 track loader (ref: src/musdb_dataset.py:32-262): stem dirs with
    optional ``mixture`` file; supports offset/duration segment reads."""

    def __init__(self, root: str | Path, sample_rate: int = 44100,
                 clip_duration: float | None = None):
        self.track_dirs = find_stem_dirs(root)
        self.sr = sample_rate
        self.clip_samples = (
            int(clip_duration * sample_rate) if clip_duration else None
        )

    def __len__(self) -> int:
        return len(self.track_dirs)

    def __getitem__(self, idx: int):
        stems = load_stems(self.track_dirs[idx], self.sr)
        if self.clip_samples and stems.shape[-1] > self.clip_samples:
            stems = stems[..., : self.clip_samples]
        mixture = stems.sum(axis=0)  # (2, T)
        return {
            "stems": stems,
            "mixture": mixture,
            "name": self.track_dirs[idx].name,
        }

    def segment(self, idx: int, offset_sec: float, duration_sec: float) -> np.ndarray:
        stems = load_stems(self.track_dirs[idx], self.sr)
        s = int(offset_sec * self.sr)
        n = int(duration_sec * self.sr)
        return stems[..., s : s + n]


class MUSDB18EmbeddingDataset:
    """Deterministic fixed-window segment loader for embedding extraction
    (ref: src/musdb_dataset.py:199-262): every track yields the SAME
    [offset, offset+duration) window of stems + mixture, so caches and
    retrieval pools are reproducible across runs.

    ``__getitem__`` -> {stems (4, 2, T), mixture (2, T), name, path}; the
    mixture comes from an on-disk ``mixture.*`` file when present
    (windowed identically), otherwise the stem sum (ref: :241-262);
    tracks shorter than the window are zero-padded.
    """

    def __init__(self, root: str | Path, sample_rate: int = 44100,
                 segment_duration: float = 10.0, segment_offset: float = 0.0):
        self.track_dirs = find_stem_dirs(root)
        if not self.track_dirs:
            raise FileNotFoundError(f"no stem dirs under {root}")
        self.sr = sample_rate
        self.segment_duration = segment_duration
        self.segment_offset = segment_offset

    def __len__(self) -> int:
        return len(self.track_dirs)

    def _window(self, audio: np.ndarray) -> np.ndarray:
        s = int(self.segment_offset * self.sr)
        n = int(self.segment_duration * self.sr)
        seg = audio[..., s : s + n]
        if seg.shape[-1] < n:
            pad = np.zeros(audio.shape[:-1] + (n,), np.float32)
            pad[..., : seg.shape[-1]] = seg
            seg = pad
        return seg

    def __getitem__(self, idx: int) -> dict:
        track_dir = self.track_dirs[idx]
        stems = self._window(load_stems(track_dir, self.sr))
        mixture = None
        for ext in AUDIO_EXTS:
            p = track_dir / f"mixture{ext}"
            if p.exists():
                audio, _ = read_audio(p, target_sr=self.sr)
                if audio.shape[0] == 1:
                    audio = np.repeat(audio, 2, axis=0)
                mixture = self._window(audio[:2].astype(np.float32))
                break
        if mixture is None:
            mixture = stems.sum(axis=0)
        return {
            "stems": stems,
            "mixture": mixture,
            "name": track_dir.name,
            "path": str(track_dir),
        }


def train_val_split(n: int, val_fraction: float = 0.1, seed: int = 42):
    """Seeded shuffled 90/10 split, matching the reference's numpy semantics
    (ref: train.py:475-489 / validate_retrieval.py:388-395)."""
    rng = np.random.default_rng(seed)
    idx = rng.permutation(n)
    n_val = int(n * val_fraction)
    return np.sort(idx[n_val:]), np.sort(idx[:n_val])


def make_synthetic_corpus(
    root: str | Path, n_tracks: int = 6, duration: float = 3.0,
    sample_rate: int = 22050, seed: int = 0,
) -> Path:
    """Write a tiny synthetic separated-stems corpus (integration tests)."""
    from mst_tpu.data.audio_io import write_wav

    root = Path(root)
    rng = np.random.default_rng(seed)
    T = int(duration * sample_rate)
    t = np.arange(T) / sample_rate
    for i in range(n_tracks):
        d = root / f"track_{i:03d}"
        d.mkdir(parents=True, exist_ok=True)
        f0 = 100 + 60 * i
        stems = {
            "vocals": 0.3 * np.sin(2 * np.pi * (f0 * 4) * t) * (1 + 0.3 * np.sin(2 * np.pi * 3 * t)),
            "bass": 0.4 * np.sin(2 * np.pi * f0 * t),
            "drums": 0.25 * rng.standard_normal(T) * np.exp(-((t * 2) % 1) * 6),
            "other": 0.2 * np.sin(2 * np.pi * (f0 * 2.5) * t + rng.uniform(0, 6)),
        }
        for name, mono in stems.items():
            pan = rng.uniform(0.3, 0.7)
            stereo = np.stack([mono * pan, mono * (1 - pan)]).astype(np.float32)
            write_wav(d / f"{name}.wav", stereo, sample_rate)
    (root / "manifest.json").write_text(
        json.dumps({"n_tracks": n_tracks, "sample_rate": sample_rate})
    )
    return root
