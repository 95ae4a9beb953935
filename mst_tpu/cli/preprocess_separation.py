"""Offline corpus separation CLI
(ref: scripts/preprocess_fma_separation_fast.py).

    python -m mst_tpu.cli.preprocess_separation --audio_root /data/fma \
        --output_root /data/fma_separated --scnet_checkpoint ckpts/scnet

Multi-process corpus sharding keeps the reference's exclusive-lock-file
protocol (O_CREAT|O_EXCL acquire, unlink release; ref: :74-92, 398-421) so
several chips/processes can share one corpus, plus optional static sharding
via --shard_index/--num_shards (the TPU-pod-friendly variant).  Stems are
written as wav (or mp3 via an async ffmpeg pool when available, mirroring
the reference's AsyncMP3Encoder; ref: :217-267).
"""

from __future__ import annotations

import argparse
import os
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

from mst_tpu import STEMS

AUDIO_EXTS = (".wav", ".mp3", ".flac")


def get_params(argv=None):
    p = argparse.ArgumentParser(description="Offline SCNet corpus separation (TPU)")
    p.add_argument("--audio_root", type=str, required=True)
    p.add_argument("--output_root", type=str, required=True)
    p.add_argument("--scnet_checkpoint", type=str, default=None)
    p.add_argument("--sample_rate", type=int, default=44100)
    p.add_argument("--chunk_seconds", type=float, default=10.0)
    p.add_argument("--overlap", type=float, default=0.25)
    p.add_argument("--format", choices=("wav", "mp3"), default="wav")
    p.add_argument("--bitrate", type=str, default="192k")
    p.add_argument("--encode_workers", type=int, default=4)
    p.add_argument("--skip_existing", action="store_true", default=True)
    p.add_argument("--no_skip_existing", dest="skip_existing",
                   action="store_false")
    p.add_argument("--shard_index", type=int, default=0)
    p.add_argument("--num_shards", type=int, default=1)
    p.add_argument("--max_tracks", type=int, default=None)
    return p.parse_args(argv)


class TrackLock:
    """Exclusive lock file protocol (ref: preprocess...py:74-92)."""

    def __init__(self, out_dir: Path):
        self.path = out_dir.with_suffix(".lock")

    def acquire(self) -> bool:
        try:
            fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            return True
        except FileExistsError:
            return False

    def release(self) -> None:
        try:
            self.path.unlink()
        except FileNotFoundError:
            pass


def _write_stem(path: Path, audio: np.ndarray, sr: int, fmt: str, bitrate: str):
    from mst_tpu.data.audio_io import write_mp3, write_wav

    if fmt == "mp3":
        write_mp3(path.with_suffix(".mp3"), audio, sr, bitrate)
    else:
        write_wav(path.with_suffix(".wav"), audio, sr)


def main(argv=None):
    args = get_params(argv)

    from mst_tpu.data.audio_io import read_audio
    from mst_tpu.separation import SCNetSeparator

    audio_root = Path(args.audio_root)
    out_root = Path(args.output_root)
    out_root.mkdir(parents=True, exist_ok=True)

    files = sorted(
        p for p in audio_root.rglob("*") if p.suffix.lower() in AUDIO_EXTS
    )
    files = files[args.shard_index :: args.num_shards]
    if args.max_tracks:
        files = files[: args.max_tracks]
    print(f"{len(files)} tracks in shard {args.shard_index}/{args.num_shards}")

    sep = SCNetSeparator.from_checkpoint(
        args.scnet_checkpoint, args.sample_rate
    )
    sep.chunk_seconds = args.chunk_seconds
    sep.overlap = args.overlap

    ext = ".mp3" if args.format == "mp3" else ".wav"

    def _complete(out_dir: Path) -> bool:
        return all((out_dir / f"{s}{ext}").exists() for s in STEMS)

    done = skipped = failed = 0
    with ThreadPoolExecutor(args.encode_workers) as pool:
        for f in files:
            out_dir = out_root / f.stem
            # only a COMPLETE stem set counts as done — a partial dir from a
            # crashed/concurrent worker is redone, not skipped forever
            if args.skip_existing and _complete(out_dir):
                skipped += 1
                continue
            lock = TrackLock(out_dir)
            if not lock.acquire():
                skipped += 1
                continue
            try:
                if args.skip_existing and _complete(out_dir):
                    skipped += 1  # double-check under the lock (ref: :398-421)
                    continue
                mixture, _ = read_audio(f, target_sr=args.sample_rate)
                if mixture.shape[0] == 1:
                    mixture = np.repeat(mixture, 2, axis=0)
                stems = sep.separate(mixture[:2])  # (4, 2, T)
                out_dir.mkdir(parents=True, exist_ok=True)
                futures = [
                    pool.submit(_write_stem, out_dir / name, stems[i],
                                args.sample_rate, args.format, args.bitrate)
                    for i, name in enumerate(STEMS)
                ]
                # hold the lock until this track's stems are fully written so
                # concurrent shards never observe a partial track as done
                for fut in futures:
                    fut.result()
                done += 1
                if done % 10 == 0:
                    print(f"separated {done}/{len(files)}")
            except Exception as e:  # noqa: BLE001
                failed += 1
                print(f"FAILED {f}: {e}")
            finally:
                lock.release()
    print(f"done: {done} separated, {skipped} skipped, {failed} failed")


if __name__ == "__main__":
    main()
