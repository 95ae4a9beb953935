"""Dataset integrity scan (ref: scripts/check_dataset.py + remove_invalid_data.py).

Scans a separated-stems corpus for tracks whose 4 stems all exist and are at
least --min_seconds long; writes invalid_folders.json.  --remove deletes the
invalid folders (the reference splits this into a second script).
"""

from __future__ import annotations

import argparse
import json
import shutil
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path


def get_params(argv=None):
    p = argparse.ArgumentParser(description="Separated-corpus integrity scan")
    p.add_argument("--separated_path", type=str, required=True)
    p.add_argument("--min_seconds", type=float, default=25.0)
    p.add_argument("--workers", type=int, default=16)
    p.add_argument("--output", type=str, default="invalid_folders.json")
    p.add_argument("--remove", action="store_true",
                   help="delete invalid folders (ref: remove_invalid_data.py)")
    return p.parse_args(argv)


def _check(track_dir: Path, min_seconds: float):
    from mst_tpu.data.audio_io import read_audio
    from mst_tpu.data.datasets import _stem_paths

    paths = _stem_paths(track_dir)
    if paths is None:
        return str(track_dir), "missing stems"
    try:
        for p in paths.values():
            audio, sr = read_audio(p)
            if audio.shape[-1] < min_seconds * sr:
                return str(track_dir), f"too short: {p.name}"
    except Exception as e:  # noqa: BLE001
        return str(track_dir), f"unreadable: {e}"
    return None


def main(argv=None):
    args = get_params(argv)
    root = Path(args.separated_path)
    dirs = sorted(d for d in root.iterdir() if d.is_dir())
    print(f"scanning {len(dirs)} track dirs")

    invalid = []
    with ThreadPoolExecutor(args.workers) as pool:
        for res in pool.map(lambda d: _check(d, args.min_seconds), dirs):
            if res is not None:
                invalid.append({"folder": res[0], "reason": res[1]})

    Path(args.output).write_text(json.dumps(invalid, indent=2))
    print(f"{len(invalid)} invalid folders -> {args.output}")
    if args.remove:
        for rec in invalid:
            shutil.rmtree(rec["folder"], ignore_errors=True)
        print(f"removed {len(invalid)} folders")


if __name__ == "__main__":
    main()
