"""Orbax checkpointing with the reference's logical checkpoint content.

Stage-1 checkpoints carry {epoch, model params+stats, optimizer state, loss,
scheduler via step, [discriminator stack]} (ref: train.py:34-51); style
transfer carries {epoch, global_step, encoder/tcn/film_generator, optimizer,
best_val_loss} (ref: train_style_transfer.py:375-384) **plus** the
architecture hyperparams the reference forgets to write (SURVEY.md §2.5) —
here the full config JSON is always embedded.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

import orbax.checkpoint as ocp

from mst_tpu.config import config_to_json


def _manager(directory: str | Path) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        Path(directory).absolute(),
        options=ocp.CheckpointManagerOptions(create=True, max_to_keep=None),
    )


def save_checkpoint(
    directory: str | Path,
    step: int,
    state: Any,
    config=None,
    metrics: dict | None = None,
) -> None:
    directory = Path(directory).absolute()
    mgr = _manager(directory)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    if config is not None:
        (directory / "config.json").write_text(config_to_json(config))
    if metrics is not None:
        (directory / f"metrics_{step}.json").write_text(json.dumps(metrics, indent=2))
    mgr.close()


def restore_checkpoint(directory: str | Path, step: int | None, template: Any) -> Any:
    directory = Path(directory)
    if not directory.exists():
        raise FileNotFoundError(
            f"checkpoint directory {directory} does not exist"
        )
    mgr = _manager(directory)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        mgr.close()
        raise FileNotFoundError(f"no checkpoint steps found in {directory}")
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()
    return restored


def latest_step(directory: str | Path) -> int | None:
    mgr = _manager(directory)
    s = mgr.latest_step()
    mgr.close()
    return s
