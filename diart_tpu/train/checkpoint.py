"""Training-state checkpointing.

The reference has no model-training lifecycle at all (models are checkpointed
by the HF hub, SURVEY.md §5 "Checkpoint / resume"). The native training loop
persists its full state (params + optimizer state + step) so interrupted
fine-tuning resumes exactly. Uses flax's msgpack serialization; directories
are written atomically (tmp + rename) so a crash never leaves a torn
checkpoint.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Optional, Union

from flax import serialization

from .segmentation import TrainState

__all__ = ["save_train_state", "restore_train_state", "latest_checkpoint"]


def save_train_state(
    directory: Union[str, Path], state: TrainState, keep: int = 3
) -> Path:
    """Write ``<dir>/step_<n>.msgpack`` atomically; prune old checkpoints."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    step = int(state.step)
    path = directory / f"step_{step:08d}.msgpack"
    tmp = path.with_suffix(".tmp")
    tmp.write_bytes(serialization.to_bytes(state))
    os.replace(tmp, path)
    (directory / "latest.json").write_text(json.dumps({"step": step}))
    checkpoints = sorted(directory.glob("step_*.msgpack"))
    for old in checkpoints[:-keep]:
        if old != path:  # never prune the checkpoint just written
            old.unlink()
    return path


def latest_checkpoint(directory: Union[str, Path]) -> Optional[Path]:
    """The checkpoint to resume from: the one ``latest.json`` names (the
    most recently WRITTEN — after a rollback the highest step number is an
    abandoned branch, not the latest state), falling back to the highest
    step when the marker is missing or stale."""
    directory = Path(directory)
    marker = directory / "latest.json"
    if marker.exists():
        try:
            step = int(json.loads(marker.read_text())["step"])
            named = directory / f"step_{step:08d}.msgpack"
            if named.exists():
                return named
        except (ValueError, KeyError, json.JSONDecodeError):
            pass
    checkpoints = sorted(directory.glob("step_*.msgpack"))
    return checkpoints[-1] if checkpoints else None


def restore_train_state(
    path: Union[str, Path], template: TrainState
) -> TrainState:
    """Restore from a checkpoint file (or directory -> its latest)."""
    path = Path(path)
    if path.is_dir():
        latest = latest_checkpoint(path)
        if latest is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
        path = latest
    return serialization.from_bytes(template, path.read_bytes())
