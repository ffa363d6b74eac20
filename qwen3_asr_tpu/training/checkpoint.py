"""Training checkpoint/resume via Orbax.

The reference is load-only with no resume state (SURVEY.md §5); training on
TPU needs durable, shard-aware snapshots of the full ``TrainState``
(params + optimizer moments + step).  Orbax handles sharded arrays and
atomic directory commits; inference-facing exports go through
``models.params.save_checkpoint`` (reference-compatible safetensors).
"""

from __future__ import annotations

from pathlib import Path

import jax
import orbax.checkpoint as ocp

from .train import TrainState


def save_train_state(directory: str | Path, state: TrainState, step: int | None = None) -> Path:
    """Snapshot a TrainState; returns the checkpoint path."""
    path = Path(directory).absolute()
    if step is None:
        step = int(state.step)
    target = path / f"step_{step:08d}"
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(target, state)
    return target


def latest_step(directory: str | Path) -> int | None:
    path = Path(directory)
    if not path.is_dir():
        return None
    steps = [
        int(p.name.split("_")[1])
        for p in path.iterdir()
        if p.is_dir() and p.name.startswith("step_")
    ]
    return max(steps) if steps else None


def restore_train_state(
    directory: str | Path, template: TrainState, step: int | None = None
) -> TrainState:
    """Restore the given (or latest) step into the template's structure.

    ``template`` supplies pytree structure, dtypes and shardings (pass a
    freshly initialized state placed on the target mesh).
    """
    path = Path(directory).absolute()
    if step is None:
        step = latest_step(path)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
    target = path / f"step_{step:08d}"
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(target, abstract)
