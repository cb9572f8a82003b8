"""Checkpoint / resume via orbax.

Replaces the reference's ``torch.save(planner.state_dict())`` + optimizer
snapshots and ``--model_file/--optimizer_file/--start_epoch`` resume flow
(``train_planner.py:252-254,474-477,632-634,700-707``).  One checkpoint
bundles (variables, optimizer state, step counter, RNG key, train/val split
indices) so resume is exact.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from dgpmp2_tpu.learn.train import TrainState


def _manager(ckpt_dir: str, max_to_keep: int = 5) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
    )


def save(ckpt_dir: str, step: int, state: TrainState, rng=None,
         split: Optional[dict] = None, max_to_keep: int = 5) -> None:
    """Persist a training snapshot (plus split indices & RNG for resume)."""
    mgr = _manager(ckpt_dir, max_to_keep)
    payload = {"state": state}
    if rng is not None:
        payload["rng"] = rng
    if split is not None:
        payload["split"] = {k: np.asarray(v) for k, v in split.items()}
    mgr.save(step, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    mgr.close()


def restore(ckpt_dir: str, template: Any, step: Optional[int] = None):
    """Restore the latest (or given) snapshot; ``template`` must mirror the
    saved payload's structure (e.g. ``{"state": init_state}``)."""
    mgr = _manager(ckpt_dir)
    step = mgr.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    out = mgr.restore(step, args=ocp.args.StandardRestore(template))
    mgr.close()
    return step, out


def save_flat_variables(path: str, variables: Any) -> None:
    """Export just the model variables as one flat ``.npz`` — the
    deployment artifact format (self-contained, orbax-free load on the
    serving side).  Leaves are stored in pytree-flatten order."""
    flat, _ = jax.tree_util.tree_flatten(variables)
    np.savez(path, **{f"v{i}": np.asarray(x) for i, x in enumerate(flat)})


def load_flat_variables(path: str, template: Any):
    """Inverse of :func:`save_flat_variables`; ``template`` supplies the
    treedef (e.g. from ``planner.init_variables`` on a dummy batch)."""
    import jax.numpy as jnp

    loaded = np.load(path, allow_pickle=True)
    flat, treedef = jax.tree_util.tree_flatten(template)
    if len(loaded.files) != len(flat):
        raise ValueError(
            f"{path} holds {len(loaded.files)} leaves, template has "
            f"{len(flat)} — mismatched architecture?")
    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(loaded[f"v{i}"]) for i in range(len(flat))])


def latest_step(ckpt_dir: str) -> Optional[int]:
    try:
        mgr = _manager(ckpt_dir)
        s = mgr.latest_step()
        mgr.close()
        return s
    except Exception:
        return None
