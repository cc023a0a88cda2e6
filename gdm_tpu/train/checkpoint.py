"""Checkpoint save/load (orbax).

Reference: train_lm.py:102-154 — torch .pth.tar per object with
{epoch, model_state, optimizer_state}, a `latest` copy every 10 epochs.
Here: orbax StandardCheckpointer over {params, batch_stats, opt_state,
step, epoch}, per-object directory layout `<ckpt_root>/<obj_name>/<step>`
with a pointer to the latest.
"""

from __future__ import annotations

import os
import os.path as osp

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_saveable(state, epoch: int):
    return {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
        "epoch": np.asarray(epoch),
    }


def save_checkpoint(state, ckpt_dir: str, epoch: int):
    """Write checkpoint for `epoch`; updates the `latest` pointer."""
    ckpt_dir = osp.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    path = osp.join(ckpt_dir, f"epoch_{epoch:04d}")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, _to_saveable(state, epoch), force=True)
    with open(osp.join(ckpt_dir, "latest"), "w") as f:
        f.write(f"epoch_{epoch:04d}")
    return path


def load_checkpoint(state, ckpt_dir: str, name: str | None = None):
    """Restore into a TrainState; returns (state, epoch) or (state, None)
    when no checkpoint exists (load_checkpoint parity incl. the miss
    path, train_lm.py:118-146)."""
    ckpt_dir = osp.abspath(ckpt_dir)
    latest = osp.join(ckpt_dir, "latest")
    if name is None:
        if not osp.exists(latest):
            return state, None
        with open(latest) as f:
            name = f.read().strip()
    path = osp.join(ckpt_dir, name)
    if not osp.exists(path):
        return state, None
    target = _to_saveable(state, 0)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, target)
    new_state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=jax.numpy.asarray(restored["step"]),
    )
    return new_state, int(restored["epoch"])
