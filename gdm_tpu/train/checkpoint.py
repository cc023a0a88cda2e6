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


def save_checkpoint(state, ckpt_dir: str, epoch: int,
                    process_index: int | None = None):
    """Write checkpoint for `epoch`; updates the `latest` pointer.

    Multi-process: every rank may call (same args); every rank fetches
    the REPLICATED saveable leaves (params/batch_stats/opt_state/step)
    to host, and rank 0 alone writes plain numpy — the reference's
    rank-0 torch.save semantics (train_lm.py:292-296).  Two rejected
    alternatives, both measured failing in the 2-process rehearsal
    (test_multiprocess.py::test_two_process_save_restart_resume,
    2026-08-20): (a) rank-0-only orbax save of GLOBAL arrays leaves the
    OCDBT store missing the other ranks' chunks (restore NOT_FOUND);
    (b) all-rank collective orbax save races finalize-vs-shard-writes
    (manifest ENOENT) because orbax's barriers consult the DEFAULT
    backend's process topology, which a single-chip plugin backend
    (axon) hides.  Host-side numpy keeps the write single-writer and
    backend-independent; at this framework's model sizes (tens of MB)
    the host fetch is negligible.

    `process_index`: the caller's data-parallel rank when the default
    backend cannot be trusted to report it (see above); defaults to
    jax.process_index().
    """
    ckpt_dir = osp.abspath(ckpt_dir)
    pidx = jax.process_index() if process_index is None else process_index
    path = osp.join(ckpt_dir, f"epoch_{epoch:04d}")
    # all ranks fetch (replicated leaves -> local numpy); only rank 0
    # touches the filesystem
    host = jax.tree_util.tree_map(np.asarray, _to_saveable(state, epoch))
    if pidx != 0:
        return path
    os.makedirs(ckpt_dir, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, host, force=True)
    with open(osp.join(ckpt_dir, "latest"), "w") as f:
        f.write(f"epoch_{epoch:04d}")
    return path


def _fresh_guard(inner_state):
    """A zeroed optax.ApplyIfFiniteState around an inner opt state."""
    import jax.numpy as jnp
    import optax

    return optax.ApplyIfFiniteState(
        notfinite_count=jnp.zeros([], jnp.int32),
        last_finite=jnp.asarray(True),
        total_notfinite=jnp.zeros([], jnp.int32),
        inner_state=inner_state,
    )


def load_checkpoint(state, ckpt_dir: str, name: str | None = None):
    """Restore into a TrainState; returns (state, epoch) or (state, None)
    when no checkpoint exists (load_checkpoint parity incl. the miss
    path, train_lm.py:118-146).

    The opt_state layout depends on solver.skip_nonfinite (the
    apply_if_finite wrapper, train.state.make_optimizer).  When the
    checkpoint was written with the OTHER layout, the restore is retried
    against the alternate target and the guard counters are reset /
    dropped — so old checkpoints keep loading after the guard was turned
    on (and vice versa) instead of failing deep inside orbax.
    """
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
    guarded = hasattr(state.opt_state, "inner_state")
    with ocp.StandardCheckpointer() as ckptr:
        try:
            restored = ckptr.restore(path, target)
            opt_state = restored["opt_state"]
        except Exception as e:   # layout mismatch: try the other wrap
            alt = dict(target)
            alt["opt_state"] = (state.opt_state.inner_state if guarded
                                else _fresh_guard(state.opt_state))
            try:
                restored = ckptr.restore(path, alt)
            except Exception:
                raise ValueError(
                    f"checkpoint {path} does not match the optimizer "
                    f"layout for solver.skip_nonfinite="
                    f"{'on' if guarded else 'off'} nor its alternate — "
                    f"was it written by a different optimizer config "
                    f"(weight_decay)?") from e
            opt_state = (_fresh_guard(restored["opt_state"]) if guarded
                         else restored["opt_state"].inner_state)
    new_state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=opt_state,
        step=jax.numpy.asarray(restored["step"]),
    )
    return new_state, int(restored["epoch"])
