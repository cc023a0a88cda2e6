"""Jitted train / eval steps with data-parallel sharding.

Reference hot loop: train_lm.py:266-290 (forward, backward, Adam, CyclicLR,
BN momentum scheduler per iteration).  TPU design:

  * one jit containing the on-device input pyramid build, the forward, the
    loss, the backward and the optimizer update — zero host round trips;
  * data parallelism via NamedSharding over a 1-D `data` mesh axis:
    batch sharded on axis 0, params/opt state replicated.  Gradient
    all-reduce and cross-replica batch-norm statistics are inserted by
    GSPMD (SyncBatchNorm of train_lm.py:412 falls out for free, as batch
    stats are global means over the sharded batch axis);
  * dropout rng folds in the step so resume is deterministic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gdm_tpu.data.pipeline import assemble_inputs


def make_train_step(bn_momentum_fn, build_pyramid_in_step: bool = True,
                    knn_chunk: int = 1024, donate: bool = True):
    """Returns train_step(state, batch, mesh, rng) -> (state, metrics).

    batch: dict of host arrays — rgb, cld_rgb_nrm, choose, xyz_img,
    labels, match_idx, visible_flag, RT (see data.synthetic / readers).
    mesh: MeshArrays.
    """

    def train_step(state, batch, mesh, rng):
        momentum = bn_momentum_fn(state.step)
        if build_pyramid_in_step:
            inputs = assemble_inputs(
                batch["rgb"], batch["cld_rgb_nrm"], batch["choose"],
                batch["xyz_img"], labels=batch["labels"],
                match_idx=batch["match_idx"],
                visible_flag=batch["visible_flag"], RT=batch["RT"],
                knn_chunk=knn_chunk)
        else:
            inputs = batch
        drop_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            out, mut = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                inputs, mesh, train=True, momentum=momentum,
                mutable=["batch_stats"],
                rngs={"dropout": drop_rng})
            return out["loss"], (out, mut["batch_stats"])

        (loss, (out, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_stats)
        metrics = {
            "loss": loss,
            "seg_loss": out["seg_loss"],
            "match_loss": out["match_loss"],
            "bn_momentum": momentum,
        }
        # non-finite-update guard counter (train.state.make_optimizer):
        # cumulative count of skipped updates this run
        if hasattr(new_state.opt_state, "total_notfinite"):
            metrics["total_notfinite"] = new_state.opt_state.total_notfinite
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(knn_chunk: int = 1024):
    """Returns eval_step(state, batch, mesh) -> end_points (jitted)."""

    def eval_step(state, batch, mesh):
        inputs = assemble_inputs(
            batch["rgb"], batch["cld_rgb_nrm"], batch["choose"],
            batch["xyz_img"], knn_chunk=knn_chunk)
        out = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            inputs, mesh, train=False)
        return out

    return jax.jit(eval_step)
