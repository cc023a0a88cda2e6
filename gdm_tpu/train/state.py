"""Train state container and constructor."""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt = self.tx.update(grads, self.opt_state,
                                          self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            batch_stats=new_batch_stats,
            opt_state=new_opt,
        )


from functools import partial


def make_optimizer(
    lr_schedule,
    weight_decay: float = 0.0,
    skip_nonfinite: int = 0,
) -> optax.GradientTransformation:
    """Adam(W) with an optional non-finite-update guard.

    The reference has no failure detection at all (SURVEY.md section 5);
    a NaN loss poisons the params and the run continues silently.  With
    skip_nonfinite > 0 the update is wrapped in optax.apply_if_finite:
    non-finite gradient updates are skipped (zero update, params and
    inner optimizer state untouched) up to that many CONSECUTIVE times,
    after which they pass through so the NaN becomes visible rather than
    the run stalling forever.  The train step surfaces the wrapper's
    `total_notfinite` counter in its metrics.

    Build the transformation ONCE per run and reuse it across objects:
    a fresh optax closure changes the TrainState's static treedef and
    forces train-step recompiles (create_train_state docstring).
    """
    tx = optax.adamw(lr_schedule, weight_decay=weight_decay) \
        if weight_decay else optax.adam(lr_schedule)
    if skip_nonfinite:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=skip_nonfinite)
    return tx


@partial(jax.jit, static_argnames=("model",))
def _jitted_init(model, rng, sample_inputs, sample_mesh):
    return model.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        sample_inputs, sample_mesh, train=True)


def create_train_state(
    model,
    init_rng,
    sample_inputs,
    sample_mesh,
    lr_schedule,
    weight_decay: float = 0.0,
    tx: optax.GradientTransformation | None = None,
) -> TrainState:
    """Initialise params/batch_stats and the Adam optimizer.

    Adam lr from the cyclic schedule (the reference runs Adam despite its
    config naming Ranger — train_lm.py:414 vs lmo_cfg.py:54).  Pass a
    prebuilt `tx` when creating states for several objects: a fresh optax
    transformation holds fresh closures, which changes the TrainState's
    static treedef and forces train-step recompiles.
    """
    # jit the init: eager flax init dispatches thousands of tiny ops,
    # which is pathological on remote-dispatch TPU backends; the jit is
    # module-level + static-model so multi-object loops reuse the compile
    variables = _jitted_init(model, init_rng, sample_inputs, sample_mesh)
    if tx is None:
        tx = make_optimizer(lr_schedule, weight_decay)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        apply_fn=model.apply,
    )
