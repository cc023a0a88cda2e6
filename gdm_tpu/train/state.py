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
        tx = optax.adamw(lr_schedule, weight_decay=weight_decay) \
            if weight_decay else optax.adam(lr_schedule)
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
