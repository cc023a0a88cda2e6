"""Learning-rate and batch-norm momentum schedules.

Reference: train_lm.py:441-457 — CyclicLR(base 1e-6, max 1e-3, triangular,
step_size = total_epochs * len(ds) / batch / 6 / n_gpus) and
BNMomentumScheduler with bnm_lmbd(it) = max(0.9 * 0.5**int(it*bs/2e5),
0.01) (:448-451, args at :49-57).
"""

from __future__ import annotations

import jax.numpy as jnp


def cyclic_lr(base_lr: float = 1e-6, max_lr: float = 1e-3,
              step_size: int = 1000):
    """Triangular cyclic LR (torch CyclicLR mode='triangular' parity)."""

    def schedule(step):
        cycle = jnp.floor(1.0 + step / (2.0 * step_size))
        x = jnp.abs(step / step_size - 2.0 * cycle + 1.0)
        return base_lr + (max_lr - base_lr) * jnp.maximum(0.0, 1.0 - x)

    return schedule


def clr_step_size(total_epochs: int, dataset_len: int, batch_size: int,
                  clr_div: int = 6, n_replicas: int = 1) -> int:
    """step_size_up/down of train_lm.py:441-447."""
    return max(
        total_epochs * dataset_len // batch_size // clr_div // n_replicas, 1)


def bn_momentum_schedule(bn_momentum: float = 0.9, bn_decay: float = 0.5,
                         decay_step: float = 2e5, batch_size: int = 24,
                         clip: float = 0.01):
    """Torch-convention BN momentum as a function of the iteration."""

    def schedule(it):
        k = jnp.floor(it * batch_size / decay_step)
        return jnp.maximum(bn_momentum * bn_decay ** k, clip)

    return schedule
