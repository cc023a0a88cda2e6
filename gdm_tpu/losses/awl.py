"""Kendall-style automatic multi-task uncertainty weighting.

Reference: models/loss.py:496-516 (AutomaticWeightedLoss):
    sum_i  0.5 / p_i^2 * L_i + log(1 + p_i^2),  p init 1.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class AutomaticWeightedLoss(nn.Module):
    num: int = 2

    @nn.compact
    def __call__(self, *losses):
        # Named "weights" (reference name "params" collides with flax's
        # params-collection heuristic); the checkpoint importer maps
        # reference `awl.params` onto it.
        p = self.param("weights", nn.initializers.ones, (self.num,))
        total = 0.0
        for i, loss in enumerate(losses):
            total = total + 0.5 / jnp.square(p[i]) * loss + jnp.log(
                1.0 + jnp.square(p[i]))
        return total
