"""Pallas streaming similarity-argmax kernel: interpret-mode correctness
on the CPU test platform (the compiled path is exercised on real TPU by
bench.py / the verify drive)."""

import numpy as np
import pytest

import conftest  # noqa: F401
from gdm_tpu.ops.pallas.similarity import (
    _pallas_cosine_argmax,
    _xla_cosine_argmax,
    cosine_argmax,
)


def _unit(rng, n, c):
    x = rng.randn(n, c).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


class TestCosineArgmax:
    @pytest.mark.parametrize("n,m", [(1024, 512), (1100, 700), (128, 128)])
    def test_matches_xla(self, n, m):
        import jax.numpy as jnp

        rng = np.random.RandomState(0)
        s = jnp.asarray(_unit(rng, n, 64))
        mf = jnp.asarray(_unit(rng, m, 64))
        idx_p, sc_p = _pallas_cosine_argmax(s, mf, interpret=True)
        idx_x, sc_x = _xla_cosine_argmax(s, mf)
        idx_p, sc_p = np.asarray(idx_p), np.asarray(sc_p)
        # bf16 MXU inputs: winners flip only on near-ties
        assert (idx_p == np.asarray(idx_x)).mean() > 0.98
        np.testing.assert_allclose(sc_p, np.asarray(sc_x), atol=2e-2)
        # self-consistency: reported score equals sim at reported index
        sim = np.asarray(s) @ np.asarray(mf).T
        np.testing.assert_allclose(
            sc_p, sim[np.arange(n), idx_p], atol=2e-2)

    def test_padding_columns_never_win(self):
        """All-negative similarities: zero-padded mesh columns would score
        0 and win if unmasked."""
        import jax.numpy as jnp

        rng = np.random.RandomState(1)
        s = jnp.asarray(_unit(rng, 64, 32))
        mf = jnp.asarray(-np.abs(_unit(rng, 100, 32)))  # m=100, pads to 512
        # force positive dot -> scene also negative
        s = -jnp.abs(s)
        idx_p, _ = _pallas_cosine_argmax(s, mf, interpret=True)
        assert (np.asarray(idx_p) < 100).all()

    def test_default_dispatch_is_xla(self):
        """cosine_argmax defaults to the XLA path (works on any backend)."""
        import jax.numpy as jnp

        rng = np.random.RandomState(2)
        s = jnp.asarray(_unit(rng, 32, 16))
        mf = jnp.asarray(_unit(rng, 48, 16))
        idx, score = cosine_argmax(s, mf)
        idx_x, _ = _xla_cosine_argmax(s, mf)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_x))
