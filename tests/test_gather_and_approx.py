"""Unit tests for the TPU performance paths: approx-KNN recall and the
custom-VJP neighbour gather (fwd/bwd vs the naive take/scatter)."""

import numpy as np

import conftest  # noqa: F401


class TestApproxKnn:
    def test_recall_vs_exact(self):
        import jax.numpy as jnp

        from gdm_tpu.ops.knn import knn

        rng = np.random.RandomState(0)
        pts = jnp.asarray(rng.randn(2048, 3).astype(np.float32))
        exact = np.asarray(knn(pts, pts, 16))
        approx = np.asarray(knn(pts, pts, 16, approx=True))
        recall = np.mean([
            len(set(exact[i]) & set(approx[i])) / 16
            for i in range(0, 2048, 8)])
        assert recall > 0.9, recall

    def test_k1_always_exact(self):
        import jax.numpy as jnp

        from gdm_tpu.ops.knn import knn

        rng = np.random.RandomState(1)
        s = jnp.asarray(rng.randn(512, 3).astype(np.float32))
        q = jnp.asarray(rng.randn(200, 3).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(knn(s, q, 1, approx=True)),
            np.asarray(knn(s, q, 1, approx=False)))


class TestGatherVJP:
    def test_forward_matches_take(self):
        import jax
        import jax.numpy as jnp

        from gdm_tpu.models.randla import gather_neighbours_b

        rng = np.random.RandomState(0)
        f = jnp.asarray(rng.randn(3, 700, 20).astype(np.float32))
        i = jnp.asarray(rng.randint(0, 700, (3, 700, 9)).astype(np.int32))
        ref = jax.vmap(lambda a, b: jnp.take(a, b, axis=0))(f, i)
        np.testing.assert_allclose(
            np.asarray(gather_neighbours_b(f, i)), np.asarray(ref))

    def test_grad_matches_scatter_both_branches(self):
        import jax
        import jax.numpy as jnp

        from gdm_tpu.models import randla
        from gdm_tpu.models.randla import gather_neighbours_b

        rng = np.random.RandomState(1)
        # n=700 -> one-hot branch; n=100 -> segment-sum branch
        for n in (700, 100):
            assert (n >= randla._ONEHOT_BWD_MIN_N) == (n == 700)
            f = jnp.asarray(rng.randn(2, n, 12).astype(np.float32))
            i = jnp.asarray(rng.randint(0, n, (2, n, 5)).astype(np.int32))
            ct = jnp.asarray(rng.randn(2, n, 5, 12).astype(np.float32))
            g_ref = jax.grad(lambda x: jnp.sum(jax.vmap(
                lambda a, b: jnp.take(a, b, axis=0))(x, i) * ct))(f)
            g_new = jax.grad(lambda x: jnp.sum(
                gather_neighbours_b(x, i) * ct))(f)
            np.testing.assert_allclose(
                np.asarray(g_new), np.asarray(g_ref), atol=1e-4)

    def test_bf16_bwd_mode_close_to_exact(self):
        import jax
        import jax.numpy as jnp

        from gdm_tpu.models import randla
        from gdm_tpu.models.randla import (gather_neighbours_b,
                                           set_gather_bwd_dtype)

        rng = np.random.RandomState(3)
        n = 700  # one-hot branch
        f = jnp.asarray(rng.randn(2, n, 12).astype(np.float32))
        i = jnp.asarray(rng.randint(0, n, (2, n, 5)).astype(np.int32))
        ct = jnp.asarray(rng.randn(2, n, 5, 12).astype(np.float32))

        def loss(x):
            return jnp.sum(gather_neighbours_b(x, i) * ct)

        g_exact = np.asarray(jax.grad(loss)(f))
        try:
            set_gather_bwd_dtype("bfloat16")
            g_bf16 = np.asarray(jax.grad(loss)(f))
        finally:
            set_gather_bwd_dtype(None)
        assert randla._GATHER_BWD_DTYPE is None
        assert g_bf16.dtype == np.float32
        # bf16 rounds each cotangent element (~0.4% of its magnitude), so
        # the error is absolute in the operand scale, not relative to the
        # (possibly cancelled) gradient entry
        fro = np.linalg.norm(g_bf16 - g_exact) / np.linalg.norm(g_exact)
        assert fro < 1e-2, fro
        assert np.abs(g_bf16 - g_exact).max() < 0.1

    def test_2d_index_path(self):
        import jax
        import jax.numpy as jnp

        from gdm_tpu.models.randla import nearest_upsample

        rng = np.random.RandomState(2)
        f = jnp.asarray(rng.randn(2, 50, 8).astype(np.float32))
        i = jnp.asarray(rng.randint(0, 50, (2, 90, 1)).astype(np.int32))
        out = nearest_upsample(f, i)
        assert out.shape == (2, 90, 8)
        ref = jax.vmap(lambda a, b: jnp.take(a, b[:, 0], axis=0))(f, i)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref))
