"""Golden tests for device kernels against scipy/numpy references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial import cKDTree
from scipy.spatial.transform import Rotation

from gdm_tpu import ops
from gdm_tpu.ops import visibility


RNG = np.random.RandomState(0)


class TestKNN:
    def test_matches_kdtree(self):
        support = RNG.randn(300, 3).astype(np.float32)
        query = RNG.randn(111, 3).astype(np.float32)
        idx = np.asarray(ops.knn(support, query, 5, chunk=32))
        _, ref = cKDTree(support).query(query, k=5)
        # compare by distance (ties may order differently)
        d_ours = np.linalg.norm(support[idx] - query[:, None], axis=-1)
        d_ref = np.linalg.norm(support[ref] - query[:, None], axis=-1)
        np.testing.assert_allclose(d_ours, d_ref, rtol=1e-4, atol=1e-5)

    def test_self_query_first_is_self(self):
        pts = RNG.randn(64, 3).astype(np.float32)
        idx = np.asarray(ops.knn(pts, pts, 4))
        np.testing.assert_array_equal(idx[:, 0], np.arange(64))

    def test_chunk_padding(self):
        support = RNG.randn(50, 3).astype(np.float32)
        query = RNG.randn(37, 3).astype(np.float32)  # not divisible by chunk
        idx = np.asarray(ops.knn(support, query, 3, chunk=16))
        assert idx.shape == (37, 3)
        _, ref = cKDTree(support).query(query, k=3)
        d_ours = np.linalg.norm(support[idx] - query[:, None], axis=-1)
        d_ref = np.linalg.norm(support[ref] - query[:, None], axis=-1)
        np.testing.assert_allclose(d_ours, d_ref, rtol=1e-4, atol=1e-5)

    def test_with_dist_pads_k_beyond_support(self):
        """knn_with_dist shares knn's k > n_support contract (repeat the
        last neighbour) instead of crashing in top_k — callers like
        three_nn_interpolate can see 1-2 point support sets."""
        from gdm_tpu.ops.knn import knn_with_dist

        support = RNG.randn(2, 3).astype(np.float32)
        query = RNG.randn(7, 3).astype(np.float32)
        idx, dist = knn_with_dist(support, query, 3)
        assert idx.shape == (7, 3) and dist.shape == (7, 3)
        np.testing.assert_array_equal(np.asarray(idx)[:, 2],
                                      np.asarray(idx)[:, 1])
        np.testing.assert_allclose(np.asarray(dist)[:, 2],
                                   np.asarray(dist)[:, 1])


class TestBackproject:
    def test_roundtrip_projection(self):
        K = np.array([[500.0, 0, 120], [0, 505.0, 110], [0, 0, 1]],
                     np.float32)
        depth = RNG.uniform(0.5, 2.0, (32, 48)).astype(np.float32)
        xyz = np.asarray(ops.depth_to_xyz(depth, K))
        assert xyz.shape == (32, 48, 3)
        np.testing.assert_allclose(xyz[..., 2], depth, rtol=1e-6)
        # reproject: u = x fx / z + cx must equal the column index
        u = xyz[..., 0] * K[0, 0] / xyz[..., 2] + K[0, 2]
        v = xyz[..., 1] * K[1, 1] / xyz[..., 2] + K[1, 2]
        np.testing.assert_allclose(u, np.broadcast_to(np.arange(48), (32, 48)),
                                   atol=1e-3)
        np.testing.assert_allclose(
            v, np.broadcast_to(np.arange(32)[:, None], (32, 48)), atol=1e-3)

    def test_invalid_depth_zeroed(self):
        K = np.eye(3, dtype=np.float32)
        depth = np.zeros((8, 8), np.float32)
        xyz = np.asarray(ops.depth_to_xyz(depth, K))
        assert np.all(xyz == 0)


class TestNormals:
    def test_plane_normal(self):
        # A fronto-parallel plane at 1m: normal must be (0,0,-1) facing camera
        K = np.array([[400.0, 0, 64], [0, 400.0, 64], [0, 0, 1]], np.float32)
        depth = np.full((128, 128), 1000.0, np.float32)  # mm
        n = np.asarray(ops.depth_normals(depth, K))
        inner = n[10:-10, 10:-10]
        np.testing.assert_allclose(inner[..., 2], -1.0, atol=1e-3)

    def test_tilted_plane(self):
        # plane z = z0 + a*x  =>  normal ~ (-a, 0, 1)/norm, oriented to camera
        K = np.array([[400.0, 0, 64], [0, 400.0, 64], [0, 0, 1]], np.float32)
        u = np.arange(128, dtype=np.float32)[None, :]
        # depth chosen so x = (u-cx) z/fx; use small slope via iterating:
        # z = z0 / (1 - a (u-cx)/fx) gives plane z = z0 + a x
        a = 0.3
        z = 1000.0 / (1.0 - a * (u - 64.0) / 400.0)
        depth = np.broadcast_to(z, (128, 128)).astype(np.float32)
        n = np.asarray(ops.depth_normals(depth, K, difference_threshold=50.0))
        expected = np.array([-a, 0.0, 1.0])
        expected /= np.linalg.norm(expected)
        if expected[2] > 0:
            expected = -expected
        inner = n[30:-30, 30:-30].reshape(-1, 3)
        cos = inner @ expected
        assert np.mean(cos) > 0.99

    def test_invalid_depth_zero_normal(self):
        K = np.array([[400.0, 0, 16], [0, 400.0, 16], [0, 0, 1]], np.float32)
        depth = np.zeros((32, 32), np.float32)
        n = np.asarray(ops.depth_normals(depth, K))
        assert np.all(n == 0)


class TestDepthFill:
    def test_fills_holes(self):
        depth = np.full((64, 64), 1.5, np.float32)
        depth[20:28, 20:28] = 0.0  # hole
        filled = np.asarray(ops.fill_in_multiscale(depth))
        assert np.all(filled[22:26, 22:26] > 0.5)
        # non-hole region approximately preserved
        np.testing.assert_allclose(filled[40:, 40:], 1.5, atol=0.1)

    def test_fast_variant(self):
        depth = np.full((64, 64), 2.0, np.float32)
        depth[10:14, 10:14] = 0.0
        filled = np.asarray(ops.fill_in_fast(depth, max_depth=10.0))
        assert np.all(filled[11:13, 11:13] > 1.0)

    def test_bilateral_border_is_unbiased(self):
        """cv2.bilateralFilter uses reflect-101 borders: on flat depth
        every tap equals the centre so the output is EXACT everywhere,
        including corners — a constant-0 border biased the 2-px ring by
        ~10% (weighting near-zero out-of-image taps into the mean)."""
        from gdm_tpu.ops.depth_fill import _bilateral5

        flat = np.full((32, 32), 2.0, np.float32)
        out = np.asarray(_bilateral5(jnp.asarray(flat), 0.5, 2.0))
        np.testing.assert_allclose(out, 2.0, atol=1e-5)
        # dense flat depth through the full multiscale fill stays flat
        # at the corners too
        filled = np.asarray(ops.fill_in_multiscale(flat, max_depth=3.0))
        np.testing.assert_allclose(filled[0, 0], 2.0, atol=1e-3)
        np.testing.assert_allclose(filled[-1, -1], 2.0, atol=1e-3)


class TestKabsch:
    def _random_pose(self, seed):
        r = Rotation.random(random_state=seed).as_matrix().astype(np.float64)
        t = RNG.randn(3) * 0.5
        return r, t

    def test_exact_recovery(self):
        R, t = self._random_pose(1)
        A = RNG.randn(100, 3)
        B = A @ R.T + t
        RT = np.asarray(ops.kabsch(jnp.array(A, jnp.float32),
                                   jnp.array(B, jnp.float32)))
        np.testing.assert_allclose(RT[:, :3], R, atol=1e-4)
        np.testing.assert_allclose(RT[:, 3], t, atol=1e-4)

    def test_matches_reference_formula(self):
        # numpy reimplementation of best_fit_transform
        # (pvn3d_eval_utils_kpls.py:43-76)
        def best_fit(A, B):
            ca, cb = A.mean(0), B.mean(0)
            H = (A - ca).T @ (B - cb)
            U, S, Vt = np.linalg.svd(H)
            R = Vt.T @ U.T
            if np.linalg.det(R) < 0:
                Vt[2, :] *= -1
                R = Vt.T @ U.T
            t = cb - R @ ca
            return np.hstack([R, t[:, None]])

        A = RNG.randn(50, 3)
        B = RNG.randn(50, 3)  # no rigid relation: worst case
        ref = best_fit(A, B)
        RT = np.asarray(ops.kabsch(jnp.array(A, jnp.float32),
                                   jnp.array(B, jnp.float32)))
        np.testing.assert_allclose(RT, ref, atol=1e-4)

    def test_weighted_equals_subset(self):
        R, t = self._random_pose(2)
        A = RNG.randn(80, 3)
        B = A @ R.T + t
        B[40:] = RNG.randn(40, 3) * 10  # garbage in masked-out rows
        w = np.zeros(80, np.float32)
        w[:40] = 1.0
        RT_w = np.asarray(ops.weighted_kabsch(
            jnp.array(A, jnp.float32), jnp.array(B, jnp.float32),
            jnp.array(w)))
        RT_s = np.asarray(ops.kabsch(jnp.array(A[:40], jnp.float32),
                                     jnp.array(B[:40], jnp.float32)))
        np.testing.assert_allclose(RT_w, RT_s, atol=1e-4)

    def test_reflection_corrected(self):
        A = RNG.randn(30, 3)
        B = A.copy()
        B[:, 0] *= -1  # mirrored: unconstrained optimum is a reflection
        RT = np.asarray(ops.kabsch(jnp.array(A, jnp.float32),
                                   jnp.array(B, jnp.float32)))
        assert np.linalg.det(RT[:, :3]) > 0.99

    def test_degenerate_batched_returns_rotation(self):
        """All source points collapsed onto ONE vertex (what untrained
        features produce): the covariance is rounding dust near 1e-19.
        The TPU's BATCHED SVD returned a non-orthonormal U for such
        matrices (U@U.T off identity by 0.94, 2026-08-18) until
        weighted_kabsch scale-normalised H; the contract is that the
        output is ALWAYS a proper rotation, arbitrary as it may be."""
        r = np.random.RandomState(3)
        A = np.repeat(r.randn(4, 1, 3).astype(np.float32) * 0.05,
                      256, axis=1)
        B = r.randn(4, 256, 3).astype(np.float32) * 0.3
        w = np.ones((4, 256), np.float32)
        rts = np.asarray(jax.jit(jax.vmap(ops.weighted_kabsch))(
            jnp.asarray(A), jnp.asarray(B), jnp.asarray(w)))
        for i in range(4):
            R = rts[i][:, :3]
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
            assert np.linalg.det(R) > 0.99
        # exact zeros too (w sums to ~0 is guarded upstream; H == 0 here)
        rt0 = np.asarray(ops.weighted_kabsch(
            jnp.zeros((16, 3)), jnp.zeros((16, 3)),
            jnp.ones(16, jnp.float32)))
        R0 = rt0[:, :3]
        np.testing.assert_allclose(R0 @ R0.T, np.eye(3), atol=1e-4)


class TestRansac:
    def test_outlier_rejection(self):
        R = Rotation.random(random_state=3).as_matrix()
        t = np.array([0.1, -0.2, 0.8])
        A = RNG.randn(200, 3) * 0.1
        B = A @ R.T + t
        # corrupt 40% of correspondences
        B[120:] += RNG.randn(80, 3) * 0.5
        w = np.ones(200, np.float32)
        RT = np.asarray(ops.ransac_kabsch(
            jnp.array(A, jnp.float32), jnp.array(B, jnp.float32),
            jnp.array(w), jax.random.PRNGKey(0), n_hyp=64))
        np.testing.assert_allclose(RT[:, :3], R, atol=5e-3)
        np.testing.assert_allclose(RT[:, 3], t, atol=5e-3)


class TestMeanShift:
    def test_finds_dominant_mode(self):
        main = RNG.randn(150, 3) * 0.01 + np.array([1.0, 2.0, 3.0])
        noise = RNG.randn(50, 3) * 0.01 + np.array([-1.0, 0.0, 0.0])
        pts = np.concatenate([main, noise]).astype(np.float32)
        center, labels = ops.mean_shift(jnp.array(pts), bandwidth=0.1)
        np.testing.assert_allclose(np.asarray(center), [1.0, 2.0, 3.0],
                                   atol=0.05)
        assert np.asarray(labels)[:150].all()
        assert not np.asarray(labels)[150:].any()

    def test_mask_excludes_points(self):
        main = RNG.randn(50, 3) * 0.01
        fake = np.zeros((100, 3), np.float32) + 5.0
        pts = np.concatenate([main, fake]).astype(np.float32)
        mask = np.concatenate([np.ones(50), np.zeros(100)]).astype(np.float32)
        center, _ = ops.mean_shift(jnp.array(pts), bandwidth=0.1,
                                   mask=jnp.array(mask))
        np.testing.assert_allclose(np.asarray(center), [0, 0, 0], atol=0.05)


class TestPointOps:
    def test_fps_spread(self):
        pts = RNG.randn(256, 3).astype(np.float32)
        idx = np.asarray(ops.farthest_point_sample(jnp.array(pts), 32))
        assert len(np.unique(idx)) == 32
        assert idx[0] == 0

    def test_three_nn_interpolate_exact_at_sources(self):
        src = RNG.randn(64, 3).astype(np.float32)
        feats = RNG.randn(64, 8).astype(np.float32)
        out = np.asarray(ops.three_nn_interpolate(
            jnp.array(src), jnp.array(feats), jnp.array(src)))
        np.testing.assert_allclose(out, feats, atol=1e-4)

    def test_ball_query_within_radius(self):
        pts = RNG.rand(128, 3).astype(np.float32)
        centers = pts[:8]
        idx = np.asarray(ops.ball_query(jnp.array(pts), jnp.array(centers),
                                        0.2, 16))
        d = np.linalg.norm(pts[idx] - centers[:, None], axis=-1)
        assert np.all(d <= 0.2 + 1e-5)

    def test_labelstat_ballrange_vs_numpy(self):
        pts = RNG.rand(96, 3).astype(np.float32)
        centers = RNG.rand(5, 3).astype(np.float32)
        labels = RNG.randint(0, 4, 96)
        stat = np.eye(4, dtype=np.int32)[labels]
        out = np.asarray(ops.labelstat_ballrange(
            jnp.array(pts), jnp.array(centers), jnp.array(stat), 0.3))
        d = np.linalg.norm(pts[None] - centers[:, None], axis=-1)
        want = np.stack([stat[d[i] <= 0.3].sum(0) for i in range(5)])
        np.testing.assert_array_equal(out, want)

    def test_labelstat_idx_counts_neighbour_labels(self):
        labels = RNG.randint(0, 3, 32)
        stat = np.eye(3, dtype=np.int32)[labels]
        idx = RNG.randint(0, 32, (6, 8))
        out = np.asarray(ops.labelstat_idx(jnp.array(stat), jnp.array(idx)))
        want = np.stack([stat[row].sum(0) for row in idx])
        np.testing.assert_array_equal(out, want)
        assert np.all(out.sum(1) == 8)

    def test_labelstat_and_ballquery_matches_parts(self):
        pts = RNG.rand(64, 3).astype(np.float32)
        centers = pts[:4]
        stat = np.eye(2, dtype=np.int32)[RNG.randint(0, 2, 64)]
        hist, idx = ops.labelstat_and_ballquery(
            jnp.array(pts), jnp.array(centers), jnp.array(stat), 0.25, 8)
        np.testing.assert_array_equal(
            np.asarray(hist), np.asarray(ops.labelstat_ballrange(
                jnp.array(pts), jnp.array(centers), jnp.array(stat), 0.25)))
        np.testing.assert_array_equal(
            np.asarray(idx), np.asarray(ops.ball_query(
                jnp.array(pts), jnp.array(centers), 0.25, 8)))

    def test_feature_distribute_nearest_anchor(self):
        anchors = RNG.randn(16, 3).astype(np.float32)
        pts = RNG.randn(40, 3).astype(np.float32)
        idx = np.asarray(ops.feature_distribute(
            jnp.array(anchors), jnp.array(pts)))
        d = np.linalg.norm(pts[:, None] - anchors[None], axis=-1)
        np.testing.assert_array_equal(idx, d.argmin(1))

    def test_feature_gather_grad_is_scatter_add(self):
        import jax

        feats = jnp.array(RNG.randn(8, 4).astype(np.float32))
        idx = jnp.array(np.array([0, 0, 3, 5], np.int32))

        def loss(f):
            return jnp.sum(ops.feature_gather(f, idx) * 2.0)

        g = np.asarray(jax.grad(loss)(feats))
        want = np.zeros((8, 4), np.float32)
        for i in np.asarray(idx):
            want[i] += 2.0
        np.testing.assert_allclose(g, want)


class TestSplineBasis:
    def test_partition_of_unity(self):
        u = RNG.rand(100, 3).astype(np.float32)
        basis, slot = ops.spline_basis(jnp.array(u), kernel_size=5)
        np.testing.assert_allclose(np.asarray(basis).sum(-1), 1.0, atol=1e-5)
        assert np.asarray(slot).min() >= 0
        assert np.asarray(slot).max() < 125

    def test_knot_hits_single_slot(self):
        # u exactly on a knot: one combo weight 1, others 0
        u = jnp.array([[0.25, 0.5, 0.75]])  # v = 1, 2, 3 exactly
        basis, slot = ops.spline_basis(u, kernel_size=5)
        b = np.asarray(basis)[0]
        assert np.isclose(b.max(), 1.0)
        np.testing.assert_allclose(sorted(b)[:-1], 0.0, atol=1e-6)
        s = np.asarray(slot)[0][np.argmax(b)]
        assert s == 1 + 2 * 5 + 3 * 25

    def test_dense_conv_vs_naive(self):
        n, k, cin, cout, ks = 20, 4, 6, 7, 5
        pos = RNG.randn(n, 3).astype(np.float32)
        neigh = np.asarray(ops.knn(pos, pos, k + 1))[:, 1:]
        pseudo = ops.cartesian_pseudo(pos, neigh)
        basis, slot = ops.spline_basis(jnp.array(pseudo), kernel_size=ks)
        W = RNG.randn(ks ** 3, cin, cout).astype(np.float32) * 0.1
        Wr = RNG.randn(cin, cout).astype(np.float32) * 0.1
        b = RNG.randn(cout).astype(np.float32)
        x = RNG.randn(n, cin).astype(np.float32)
        out = np.asarray(ops.spline_conv_dense(
            jnp.array(x), jnp.array(neigh), basis, slot,
            jnp.array(W), jnp.array(Wr), jnp.array(b)))
        # naive edge loop
        basis_np, slot_np = np.asarray(basis), np.asarray(slot)
        expected = x @ Wr + b
        for i in range(n):
            acc = np.zeros(cout)
            for kk in range(k):
                j = neigh[i, kk]
                for c in range(8):
                    acc += basis_np[i, kk, c] * (x[j] @ W[slot_np[i, kk, c]])
            expected[i] += acc / k
        np.testing.assert_allclose(out, expected, rtol=1e-3, atol=1e-4)


class TestVisibility:
    def test_sphere_front_visible(self):
        # points on a sphere; camera on +z axis far away: front cap visible
        phi = RNG.rand(500) * 2 * np.pi
        costh = RNG.rand(500) * 2 - 1
        sinth = np.sqrt(1 - costh ** 2)
        pts = np.stack([sinth * np.cos(phi), sinth * np.sin(phi), costh], 1)
        vis = visibility.visible_points(pts, np.array([0, 0, 10.0]))
        m = np.zeros(len(pts), bool)
        m[vis] = True
        # the analytically visible cap (z > r^2/c_z = 0.1, with slack) must
        # be fully marked; the deep back cap must not be
        assert m[pts[:, 2] > 0.2].all()
        assert not m[pts[:, 2] < -0.5].any()

    def test_subsample_voxel(self):
        pts = RNG.rand(1000, 3).astype(np.float32)
        sub = ops.voxel_grid_subsample_np(pts, 0.25)
        assert sub.shape[0] < 1000
        assert sub.shape[0] >= 4 ** 3 * 0.5  # roughly fills the unit cube
