"""C++ host kernel tests: exact-KNN vs scipy, grid subsampling invariants,
and the graceful fallback path."""

import numpy as np
import pytest

import conftest  # noqa: F401
from gdm_tpu import native


@pytest.fixture(scope="module")
def lib_available():
    return native.available()


class TestKnn:
    def test_matches_scipy(self, lib_available):
        from scipy.spatial import cKDTree

        rng = np.random.RandomState(0)
        support = rng.randn(500, 3).astype(np.float32)
        query = rng.randn(200, 3).astype(np.float32)
        for k in (1, 4, 16):
            idx, dist = native.knn(support, query, k, return_dist=True)
            d_ref, i_ref = cKDTree(support).query(query, k=k)
            i_ref = np.asarray(i_ref).reshape(200, k)
            d_ref = np.asarray(d_ref).reshape(200, k)
            np.testing.assert_allclose(dist, d_ref, atol=1e-5)
            # indices can differ at exact ties; distances decide
            agree = (idx == i_ref).mean()
            assert agree > 0.99

    def test_k_exceeds_n(self):
        rng = np.random.RandomState(1)
        support = rng.randn(3, 3).astype(np.float32)
        query = rng.randn(5, 3).astype(np.float32)
        idx = native.knn(support, query, 8)
        assert idx.shape == (5, 8)
        assert (idx >= 0).all() and (idx < 3).all()

    def test_batch(self):
        rng = np.random.RandomState(2)
        s = rng.randn(2, 100, 3).astype(np.float32)
        q = rng.randn(2, 40, 3).astype(np.float32)
        idx = native.knn_batch(s, q, 4)
        assert idx.shape == (2, 40, 4)
        for b in range(2):
            np.testing.assert_array_equal(idx[b], native.knn(s[b], q[b], 4))

    def test_self_query_returns_self_first(self):
        rng = np.random.RandomState(3)
        pts = rng.randn(100, 3).astype(np.float32)
        idx = native.knn(pts, pts, 1)
        np.testing.assert_array_equal(idx[:, 0], np.arange(100))


class TestRadiusNn:
    def test_matches_knn_plus_threshold(self, lib_available):
        """The grid kernel's contract: identical to exact 1-NN followed
        by dist>radius rejection (the GT-gen semantics it replaces)."""
        rng = np.random.RandomState(0)
        # 2e-4 forces the oversize-grid KD fallback branch (the randn
        # extent / radius blows past the dense-cell cap)
        for radius in (0.05, 0.3, 1.0, 2e-4):
            support = rng.randn(700, 3).astype(np.float32)
            query = (rng.randn(900, 3) * 1.5).astype(np.float32)
            got = native.radius_nn(support, query, radius)
            idx, dist = native.knn(support, query, 1, return_dist=True)
            want = idx[:, 0].astype(np.int32, copy=True)
            want[dist[:, 0] > radius] = -1
            np.testing.assert_array_equal(got, want)

    def test_fallback_matches_c(self, monkeypatch, lib_available):
        if not lib_available:
            pytest.skip("no toolchain: nothing to compare against")
        rng = np.random.RandomState(5)
        support = rng.randn(300, 3).astype(np.float32)
        query = rng.randn(400, 3).astype(np.float32)
        c = native.radius_nn(support, query, 0.2)
        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_build_failed", True)
        np.testing.assert_array_equal(
            c, native.radius_nn(support, query, 0.2))

    def test_all_out_of_radius(self):
        support = np.zeros((4, 3), np.float32)
        query = np.full((3, 3), 5.0, np.float32)
        assert (native.radius_nn(support, query, 0.1) == -1).all()

    def test_boundary_inclusive(self):
        """dist == radius is a keep (GT-gen rejects strictly-greater)."""
        support = np.array([[0.0, 0, 0]], np.float32)
        query = np.array([[0.5, 0, 0]], np.float32)
        assert native.radius_nn(support, query, 0.5)[0] == 0


class TestGridSubsample:
    def test_single_voxel_barycenter(self):
        pts = np.array([[0.0, 0, 0], [0.2, 0, 0], [0.1, 0.2, 0]],
                       np.float32)
        sub = native.grid_subsample(pts, dl=10.0)
        assert sub.shape == (1, 3)
        np.testing.assert_allclose(sub[0], pts.mean(0), atol=1e-6)

    def test_grid_partitions(self):
        rng = np.random.RandomState(0)
        pts = rng.rand(1000, 3).astype(np.float32) * 4
        sub = native.grid_subsample(pts, dl=1.0)
        # at most 5^3 voxels; each barycenter inside the cloud bbox
        assert 8 <= sub.shape[0] <= 125
        assert (sub >= pts.min(0) - 1e-5).all()
        assert (sub <= pts.max(0) + 1e-5).all()

    def test_features_averaged(self):
        pts = np.array([[0.0, 0, 0], [0.2, 0, 0]], np.float32)
        feats = np.array([[1.0, 0.0], [3.0, 2.0]], np.float32)
        sub, f = native.grid_subsample(pts, dl=10.0, features=feats)
        np.testing.assert_allclose(f[0], [2.0, 1.0], atol=1e-6)


class TestBuild:
    def test_native_lib_builds_here(self):
        """The environment has g++ — the fast path must be live."""
        assert native.available()


class TestRobustness:
    def test_empty_support_raises(self):
        """C path would return uninitialised np.empty indices; scipy
        raises something else deep in cKDTree — both now fail with one
        deterministic ValueError."""
        with pytest.raises(ValueError, match="empty support"):
            native.knn(np.zeros((0, 3), np.float32),
                       np.zeros((4, 3), np.float32), 3)
        with pytest.raises(ValueError, match="k=0"):
            native.knn(np.zeros((5, 3), np.float32),
                       np.zeros((4, 3), np.float32), 0)

    def test_grid_subsample_fallback_matches_c(self, monkeypatch,
                                               lib_available):
        """The numpy fallback mirrors the C kernel exactly: same packed
        collision-free voxel key and the same first-occurrence order."""
        if not lib_available:
            pytest.skip("no toolchain: nothing to compare against")
        rng = np.random.RandomState(7)
        pts = (rng.rand(4000, 3) * 2.0 - 1.0).astype(np.float32)
        feats = rng.rand(4000, 5).astype(np.float32)
        c_pts, c_f = native.grid_subsample(pts, 0.15, feats)

        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_build_failed", True)
        np_pts, np_f = native.grid_subsample(pts, 0.15, feats)
        assert c_pts.shape == np_pts.shape
        np.testing.assert_allclose(c_pts, np_pts, atol=1e-6)
        np.testing.assert_allclose(c_f, np_f, atol=1e-6)

    def test_grid_subsample_no_voxel_collisions(self):
        """Distinct far-apart voxels must never merge (the old
        XOR-of-primes hash used as an identity could collide)."""
        # a 40x40x40 occupied grid, one point per voxel, fp-exact
        # coordinates (integer centres, dl=1) so quantisation cannot
        # merge neighbours — any shrink would be a key collision
        g = np.stack(np.meshgrid(*([np.arange(40)] * 3),
                                 indexing="ij"), -1).reshape(-1, 3)
        pts = (g + 0.5).astype(np.float32)
        sub = native.grid_subsample(pts, 1.0)
        assert len(sub) == len(pts)          # every voxel survives
        np.testing.assert_allclose(np.sort(sub.ravel()),
                                   np.sort(pts.ravel()), atol=1e-5)
