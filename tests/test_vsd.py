"""Depth rasterizer + VSD metric tests (reference: lib/pysixd/pose_error.py
vsd, visibility.py, misc.py depth_im_to_dist_im_fast)."""

import numpy as np
import pytest

from gdm_tpu.eval.vsd import vsd_err, vsd_recall
from gdm_tpu.ops.render_depth import render_depth_window, subdivide_max_edge

K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)


def square_mesh(half=0.1, z=1.0, cx=0.0, cy=0.0):
    """Two triangles forming an axis-aligned square at depth z."""
    verts = np.array([
        [cx - half, cy - half, z],
        [cx + half, cy - half, z],
        [cx + half, cy + half, z],
        [cx - half, cy + half, z],
    ], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return verts, faces


def render_full(verts, faces, K, hw=(480, 640), tile=16, max_edge=None):
    import jax.numpy as jnp
    if max_edge is None:
        # bound screen-space triangle size to the raster tile
        zmin = float(verts[:, 2].min())
        max_edge = 0.5 * (tile - 4) * zmin / float(K[0, 0])
    v, f = subdivide_max_edge(verts, faces, max_edge)
    d = render_depth_window(jnp.asarray(v), jnp.asarray(f),
                            jnp.asarray(K), jnp.zeros(2, np.float32),
                            window=hw, tile=tile)
    return np.asarray(d)


class TestSubdivide:
    def test_edges_bounded_and_surface_preserved(self):
        verts, faces = square_mesh(half=0.2, z=1.0)
        v, f = subdivide_max_edge(verts, faces, 0.05)
        tri = v[f]
        e = np.linalg.norm(tri - np.roll(tri, -1, axis=1), axis=2)
        assert e.max() <= 0.05 + 1e-6
        # all new vertices stay on the z=1 plane and inside the square
        assert np.allclose(v[:, 2], 1.0)
        assert v[:, :2].min() >= -0.2 - 1e-6
        assert v[:, :2].max() <= 0.2 + 1e-6
        # area preserved (sum of unsigned triangle areas)
        def area(vv, ff):
            t = vv[ff]
            c = np.cross(t[:, 1] - t[:, 0], t[:, 2] - t[:, 0])
            return 0.5 * np.abs(c[:, 2]).sum()
        assert area(v, f) == pytest.approx(area(verts, faces), rel=1e-5)

    def test_small_mesh_untouched(self):
        verts, faces = square_mesh(half=0.01)
        v, f = subdivide_max_edge(verts, faces, 1.0)
        assert len(v) == 4 and len(f) == 2

    def test_unit_mismatch_fails_fast(self):
        # mm-scale vertices against a metre-scale edge bound would
        # quadruple faces ~10 extra rounds and look like a hang; the
        # face budget turns it into an immediate, explanatory error
        verts, faces = square_mesh(half=200.0, z=1000.0)  # mm units
        with pytest.raises(ValueError, match="millimetre"):
            subdivide_max_edge(verts, faces, 0.008, max_faces=100_000)


class TestRenderDepth:
    def test_flat_square_depth_and_coverage(self):
        verts, faces = square_mesh(half=0.1, z=2.0)
        d = render_full(verts, faces, K)
        # projected square: x in [320 +/- 0.1*500/2 = 25] -> [295, 345)
        inside = d[240 - 20:240 + 20, 320 - 20:320 + 20]
        assert np.all(inside > 0)
        assert np.allclose(inside[inside > 0], 2.0, atol=1e-4)
        # outside the projection: empty
        assert d[:200, :].max() == 0.0
        covered = (d > 0)
        ys, xs = np.nonzero(covered)
        assert xs.min() >= 294 and xs.max() <= 345
        assert ys.min() >= 214 and ys.max() <= 265

    def test_no_holes_across_shared_edges(self):
        verts, faces = square_mesh(half=0.15, z=1.5)
        d = render_full(verts, faces, K, max_edge=0.02)
        # the interior of the projected square must be fully covered
        # despite ~hundreds of shared triangle edges
        r = int(0.14 * 500 / 1.5)  # safely interior
        inside = d[240 - r:240 + r, 320 - r:320 + r]
        assert np.all(inside > 0)

    def test_perspective_correct_slanted_plane(self):
        # plane z = 1 + x (metres); depth at pixel u: z = 1/(1 - (u-cx)/fx)
        verts = np.array([
            [-0.3, -0.3, 0.7], [0.3, -0.3, 1.3],
            [0.3, 0.3, 1.3], [-0.3, 0.3, 0.7],
        ], np.float32)
        faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        d = render_full(verts, faces, K, max_edge=0.02)
        v0 = 240
        for u in (300, 320, 340):
            z = d[v0, u]
            assert z > 0
            x_over_z = (u + 0.5 - K[0, 2]) / K[0, 0]
            z_true = 1.0 / (1.0 - x_over_z)
            assert z == pytest.approx(z_true, rel=5e-3)

    def test_z_buffer_occlusion(self):
        v1, f1 = square_mesh(half=0.1, z=2.0)    # 50x50 px footprint
        v2, f2 = square_mesh(half=0.03, z=1.0)   # nearer, 30x30 px
        verts = np.concatenate([v1, v2])
        faces = np.concatenate([f1, f2 + 4]).astype(np.int32)
        d = render_full(verts, faces, K)
        assert d[240, 320] == pytest.approx(1.0, abs=1e-4)
        # ring covered only by the far square (offset 22 > 15px near extent)
        assert d[240, 320 - 22] == pytest.approx(2.0, abs=1e-4)

    def test_window_origin_offset(self):
        import jax.numpy as jnp
        verts, faces = square_mesh(half=0.1, z=2.0)
        v, f = subdivide_max_edge(verts, faces, 0.02)
        full = render_full(verts, faces, K, max_edge=0.02)
        win = render_depth_window(
            jnp.asarray(v), jnp.asarray(f), jnp.asarray(K),
            jnp.asarray([280.0, 200.0], np.float32), window=(80, 80),
            tile=16)
        np.testing.assert_allclose(np.asarray(win),
                                   full[200:280, 280:360], atol=1e-5)

    def test_degenerate_padding_faces_ignored(self):
        import jax.numpy as jnp
        verts, faces = square_mesh(half=0.05, z=1.0)
        v, f = subdivide_max_edge(verts, faces, 0.01)
        fp = np.zeros((2 * len(f), 3), np.int32)
        fp[:len(f)] = f
        a = render_depth_window(jnp.asarray(v), jnp.asarray(f),
                                jnp.asarray(K), jnp.zeros(2, np.float32),
                                window=(480, 640), tile=16)
        b = render_depth_window(jnp.asarray(v), jnp.asarray(fp),
                                jnp.asarray(K), jnp.zeros(2, np.float32),
                                window=(480, 640), tile=16)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_empty_face_array_renders_nothing(self):
        import jax.numpy as jnp
        verts, _ = square_mesh(half=0.05, z=1.0)
        d = render_depth_window(
            jnp.asarray(verts), jnp.zeros((0, 3), np.int32),
            jnp.asarray(K), jnp.zeros(2, np.float32),
            window=(64, 64), tile=16)
        assert d.shape == (64, 64) and float(jnp.max(d)) == 0.0


class TestGatherRenderer:
    """Gather-formulation rasterizer (per-tile min-reduction) must match
    the scatter z-buffer bit for bit: the same (face, pixel, z) set
    competes per pixel and f32 min is order-independent."""

    def _project_valid(self, vc, faces, Knp, origin, side, tile):
        eps = 1e-9
        z = vc[:, 2]
        zs = np.maximum(z, eps)
        u = vc[:, 0] * Knp[0, 0] / zs + Knp[0, 2] - origin[0]
        w = vc[:, 1] * Knp[1, 1] / zs + Knp[1, 2] - origin[1]
        p = np.stack([u, w], axis=1)[faces]
        fz = z[faces]
        valid = (fz > eps).all(axis=1)
        d01 = p[:, 1] - p[:, 0]
        d02 = p[:, 2] - p[:, 0]
        area = d01[:, 0] * d02[:, 1] - d01[:, 1] * d02[:, 0]
        valid &= np.abs(area) > eps
        bb0 = np.floor(p.min(axis=1))
        valid &= ((bb0[:, 0] + tile > 0) & (bb0[:, 0] < side)
                  & (bb0[:, 1] + tile > 0) & (bb0[:, 1] < side))
        return p, valid

    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_scatter_bitwise(self, seed):
        import jax.numpy as jnp

        from gdm_tpu.data.synthetic import make_object
        from gdm_tpu.ops.render_depth import (
            bin_faces_to_tiles,
            render_depth_window_gather,
        )
        from scipy.spatial import ConvexHull

        rng = np.random.RandomState(seed)
        mesh = make_object(128, rng, radius=0.05)
        verts = (mesh[:, :3] / 1000.0).astype(np.float32)
        faces = ConvexHull(verts).simplices.astype(np.int32)
        tile, side = 32, 128
        Kw = np.array([[500.0, 0, side / 2], [0, 500.0, side / 2],
                       [0, 0, 1]], np.float32)
        v, f = subdivide_max_edge(verts, faces,
                                  (tile - 2) * 0.6 / Kw[0, 0])
        t = np.array([rng.uniform(-0.01, 0.01),
                      rng.uniform(-0.01, 0.01), 0.7], np.float32)
        vc = (v + t).astype(np.float32)
        origin = np.zeros(2, np.float32)

        ref = np.asarray(render_depth_window(
            jnp.asarray(vc), jnp.asarray(f), jnp.asarray(Kw),
            jnp.asarray(origin), window=(side, side), tile=tile))
        p, valid = self._project_valid(vc, f, Kw, origin, side, tile)
        cand = bin_faces_to_tiles(p, valid, f, side, tile)
        assert ref.max() > 0       # the object actually rendered
        got = np.asarray(render_depth_window_gather(
            jnp.asarray(vc), jnp.asarray(cand), jnp.asarray(Kw),
            jnp.asarray(origin), window=(side, side), tile=tile))
        np.testing.assert_array_equal(got, ref)

    def test_vsd_gather_matches_scatter(self):
        """Full VSD through both renderers must agree exactly (same
        pixel coverage, order-independent f32 min)."""
        from gdm_tpu.data.synthetic import make_object
        from scipy.spatial import ConvexHull

        rng = np.random.RandomState(5)
        mesh = make_object(128, rng, radius=0.05)
        verts = (mesh[:, :3] / 1000.0).astype(np.float32)
        faces = ConvexHull(verts).simplices.astype(np.int32)
        R_gt = np.eye(3, dtype=np.float32)
        t_gt = np.array([0.0, 0.0, 0.8], np.float32)
        dR, _ = np.linalg.qr(np.eye(3) + 0.05 * rng.randn(3, 3))
        R_e = (dR * np.sign(np.linalg.det(dR))).astype(np.float32)
        t_e = t_gt + np.array([0.004, -0.003, 0.006], np.float32)
        depth = np.full((480, 640), 1.1, np.float32)
        args = (R_e, t_e, R_gt, t_gt, depth, K, verts, faces, 0.1)
        e_g = vsd_err(*args, renderer="gather")
        e_s = vsd_err(*args, renderer="scatter")
        assert np.all((e_g >= 0) & (e_g <= 1))
        np.testing.assert_array_equal(e_g, e_s)

    def test_empty_candidates(self):
        import jax.numpy as jnp

        from gdm_tpu.ops.render_depth import (
            bin_faces_to_tiles,
            render_depth_window_gather,
        )

        verts, faces = square_mesh(half=0.05, z=1.0)
        cand = bin_faces_to_tiles(
            np.zeros((2, 3, 2), np.float32), np.zeros(2, bool), faces,
            64, 32)
        d = render_depth_window_gather(
            jnp.asarray(verts), jnp.asarray(cand), jnp.asarray(K),
            jnp.zeros(2, np.float32), window=(64, 64), tile=32)
        assert d.shape == (64, 64) and float(np.asarray(d).max()) == 0.0


def _gt_depth(verts, faces, hw=(480, 640)):
    return render_full(verts, faces, K, hw=hw, max_edge=0.02)


class TestVSD:
    def setup_method(self, _):
        self.verts, self.faces = square_mesh(half=0.1, z=0.0)
        self.verts = self.verts - [0, 0, 0.0]  # object frame: z=0 plane
        self.R = np.eye(3, dtype=np.float32)
        self.t = np.array([0, 0, 2.0], np.float32)
        cam = self.verts @ self.R.T + self.t
        self.depth_test = _gt_depth(cam, self.faces)
        self.diameter = float(0.2 * np.sqrt(2))

    def test_perfect_pose_zero_error(self):
        errs = vsd_err(self.R, self.t, self.R, self.t, self.depth_test, K,
                       self.verts, self.faces, self.diameter)
        assert errs.shape == (10,)
        assert np.all(errs < 0.02)

    def test_grossly_wrong_pose_error_one(self):
        t_bad = self.t + np.array([1.0, 0, 0], np.float32)
        errs = vsd_err(self.R, t_bad, self.R, self.t, self.depth_test, K,
                       self.verts, self.faces, self.diameter)
        assert np.all(errs > 0.95)

    def test_small_offset_monotone_in_tau(self):
        # shift along z by 0.2 diameters: step cost -> error 1 for
        # tau < 0.2, ~0 for tau > 0.2 (plane-on-plane, full overlap)
        t_off = self.t + np.array([0, 0, 0.2 * self.diameter], np.float32)
        errs = vsd_err(self.R, t_off, self.R, self.t, self.depth_test, K,
                       self.verts, self.faces, self.diameter,
                       delta=self.diameter)  # keep both surfaces "visible"
        taus = np.arange(0.05, 0.51, 0.05)
        assert np.all(errs[taus < 0.19] > 0.9)
        assert np.all(errs[taus > 0.21] < 0.1)
        assert np.all(np.diff(errs) <= 1e-6)  # non-increasing in tau

    def test_occluder_removes_visible_surface(self):
        # occluder patch in front of part of the object in the test scene
        # (object footprint x:[295,345], y:[215,265]; occluder at z=1
        # covers x:[295,320], y:[227,252])
        occ_v, occ_f = square_mesh(half=0.025, z=1.0, cx=-0.025)
        occ_cam = occ_v  # already at z=1 in camera frame
        occ_depth = _gt_depth(occ_cam, occ_f)
        depth = self.depth_test.copy()
        m = occ_depth > 0
        depth[m] = occ_depth[m]
        # estimate wrong only in the occluded half -> error lower than
        # the same mistake fully visible
        errs_occ = vsd_err(self.R, self.t, self.R, self.t, depth, K,
                           self.verts, self.faces, self.diameter)
        assert np.all(errs_occ < 0.05)  # visible half still matches

    def test_missing_depth_counts_visible_bop19(self):
        # bop19: pixels with no test depth are treated as visible
        errs = vsd_err(self.R, self.t, self.R, self.t,
                       np.zeros_like(self.depth_test), K,
                       self.verts, self.faces, self.diameter)
        assert np.all(errs < 0.02)

    def test_tlinear_cost(self):
        t_off = self.t + np.array([0, 0, 0.1 * self.diameter], np.float32)
        errs = vsd_err(self.R, t_off, self.R, self.t, self.depth_test, K,
                       self.verts, self.faces, self.diameter,
                       delta=self.diameter, cost_type="tlinear")
        taus = np.arange(0.05, 0.51, 0.05)
        # tlinear: cost = min(d/tau, 1); d = 0.1 -> at tau=0.5 cost ~ 0.2
        assert errs[-1] == pytest.approx(0.2, abs=0.06)

    def test_evaluator_integration(self):
        from gdm_tpu.eval.evaluator import Evaluator

        ev = Evaluator(
            "synth", ["obj"], {"obj": self.diameter},
            {"obj": self.verts},
            vsd_meshes={"obj": (self.verts, self.faces)})
        ev.add_prediction("obj", "1/0", self.R, self.t)           # perfect
        t_bad = self.t + np.array([1.0, 0, 0], np.float32)
        ev.add_prediction("obj", "1/1", self.R, t_bad)            # gross
        gt = {"R": self.R, "t": self.t, "K": K,
              "depth": self.depth_test}
        res = ev.evaluate({"obj": {"1/0": gt, "1/1": gt}})
        assert res["recalls"]["obj"]["vsd"] == [1.0, 0.0]
        # errors are per-tau vectors
        assert np.all(res["errors"]["obj"]["vsd"][0] < 0.02)
        assert np.mean(res["errors"]["obj"]["vsd"][1]) > 0.95
        assert "vsd" in res["table"]
        assert res["bop19_ar"]["obj"]["ar_vsd"] == pytest.approx(0.5)

    def test_evaluator_depth_file_loading(self, tmp_path):
        from PIL import Image

        from gdm_tpu.eval.evaluator import Evaluator

        # 16-bit png at depth_factor scaling, like BOP test frames
        factor = 10000.0
        png = (self.depth_test * factor).astype(np.uint16)
        p = tmp_path / "depth.png"
        Image.fromarray(png).save(p)
        ev = Evaluator(
            "synth", ["obj"], {"obj": self.diameter},
            {"obj": self.verts},
            vsd_meshes={"obj": (self.verts, self.faces)})
        ev.add_prediction("obj", "1/0", self.R, self.t)
        gt = {"R": self.R, "t": self.t, "K": K,
              "depth_file": str(p), "depth_factor": factor}
        res = ev.evaluate({"obj": {"1/0": gt}})
        assert res["recalls"]["obj"]["vsd"] == [1.0]

    def test_recall(self):
        errs = [np.full(10, 0.1), np.full(10, 0.9)]
        assert vsd_recall(errs) == pytest.approx(0.5)
        assert vsd_recall(errs, correct_ths=(0.95,)) == pytest.approx(1.0)
        assert vsd_recall([]) == 0.0


class TestVSDBatch:
    """vsd_err_batch must reproduce per-frame vsd_err exactly, across
    mixed window buckets / z buckets and padded remainder groups."""

    def setup_method(self, _):
        self.verts, self.faces = square_mesh(half=0.1, z=0.0)
        self.R = np.eye(3, dtype=np.float32)
        self.diameter = float(0.2 * np.sqrt(2))

    def test_matches_single_frame_path(self):
        from gdm_tpu.eval.vsd import vsd_err_batch

        rng = np.random.RandomState(0)
        poses, depths = [], []
        # 5 frames: three z's (different window AND z buckets), offsets
        for i, z in enumerate([2.0, 2.0, 1.0, 4.0, 2.0]):
            t_gt = np.array([0, 0, z], np.float32)
            depths.append(_gt_depth(self.verts @ self.R.T + t_gt,
                                    self.faces))
            t_est = t_gt + rng.randn(3).astype(np.float32) \
                * (0.02 * self.diameter)
            poses.append((self.R, t_est, self.R, t_gt))

        batch = vsd_err_batch(poses, depths, K, self.verts, self.faces,
                              self.diameter)
        assert batch.shape == (5, 10)
        for i, (p, d) in enumerate(zip(poses, depths)):
            single = vsd_err(p[0], p[1], p[2], p[3], d, K,
                             self.verts, self.faces, self.diameter)
            np.testing.assert_allclose(batch[i], single, atol=1e-7,
                                       err_msg=f"frame {i}")

    def test_per_frame_intrinsics(self):
        from gdm_tpu.eval.vsd import vsd_err_batch

        K2 = K.copy()
        K2[0, 0] = K2[1, 1] = 450.0
        t = np.array([0, 0, 2.0], np.float32)
        d1 = _gt_depth(self.verts + t, self.faces)

        def gt2(v, f):  # render with the second intrinsics
            from gdm_tpu.ops.render_depth import render_depth_window
            import jax.numpy as jnp
            return np.asarray(render_depth_window(
                jnp.asarray((v).astype(np.float32)), jnp.asarray(f),
                jnp.asarray(K2.astype(np.float32)),
                jnp.zeros(2, np.float32), window=(480, 640), tile=16))

        d2 = gt2(self.verts + t, self.faces)
        poses = [(self.R, t, self.R, t)] * 2
        batch = vsd_err_batch(poses, [d1, d2], np.stack([K, K2]),
                              self.verts, self.faces, self.diameter)
        assert np.all(batch < 0.05)


class TestWindowAndSubdivisionBounds:
    def test_bucket_grows_past_largest(self):
        # ITODD/HB frames need windows over 1024 px; the bucket list must
        # grow instead of silently cropping the render
        from gdm_tpu.eval.vsd import _WINDOW_BUCKETS, _bucket

        assert _bucket(200, _WINDOW_BUCKETS) == 256
        assert _bucket(1025, _WINDOW_BUCKETS) == 2048
        assert _bucket(3000, _WINDOW_BUCKETS) == 4096

    def test_ray_angle_factor_from_intrinsics(self):
        from gdm_tpu.eval.vsd import _ray_angle_factor

        Kn = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
        f = _ray_angle_factor(Kn, (480, 640), margin=18.0)
        assert f == pytest.approx(1.0 + (320 + 18) / 500.0)
        # wide-FOV: shorter focal -> larger factor (the old hardcoded
        # 1.75 would have under-subdivided here)
        Kw = np.array([[250.0, 0, 320], [0, 250.0, 240], [0, 0, 1]])
        assert _ray_angle_factor(Kw, (480, 640), 18.0) > 2.0


class TestBackfaceCull:
    """Per-frame face culling/compaction (the batched-VSD scatter cost is
    linear in the face bucket; backfaces on closed meshes and stamps that
    miss the window are dropped exactly)."""

    def _sphere(self, n=200, r=0.05, seed=0):
        from scipy.spatial import ConvexHull

        rng = np.random.RandomState(seed)
        p = rng.randn(n, 3).astype(np.float32)
        verts = r * p / np.linalg.norm(p, axis=1, keepdims=True)
        hull = ConvexHull(verts)
        faces = hull.simplices.astype(np.int32)
        tri = verts[faces]
        nrm = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        flip = np.einsum("ij,ij->i", nrm, hull.equations[:, :3]) < 0
        faces[flip] = faces[flip][:, [0, 2, 1]]
        return verts, faces

    def test_winding_orientation(self):
        from gdm_tpu.eval.vsd import _winding_orientation

        verts, faces = self._sphere()
        assert _winding_orientation(verts, faces) == 1.0
        # all flipped: consistent but inward
        assert _winding_orientation(verts, faces[:, [0, 2, 1]]) == -1.0
        # one flipped face: inconsistent -> no culling
        bad = faces.copy()
        bad[0] = bad[0][[0, 2, 1]]
        assert _winding_orientation(verts, bad) is None
        # open sheet (the VSD square fixtures): must NOT be culled
        sq_v, sq_f = square_mesh()
        assert _winding_orientation(sq_v, sq_f) is None

    def test_face_bucket_sequence(self):
        from gdm_tpu.eval.vsd import _FACE_BUCKET_MIN, _face_bucket

        from gdm_tpu.eval.vsd import _FACE_CHUNK

        assert _face_bucket(0) == _FACE_BUCKET_MIN
        assert _face_bucket(1024) == 1024
        assert _face_bucket(1025) == 1536
        assert _face_bucket(2049) == 3072
        assert _face_bucket(4100) == 6144
        assert _face_bucket(9569) == 12288
        # every bucket is a multiple of the raster face chunk, so the
        # renderer's internal chunk padding never adds on top
        for n in (1, 700, 3000, 5000, 20000, 100000):
            assert _face_bucket(n) % _FACE_CHUNK == 0
            assert _face_bucket(n) >= n

    @pytest.mark.parametrize("flip_all", [False, True])
    def test_cull_is_exact_on_closed_mesh(self, flip_all):
        import jax.numpy as jnp

        from gdm_tpu.eval.vsd import (
            _face_bucket,
            _visible_face_idx,
            _winding_orientation,
        )

        verts, faces = self._sphere()
        if flip_all:          # inward winding: orient=-1 must also work
            faces = faces[:, [0, 2, 1]].copy()
        orient = _winding_orientation(verts, faces)
        assert orient == (-1.0 if flip_all else 1.0)
        v2, f2 = subdivide_max_edge(verts, faces, 0.01)
        rng = np.random.RandomState(1)
        R = np.linalg.qr(rng.randn(3, 3))[0].astype(np.float32)
        R *= np.sign(np.linalg.det(R))
        t = np.array([0.01, -0.005, 0.5], np.float32)
        origin = np.array([288.0, 208.0], np.float32)  # K cx,cy - side/2
        side, tile = 64, 16
        idx = _visible_face_idx(v2, f2, orient, R, t, K, origin,
                                side, tile)
        assert 0 < len(idx) < len(f2) // 2 + len(f2) // 8  # real cull
        vc = (v2 @ R.T + t).astype(np.float32)
        d_all = np.asarray(render_depth_window(
            jnp.asarray(vc), jnp.asarray(f2), jnp.asarray(K),
            jnp.asarray(origin), (side, side), tile))
        fc = np.zeros((_face_bucket(len(idx)), 3), np.int32)
        fc[:len(idx)] = f2[idx]
        d_cull = np.asarray(render_depth_window(
            jnp.asarray(vc), jnp.asarray(fc), jnp.asarray(K),
            jnp.asarray(origin), (side, side), tile))
        assert (d_all > 0).sum() > 100          # object actually visible
        np.testing.assert_array_equal(d_all, d_cull)

    def test_batch_equals_single_on_closed_mesh(self):
        from gdm_tpu.eval.vsd import vsd_err, vsd_err_batch

        verts, faces = self._sphere(n=80)
        diameter = 0.1
        rng = np.random.RandomState(2)
        R = np.eye(3, dtype=np.float32)
        poses, depths = [], []
        for z in (0.6, 0.9):
            t_gt = np.array([0, 0, z], np.float32)
            d = _gt_depth(verts @ R.T + t_gt, faces)
            t_est = t_gt + rng.randn(3).astype(np.float32) * 0.002
            poses.append((R, t_est, R, t_gt))
            depths.append(d)
        batch = vsd_err_batch(poses, depths, K, verts, faces, diameter)
        for i, (p, d) in enumerate(zip(poses, depths)):
            single = vsd_err(p[0], p[1], p[2], p[3], d, K, verts, faces,
                             diameter)
            np.testing.assert_allclose(batch[i], single, atol=1e-7)


class TestSentinelPose:
    """The <5-correspondence failure-sentinel pose (pose_fit: R=I,
    t=(0,0,-1000)) puts every vertex behind the camera; it must not
    drive the subdivision z-bucket to the 0.125 m worst case (which can
    blow past the face cap and abort the whole batch)."""

    def setup_method(self, _):
        self.verts, self.faces = square_mesh(half=0.1, z=0.0)
        self.R = np.eye(3, dtype=np.float32)
        self.t = np.array([0, 0, 2.0], np.float32)
        cam = self.verts @ self.R.T + self.t
        self.depth_test = _gt_depth(cam, self.faces)
        self.diameter = float(0.2 * np.sqrt(2))

    def test_behind_camera_estimate_uses_gt_z_bucket(self):
        from gdm_tpu.eval.vsd import _prep_job, _z_bucket

        t_sent = np.array([0, 0, -1000.0], np.float32)
        job = _prep_job(self.R, t_sent, self.R, self.t,
                        self.depth_test, K, self.verts, tile=32)
        # bucket comes from the GT pose's z (~1.9+), not the 0.125 floor
        assert job["zb"] == _z_bucket(float(
            (self.verts @ self.R.T + self.t)[:, 2].min()))
        assert job["zb"] > 1.0

    def test_batch_with_sentinel_frame_completes(self):
        from gdm_tpu.eval.vsd import vsd_err_batch

        t_sent = np.array([0, 0, -1000.0], np.float32)
        poses = [(self.R, self.t, self.R, self.t),
                 (self.R, t_sent, self.R, self.t)]
        errs = vsd_err_batch(poses, [self.depth_test] * 2, K,
                             self.verts, self.faces, self.diameter)
        assert np.all(np.asarray(errs[0]) < 0.02)       # perfect frame
        assert np.all(np.asarray(errs[1]) > 0.95)       # sentinel = miss


class TestHardMesh:
    """Realistic-workload VSD (VERDICT r2 item 5): a concave, closed,
    20k+-face trefoil-knot tube with deep self-occlusion — the
    subdivision/bucketing/winding machinery exercised at real BOP mesh
    complexity instead of the convex-sphere fixtures above."""

    @pytest.fixture(scope="class")
    def trefoil(self):
        from gdm_tpu.data.synthetic import make_trefoil_mesh

        return make_trefoil_mesh()

    def test_manifold_and_scale(self, trefoil):
        from gdm_tpu.eval.vsd import _winding_orientation

        verts, faces = trefoil
        assert len(faces) >= 20000
        assert _winding_orientation(verts, faces) == 1.0

    def test_cull_exact_on_concave_mesh(self, trefoil):
        # concave meshes interleave front/back surfaces at several depths
        # along one ray — culling must still be bit-identical (the convex
        # sphere above can't catch a front-behind-back ordering bug)
        import jax.numpy as jnp

        from gdm_tpu.eval.vsd import _face_bucket, _visible_face_idx

        verts, faces = trefoil
        rng = np.random.RandomState(3)
        R = np.linalg.qr(rng.randn(3, 3))[0].astype(np.float32)
        R *= np.sign(np.linalg.det(R))
        t = np.array([0.0, 0.0, 0.45], np.float32)
        origin = np.array([320.0 - 96, 240.0 - 96], np.float32)
        side, tile = 192, 16
        idx = _visible_face_idx(verts, faces, 1.0, R, t, K, origin,
                                side, tile)
        # roughly half the closed surface faces away from the camera
        assert 0 < len(idx) < int(0.72 * len(faces))
        vc = (verts @ R.T + t).astype(np.float32)
        d_all = np.asarray(render_depth_window(
            jnp.asarray(vc), jnp.asarray(faces), jnp.asarray(K),
            jnp.asarray(origin), (side, side), tile))
        fc = np.zeros((_face_bucket(len(idx)), 3), np.int32)
        fc[:len(idx)] = faces[idx]
        d_cull = np.asarray(render_depth_window(
            jnp.asarray(vc), jnp.asarray(fc), jnp.asarray(K),
            jnp.asarray(origin), (side, side), tile))
        assert (d_all > 0).sum() > 2000
        # the knot's own tube must occlude itself somewhere in this view
        # (depth spread across crossings), or the workload isn't "hard"
        cov = d_all[d_all > 0]
        assert cov.max() - cov.min() > 0.02
        np.testing.assert_array_equal(d_all, d_cull)

    @pytest.mark.slow
    def test_vsd_concave_cluttered(self, trefoil):
        # full vsd_err on the hard mesh against a cluttered test depth:
        # occluder patch + missing-depth holes, BOP19 visibility
        verts, faces = trefoil
        R = np.eye(3, dtype=np.float32)
        t = np.array([0.0, 0.0, 0.45], np.float32)
        diameter = float(np.linalg.norm(
            verts.max(0) - verts.min(0)))
        depth = _gt_depth(verts @ R.T + t, faces)
        assert (depth > 0).sum() > 5000
        # clutter: an occluder plane covering part of the object + holes
        occ_v, occ_f = square_mesh(half=0.02, z=0.35, cx=-0.03)
        occ_d = _gt_depth(occ_v, occ_f)
        depth_clut = depth.copy()
        m = occ_d > 0
        depth_clut[m] = occ_d[m]
        holes = np.random.RandomState(5).rand(*depth.shape) < 0.05
        depth_clut[holes] = 0.0
        errs = vsd_err(R, t, R, t, depth_clut, K, verts, faces, diameter)
        assert errs.shape == (10,)
        assert np.all(errs < 0.1)       # perfect pose survives clutter
        t_bad = t + np.array([0.5, 0, 0], np.float32)
        errs_bad = vsd_err(R, t_bad, R, t, depth_clut, K, verts, faces,
                           diameter)
        assert np.all(errs_bad > 0.9)

    @pytest.mark.slow
    def test_slot_gather_matches_scatter(self, trefoil):
        # the dense trefoil drives the slot binning into heavy row
        # spilling (worst-tile occupancy in the hundreds at cap 64):
        # the slot-row gather render must stay BIT-identical to the
        # scatter z-buffer (per-pixel depth is a function of
        # (face, pixel) only; min is order-free across slot rows)
        from gdm_tpu.eval.vsd import vsd_err

        verts, faces = trefoil
        R = np.eye(3, dtype=np.float32)
        t = np.array([0.0, 0.0, 0.45], np.float32)
        diameter = float(np.linalg.norm(verts.max(0) - verts.min(0)))
        depth = _gt_depth(verts @ R.T + t, faces)
        t_est = t + np.array([0.002, -0.001, 0.003], np.float32)
        e_g = vsd_err(R, t_est, R, t, depth, K, verts, faces, diameter,
                      renderer="gather")
        e_s = vsd_err(R, t_est, R, t, depth, K, verts, faces, diameter,
                      renderer="scatter")
        np.testing.assert_array_equal(e_g, e_s)

    @pytest.mark.slow
    def test_batch_equals_single_on_hard_mesh(self, trefoil):
        # the grouped/bucketed batch path must reproduce the single-frame
        # path on the 20k-face concave mesh (subdivision cache, face
        # buckets, host compaction all shared)
        from gdm_tpu.eval.vsd import vsd_err, vsd_err_batch

        verts, faces = trefoil
        diameter = float(np.linalg.norm(verts.max(0) - verts.min(0)))
        rng = np.random.RandomState(4)
        R = np.eye(3, dtype=np.float32)
        poses, depths = [], []
        for z in (0.45, 0.6):
            t_gt = np.array([0, 0, z], np.float32)
            d = _gt_depth(verts @ R.T + t_gt, faces)
            t_est = t_gt + rng.randn(3).astype(np.float32) * 0.003
            poses.append((R, t_est, R, t_gt))
            depths.append(d)
        batch = vsd_err_batch(poses, depths, K, verts, faces, diameter)
        for i, (p, d) in enumerate(zip(poses, depths)):
            single = vsd_err(p[0], p[1], p[2], p[3], d, K, verts, faces,
                             diameter)
            np.testing.assert_allclose(batch[i], single, atol=1e-6)


class TestSlotBinning:
    """bin_faces_to_slots unit contract: same (tile, face) coverage as
    the dense binning, rows capped at k_cap, dense tiles spilling."""

    def test_spill_matches_dense_coverage(self):
        from gdm_tpu.ops.render_depth import bin_faces_to_slots, \
            bin_faces_to_tiles

        rng = np.random.RandomState(0)
        side, tile, k_cap = 64, 16, 4
        n = 200
        # clustered points so several tiles exceed k_cap
        centers = rng.rand(n, 1, 2) * (side - 6)
        p = (centers + rng.rand(n, 3, 2) * 3).astype(np.float32)
        faces = rng.randint(1, 999, (n, 3)).astype(np.int32)
        valid = rng.rand(n) < 0.8

        dense = bin_faces_to_tiles(p, valid, faces, side, tile)
        cand, slot_tile = bin_faces_to_slots(p, valid, faces, side,
                                             tile, k_cap)
        assert cand.shape[1] == k_cap
        assert cand.shape[0] == slot_tile.shape[0]
        # at least one tile spilled into several rows
        assert len(slot_tile) > len(np.unique(slot_tile))

        def coverage(table, tiles):
            out = set()
            for row, t in zip(table, tiles):
                for tri in row:
                    if tri.any():
                        out.add((int(t), tuple(int(x) for x in tri)))
            return out

        g = side // tile
        dense_cov = coverage(dense, np.arange(g * g))
        slot_cov = coverage(cand, slot_tile)
        assert slot_cov == dense_cov

    def test_empty_and_single(self):
        from gdm_tpu.ops.render_depth import bin_faces_to_slots

        p = np.zeros((3, 3, 2), np.float32)
        faces = np.arange(9, dtype=np.int32).reshape(3, 3) + 1
        cand, st = bin_faces_to_slots(p, np.zeros(3, bool), faces,
                                      32, 16, 8)
        assert cand.shape == (1, 8, 3) and not cand.any()
        cand, st = bin_faces_to_slots(p, np.array([True, False, False]),
                                      faces, 32, 16, 8)
        assert (cand[0, 0] == faces[0]).all()
        assert st[0] == 0
