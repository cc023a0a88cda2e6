"""End-to-end geometric pipeline test: synthetic frame -> GT correspondences
-> on-device pose fit recovers the known pose.

This validates the whole chain *around* the network (render, backproject,
sampling, visibility/NN ground truth, similarity argmax, masked Kabsch)
with oracle descriptors: scene points carry the embedding of their GT
vertex, so matching must recover the GT correspondences and Kabsch the GT
pose (SURVEY.md section 7's "tiny synthetic end-to-end pose test").
"""

import jax
import jax.numpy as jnp
import numpy as np

from gdm_tpu.data.synthetic import make_batch, make_object
from gdm_tpu.eval.pose_fit import fit_poses_from_outputs, icp_refine
from gdm_tpu.eval.metrics import add_err, re_err, te_err

K = np.array([[280.0, 0, 128], [0, 280.0, 128], [0, 0, 1]], np.float32)


def _oracle_outputs(batch, mesh_pts, dim=32, seed=0):
    """Descriptors that are perfect for matched points, noise elsewhere."""
    rng = np.random.RandomState(seed)
    m = mesh_pts.shape[0]
    mesh_feat = rng.randn(m, dim).astype(np.float32)
    mesh_feat /= np.linalg.norm(mesh_feat, axis=1, keepdims=True)
    B, N = batch["match_idx"].shape
    rgbd = rng.randn(B, N, dim).astype(np.float32) * 0.01
    seg = np.zeros((B, N, 2), np.float32)
    seg[..., 0] = 5.0
    for b in range(B):
        mi = batch["match_idx"][b]
        ok = mi < m
        rgbd[b, ok] = mesh_feat[mi[ok]]
        seg[b, ok, 0] = -5.0
        seg[b, ok, 1] = 5.0
    return {
        "seg": jnp.array(seg),
        "rgbd": jnp.array(rgbd),
        "mesh": jnp.array(mesh_feat),
    }


class TestEndToEndPose:
    def test_pose_recovery_oracle_features(self):
        rng = np.random.RandomState(3)
        mesh = make_object(512, rng)
        mesh_pts = mesh[:, :3] / 1000.0
        batch, poses = make_batch(mesh, batch=3, K=K, im_size=128,
                                  n_sample=1024)
        outputs = _oracle_outputs(batch, mesh_pts)
        cld = jnp.array(batch["cld_rgb_nrm"][..., :3])
        fit = np.asarray(fit_poses_from_outputs(
            cld, outputs, jnp.array(mesh_pts)))
        for b in range(3):
            r_deg = re_err(fit[b, :, :3], poses[b, :, :3])
            t_m = te_err(fit[b, :, 3], poses[b, :, 3])
            ad = add_err(fit[b, :, :3], fit[b, :, 3],
                         poses[b, :, :3], poses[b, :, 3], mesh_pts)
            # tolerances bounded by pixel quantisation of the synthetic
            # render (~1px at f=280, z=0.4 -> ~1.4mm point noise)
            assert r_deg < 6.0, f"frame {b}: rot err {r_deg}"
            assert t_m < 0.01, f"frame {b}: trans err {t_m}"
            assert ad < 0.008, f"frame {b}: add {ad}"

    def test_failed_detection_sentinel(self):
        rng = np.random.RandomState(4)
        mesh = make_object(256, rng)
        mesh_pts = mesh[:, :3] / 1000.0
        batch, _ = make_batch(mesh, batch=2, K=K, im_size=128,
                              n_sample=512)
        outputs = _oracle_outputs(batch, mesh_pts)
        det = jnp.array([1.0, 0.0])
        cld = jnp.array(batch["cld_rgb_nrm"][..., :3])
        fit = np.asarray(fit_poses_from_outputs(
            cld, outputs, jnp.array(mesh_pts), det=det))
        assert fit[1, 2, 3] == -1000.0        # sentinel for failed det
        assert fit[0, 2, 3] > -999.0

    def test_icp_refinement_improves_noisy_pose(self):
        rng = np.random.RandomState(5)
        mesh = make_object(512, rng)
        mesh_pts = mesh[:, :3] / 1000.0
        batch, poses = make_batch(mesh, batch=1, K=K, im_size=128,
                                  n_sample=1024)
        cld = batch["cld_rgb_nrm"][0, :, :3]
        w = (batch["labels"][0] > 0).astype(np.float32)
        # perturb the GT pose
        from scipy.spatial.transform import Rotation

        dR = Rotation.from_rotvec([0.05, -0.03, 0.02]).as_matrix()
        noisy = poses[0].copy()
        noisy[:, :3] = dR @ noisy[:, :3]
        noisy[:, 3] += np.array([0.005, -0.004, 0.006])
        # refine with the visible vertex subset — matching hidden back-face
        # vertices to front-surface scene points biases point-to-point ICP
        vis = batch["visible_flag"][0] > 0
        vis_pts = mesh_pts[vis]
        refined = np.asarray(icp_refine(
            jnp.array(vis_pts), jnp.array(cld), jnp.array(w),
            jnp.array(noisy), iters=15))
        before = add_err(noisy[:, :3], noisy[:, 3], poses[0][:, :3],
                         poses[0][:, 3], mesh_pts)
        after = add_err(refined[:, :3], refined[:, 3], poses[0][:, :3],
                        poses[0][:, 3], mesh_pts)
        assert after < before * 0.5, (before, after)


class TestSyntheticData:
    def test_gt_correspondences_are_geometric(self):
        """match_idx must point at the mesh vertex that lands on the scene
        point under the GT pose."""
        rng = np.random.RandomState(6)
        mesh = make_object(512, rng)
        mesh_pts = mesh[:, :3] / 1000.0
        batch, poses = make_batch(mesh, batch=1, K=K, im_size=128,
                                  n_sample=1024)
        mi = batch["match_idx"][0]
        cld = batch["cld_rgb_nrm"][0, :, :3]
        ok = mi < mesh_pts.shape[0]
        assert ok.sum() > 30
        proj = mesh_pts[mi[ok]] @ poses[0][:, :3].T + poses[0][:, 3]
        d = np.linalg.norm(proj - cld[ok], axis=1)
        assert np.percentile(d, 90) < 0.012

    def test_visible_flag_plausible(self):
        rng = np.random.RandomState(7)
        mesh = make_object(512, rng)
        batch, _ = make_batch(mesh, batch=1, K=K, im_size=128,
                              n_sample=512)
        vis = batch["visible_flag"][0]
        assert 0.2 < vis.mean() < 0.9
