"""Refinement options of the batched pose fit: ransac / icp / meanshift
all recover a clean synthetic pose from oracle features."""

import numpy as np
import pytest

import conftest  # noqa: F401


def _problem(n=512, m=300, noise=0.0, outlier_frac=0.0, seed=0):
    """Oracle matching problem: scene = posed mesh points, features are
    one-hot-ish so argmax correspondence is exact."""
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation

    rng = np.random.RandomState(seed)
    mesh_xyz = rng.randn(m, 3).astype(np.float32) * 0.05
    R = Rotation.random(random_state=seed).as_matrix().astype(np.float32)
    t = np.array([0.02, -0.01, 0.5], np.float32)
    sel = rng.randint(0, m, n)
    cld = mesh_xyz[sel] @ R.T + t
    if noise:
        cld = cld + rng.randn(n, 3).astype(np.float32) * noise
    n_out = int(outlier_frac * n)
    if n_out:
        cld[:n_out] += rng.randn(n_out, 3).astype(np.float32) * 0.2

    c = 64
    basis = rng.randn(m, c).astype(np.float32)
    basis /= np.linalg.norm(basis, axis=1, keepdims=True)
    feats = basis[sel] * 10.0
    seg = np.zeros((n, 2), np.float32)
    seg[:, 1] = 5.0                                       # all foreground
    out = {
        "seg": jnp.asarray(seg[None]),
        "rgbd": jnp.asarray(feats[None]),
        "mesh": jnp.asarray(basis * 10.0),
    }
    pose_gt = np.hstack([R, t[:, None]])
    return jnp.asarray(cld[None]), out, jnp.asarray(mesh_xyz), pose_gt


def _errors(rt, gt):
    r_err = np.rad2deg(np.arccos(np.clip(
        (np.trace(rt[:, :3] @ gt[:, :3].T) - 1) / 2, -1, 1)))
    return r_err, np.linalg.norm(rt[:, 3] - gt[:, 3])


@pytest.mark.parametrize("refine", [None, "ransac", "icp", "meanshift"])
def test_refine_recovers_pose(refine):
    from gdm_tpu.eval.pose_fit import fit_poses_from_outputs

    cld, out, mesh_xyz, gt = _problem()
    rt = np.asarray(fit_poses_from_outputs(
        cld, out, mesh_xyz, refine=refine))[0]
    r_err, t_err = _errors(rt, gt)
    assert r_err < 1.0 and t_err < 2e-3, (refine, r_err, t_err)


def test_ransac_beats_plain_with_outliers():
    from gdm_tpu.eval.pose_fit import fit_poses_from_outputs

    cld, out, mesh_xyz, gt = _problem(outlier_frac=0.3, seed=3)
    rt_plain = np.asarray(fit_poses_from_outputs(
        cld, out, mesh_xyz))[0]
    rt_ransac = np.asarray(fit_poses_from_outputs(
        cld, out, mesh_xyz, refine="ransac"))[0]
    r_p, t_p = _errors(rt_plain, gt)
    r_r, t_r = _errors(rt_ransac, gt)
    assert t_r < t_p and r_r < r_p
    assert r_r < 1.0 and t_r < 2e-3
