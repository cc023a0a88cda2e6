"""On-device pose recovery from network outputs.

Reference: evaluator.py:60-102 (cal_frame_poses) ran per frame on a host
thread pool (evaluator.py:294-303) with device<->host ping-pong; here the
whole batch is one jitted, vmapped computation:

    seg argmax -> fg mask -> normalise features -> [N, M] similarity ->
    per-point argmax -> masked (weighted) Kabsch

Failure conventions mirror the reference: a frame with a failed detection,
<=1 segmented points, or <5 correspondences returns the sentinel pose
R=I, t=(0,0,-1000) (evaluator.py:70-97).  Optional refinement: fixed-
iteration ICP (utils/icp.py parity) or mean-shift translation filtering.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gdm_tpu.ops.kabsch import weighted_kabsch, transform_pts
from gdm_tpu.ops.knn import knn_with_dist
from gdm_tpu.ops.meanshift import mean_shift
from gdm_tpu.ops.ransac import ransac_kabsch


def _miss_pose():
    rt = jnp.eye(3, 4, dtype=jnp.float32)
    return rt.at[2, 3].set(-1000.0)


def fit_pose_single(
    cld: jax.Array,
    seg: jax.Array,
    mesh_features: jax.Array,
    rgbd_features: jax.Array,
    mesh_xyz: jax.Array,
    det: jax.Array,
    use_pallas: bool = False,
    idx: jax.Array | None = None,
):
    """One frame (cal_frame_poses parity, fixed shape).

    Args:
      cld:  [N, 3] scene points.
      seg:  [N, 2] seg logits.
      mesh_features: [M, C]; rgbd_features: [N, C]; mesh_xyz: [M, 3].
      det:  scalar 0/1 — detection success flag.
      use_pallas: route the similarity argmax through the streaming
        Pallas kernel (O(tile) VMEM).  Measured SLOWER than XLA's fused
        matmul+argmax at every production shape (ops/pallas/similarity
        module docstring) — keep False unless bounding memory matters
        more than speed.

    Returns:
      ([3, 4] pose, [N] correspondence weights, [N] matched vertex ids)
    """
    from gdm_tpu.ops.pallas.similarity import cosine_argmax

    fg = (jnp.argmax(seg, axis=-1) == 1)
    if idx is None:
        f = rgbd_features / jnp.maximum(
            jnp.linalg.norm(rgbd_features, axis=-1, keepdims=True), 1e-12)
        # reference normalises mesh per column of [C, M]
        # (evaluator.py:90); ours is [M, C], so per row
        mf = mesh_features / jnp.maximum(
            jnp.linalg.norm(mesh_features, axis=-1, keepdims=True), 1e-12)
        idx, _ = cosine_argmax(f, mf, use_pallas=use_pallas)
    w = fg.astype(jnp.float32) * det.astype(jnp.float32)
    A = jnp.take(mesh_xyz, idx, axis=0)
    rt = weighted_kabsch(A, cld, w)
    ok = jnp.sum(w) >= 5.0
    rt = jnp.where(ok, rt, _miss_pose())
    return rt, w, idx


@functools.partial(jax.jit,
                   static_argnames=("refine", "icp_iters", "use_pallas"))
def fit_poses_from_outputs(
    cld: jax.Array,
    end_points: dict,
    mesh_xyz: jax.Array,
    det: jax.Array | None = None,
    refine: str | None = None,
    icp_iters: int = 10,
    use_pallas: bool = False,
    icp_reject_dist: jax.Array | float = 0.01,
    pre_idx: jax.Array | None = None,
):
    """Batched pose fit from GeoMatch outputs.

    Args:
      cld: [B, N, 3]; end_points: {'seg' [B,N,2], 'rgbd' [B,N,C],
      'mesh' [M,C]}; mesh_xyz: [M, 3]; det: [B] 0/1.
      refine: None | 'ransac' | 'icp' | 'meanshift'.
      use_pallas: correspondence argmax via the streaming Pallas kernel
        (one launch for the whole batch; rows fold into the kernel grid).
      icp_reject_dist: ICP correspondence gate in metres.  A traced
        scalar, so one compiled eval program serves every object while
        the gate follows the dataset's threshold convention (LM fixed
        1 cm, YCB-V nn_dist_th x diameter — linemod_pbr.py:38,
        ycbv_pbr.py:49).
      pre_idx: [B, N] precomputed correspondence vertex ids — callers
        that already ran the similarity argmax (e.g. the model-sharded
        parallel.sp.sharded_cosine_argmax path) pass it here so the fit
        skips the dense argmax.

    Returns:
      poses [B, 3, 4].
    """
    b = cld.shape[0]
    det = jnp.ones((b,), jnp.float32) if det is None else det

    if pre_idx is None and use_pallas:
        from gdm_tpu.ops.pallas.similarity import cosine_argmax_batched

        f = end_points["rgbd"] / jnp.maximum(jnp.linalg.norm(
            end_points["rgbd"], axis=-1, keepdims=True), 1e-12)
        mf = end_points["mesh"] / jnp.maximum(jnp.linalg.norm(
            end_points["mesh"], axis=-1, keepdims=True), 1e-12)
        pre_idx, _ = cosine_argmax_batched(f, mf, use_pallas=True)

    def one(c, s, r, d, pidx):
        rt, w, idx = fit_pose_single(
            c, s, end_points["mesh"], r, mesh_xyz, d, idx=pidx)
        return apply_refine(rt, w, idx, c, mesh_xyz, refine,
                            icp_iters=icp_iters,
                            icp_reject_dist=icp_reject_dist)

    if pre_idx is None:
        pre_idx = jnp.zeros(cld.shape[:2], jnp.int32)

        def one_noidx(c, s, r, d, _):
            return one(c, s, r, d, None)

        return jax.vmap(one_noidx)(
            cld, end_points["seg"], end_points["rgbd"], det, pre_idx)
    return jax.vmap(one)(
        cld, end_points["seg"], end_points["rgbd"], det, pre_idx)


def apply_refine(rt, w, idx, c, mesh_xyz, refine,
                 icp_iters: int = 10, icp_reject_dist=0.01):
    """Single-element pose refinement step shared by the batched fit
    and the stacked multi-model path (refine: None | 'ransac' | 'icp' |
    'meanshift'; a miss-sentinel pose — rt[2,3] <= -999 — passes
    through unrefined)."""
    if refine == "ransac":
        # reference best_fit_transform_with_RANSAC option
        # (pvn3d_eval_utils_kpls.py:79-124), vectorized
        key = jax.random.fold_in(
            jax.random.PRNGKey(0), jnp.sum(idx).astype(jnp.int32))
        A = jnp.take(mesh_xyz, idx, axis=0)
        rt2 = ransac_kabsch(A, c, w, key)
        rt = jnp.where(rt[2, 3] > -999.0, rt2, rt)
    elif refine == "icp":
        rt2 = icp_refine(mesh_xyz, c, w, rt, iters=icp_iters,
                         reject_dist=icp_reject_dist)
        rt = jnp.where(rt[2, 3] > -999.0, rt2, rt)
    elif refine == "meanshift":
        # cluster per-point translation votes t_i = p_i - R m_idx(i)
        votes = c - jnp.take(mesh_xyz, idx, axis=0) @ rt[:, :3].T
        center, _ = mean_shift(votes, bandwidth=0.05, mask=w)
        rt = jnp.where(rt[2, 3] > -999.0,
                       rt.at[:, 3].set(center), rt)
    return rt


def icp_refine(
    model_pts: jax.Array,
    scene_pts: jax.Array,
    scene_w: jax.Array,
    init_rt: jax.Array,
    iters: int = 10,
    reject_dist: jax.Array | float = 0.01,
):
    """Fixed-iteration point-to-point ICP (utils/icp.py:126-190 parity).

    Model points are moved by the current pose, matched to their nearest
    (weighted-valid) scene point, gated by `reject_dist` (a traced
    scalar is fine — pass the dataset's diameter-scaled threshold), and
    refit.  Runs as a lax.scan — no convergence branch (the reference's
    tolerance break rarely fires before 10 iterations at these scales).
    """
    big = 1e6

    # push invalid scene points far away so they never win the NN search
    scene_valid = scene_pts + (1.0 - scene_w[:, None]) * big

    def step(rt, _):
        moved = transform_pts(model_pts, rt)
        idx, dist = knn_with_dist(scene_valid, moved, 1)
        tgt = jnp.take(scene_pts, idx[:, 0], axis=0)
        w = (dist[:, 0] < reject_dist).astype(jnp.float32)
        new_rt = weighted_kabsch(model_pts, tgt, w)
        ok = jnp.sum(w) >= 4.0
        return jnp.where(ok, new_rt, rt), None

    rt, _ = jax.lax.scan(step, init_rt, None, length=iters)
    return rt
