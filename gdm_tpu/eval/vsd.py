"""Visible Surface Discrepancy (BOP VSD) — fully on-device.

Reference: lib/pysixd/pose_error.py:22-129 (vsd), lib/pysixd/visibility.py
(bop19 visibility masks), lib/pysixd/misc.py:571-591 (depth->distance
image), driven offline by lib/pysixd/scripts/eval_calc_errors.py with
defaults delta=15mm, taus=0.05:0.05:0.5 of the diameter, correct_th=0.3
(eval_calc_scores.py:16-18).  The reference renders full frames with an
external C++/OpenGL renderer; here both model renders AND the mask/cost
math run in one jitted XLA program over a window covering the object
(outside the window the model depth is 0, so the visibility masks — which
require d_model > 0 — are unaffected; pixels beyond the full image bounds
are zeroed to match a full-frame render exactly).

Per pose pair the host only picks the window origin/size bucket and crops
the test depth; everything else is device-side.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gdm_tpu.ops.render_depth import render_depth_window

BOP19_TAUS = tuple(float(t) for t in np.arange(0.05, 0.51, 0.05))
BOP19_DELTA = 0.015          # 15 mm (eval_calc_errors.py:37-48)
BOP19_CORRECT_TH = (0.3,)    # eval_calc_scores.py:18

_WINDOW_BUCKETS = (64, 128, 256, 512, 1024)
_FACE_BUCKET_MIN = 1024

# per-mesh subdivision cache: the raster tile bounds screen-space triangle
# size, so the required 3-D edge bound depends on how close the object can
# get; z is bucketed to powers of two so one subdivision serves all frames
# in a range of distances
_MESH_CACHE: dict = {}


def _ray_angle_factor(K: np.ndarray, im_hw, margin: float) -> float:
    """1 + max(|x/z|, |y/z|) over the clipped render-window bounds.

    The raster window is clipped to the frame extended by `margin`
    (vsd_err), so the largest ray angle any rendered pixel can have is
    at those extended corners — computed from the actual intrinsics
    instead of the former hardcoded 0.75 frame-corner estimate, which
    silently under-subdivided wide-FOV cameras.
    """
    imh, imw = float(im_hw[0]), float(im_hw[1])
    rx = max(abs(-margin - K[0, 2]), abs(imw + margin - K[0, 2])) / K[0, 0]
    ry = max(abs(-margin - K[1, 2]), abs(imh + margin - K[1, 2])) / K[1, 1]
    return 1.0 + float(max(rx, ry))


def _z_bucket(z_min: float) -> float:
    """Bucket z_min in 1.25x steps: subdivided face count scales with
    (1/zb)^2, so coarse pow2 buckets would cost up to 4x the raster
    work; 1.25x granularity caps the overshoot at ~1.56x for at most a
    handful of cache entries per object.  Also the frame-grouping key of
    vsd_err_batch (frames sharing a bucket share one subdivision)."""
    zq = max(z_min, 0.126)
    return float(max(0.125, 1.25 ** np.floor(np.log(zq) / np.log(1.25))))


def _prepared_mesh(verts: np.ndarray, faces: np.ndarray, K: np.ndarray,
                   z_min: float, tile: int, ray_factor: float):
    """Subdivide (cached) so every triangle fits the raster tile at z_min."""
    import zlib

    fx = float(max(K[0, 0], K[1, 1]))
    zb = _z_bucket(z_min)
    # bucket the ray factor too (same 1.25 steps) so one subdivision
    # serves intrinsics/window variations without fragmenting the cache
    rf = float(1.25 ** np.ceil(np.log(max(ray_factor, 1.0))
                               / np.log(1.25)))
    key = (zlib.crc32(verts.tobytes()), zlib.crc32(faces.tobytes()),
           verts.shape[0], faces.shape[0], tile, zb, rf)
    if key not in _MESH_CACHE:
        from gdm_tpu.ops.render_depth import subdivide_max_edge

        # screen extent of a 3-D edge e at depth >= zb is bounded by
        # fx * e / zb * rf with rf = 1 + max(|x/z|,|y/z|) over the
        # clipped window (see _ray_angle_factor); the raster tile covers
        # bboxes up to tile-2 pixels (centre sampling)
        max_edge = (tile - 2) * zb / (fx * rf)
        v, f = subdivide_max_edge(verts, faces, max_edge)
        nf = len(f)
        fb = _FACE_BUCKET_MIN
        while fb < nf:
            fb *= 2
        fp = np.zeros((fb, 3), np.int32)
        fp[:nf] = f
        # pad the vertex count to a power of two as well: otherwise every
        # z bucket's subdivision yields a distinct vertex-array shape and
        # therefore a distinct _vsd_core_batch executable — through the
        # remote compile helper those recompiles dominated batched VSD
        # (padding verts is free: the extra rows are never indexed)
        vb = _FACE_BUCKET_MIN
        while vb < len(v):
            vb *= 2
        v = np.concatenate(
            [v, np.zeros((vb - len(v), 3), np.float32)], axis=0)
        # device-resident: the mesh is re-used for every frame of the
        # object; re-uploading ~MBs per call through the tunnel is waste
        _MESH_CACHE[key] = (jnp.asarray(v), jnp.asarray(fp))
    return _MESH_CACHE[key]


def _dist_factor(origin, window, K):
    """Per-pixel depth->distance multiplier at integer pixel coords
    (misc.py:571-591 uses the integer grid, not pixel centres)."""
    h, w = window
    x = origin[0] + jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    y = origin[1] + jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = (x - K[0, 2]) / K[0, 0]
    ys = (y - K[1, 2]) / K[1, 1]
    return jnp.sqrt(xs * xs + ys * ys + 1.0)


def _vsd_one(verts, faces, R_est, t_est, R_gt, t_gt, K, origin,
             depth_test_win, im_hw, taus, delta, diameter,
             window=(256, 256), tile=16, n_taus=10, cost_type="step",
             normalized_by_diameter=True):
    h, w = window
    v_est = verts @ R_est.T + t_est[None, :]
    v_gt = verts @ R_gt.T + t_gt[None, :]
    # one vmapped rasterization: XLA batches the two scatter-min z-buffers
    # into a single kernel instead of two dispatches
    d_est, d_gt = jax.vmap(
        lambda v: render_depth_window(v, faces, K, origin, window, tile)
    )(jnp.stack([v_est, v_gt]))

    # zero model depth beyond the full image bounds (a full-frame render
    # has no such pixels)
    x = origin[0] + jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    y = origin[1] + jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    in_im = ((x >= 0) & (x < im_hw[1]) & (y >= 0) & (y < im_hw[0]))
    d_est = jnp.where(in_im, d_est, 0.0)
    d_gt = jnp.where(in_im, d_gt, 0.0)

    # depth -> distance images (misc.py:571-591)
    f = _dist_factor(origin, window, K)
    dist_test = depth_test_win * f
    dist_est = d_est * f
    dist_gt = d_gt * f

    # bop19 visibility (visibility.py:34-36,75-76)
    def visib(d_model):
        return ((d_model - dist_test <= delta) | (dist_test == 0)) \
            & (d_model > 0)

    visib_gt = visib(dist_gt)
    visib_est = visib(dist_est) | (visib_gt & (dist_est > 0))

    inter = visib_gt & visib_est
    union = visib_gt | visib_est
    union_count = jnp.sum(union)
    comp_count = union_count - jnp.sum(inter)

    dists = jnp.abs(dist_gt - dist_est)
    if normalized_by_diameter:
        dists = dists / diameter

    def err_for_tau(tau):
        if cost_type == "step":
            costs = (dists >= tau).astype(jnp.float32)
        elif cost_type == "tlinear":
            costs = jnp.minimum(dists / tau, 1.0)
        else:
            raise ValueError(f"unknown cost_type {cost_type}")
        c = jnp.sum(jnp.where(inter, costs, 0.0))
        return jnp.where(union_count == 0, 1.0,
                         (c + comp_count) / jnp.maximum(union_count, 1))

    return jnp.stack([err_for_tau(taus[i]) for i in range(n_taus)])


@functools.partial(jax.jit, static_argnames=(
    "window", "tile", "n_taus", "cost_type", "normalized_by_diameter"))
def _vsd_core_batch(verts, faces, R_est, t_est, R_gt, t_gt, K, origin,
                    depth_wins, im_hw, taus, delta, diameter,
                    window=(256, 256), tile=16, n_taus=10,
                    cost_type="step", normalized_by_diameter=True):
    """Batched core: vmap over (poses, origin, depth window) with the
    mesh/K/taus shared — one compile per (window, tile) serves every
    frame group of every object, and the per-frame scatter-min z-buffers
    batch into a single dispatch instead of one launch per frame."""

    def one(R_e, t_e, R_g, t_g, o, d):
        return _vsd_one(verts, faces, R_e, t_e, R_g, t_g, K, o, d,
                        im_hw, taus, delta, diameter, window=window,
                        tile=tile, n_taus=n_taus, cost_type=cost_type,
                        normalized_by_diameter=normalized_by_diameter)

    return jax.vmap(one)(R_est, t_est, R_gt, t_gt, origin, depth_wins)


def _bucket(v, buckets):
    for b in buckets:
        if v <= b:
            return b
    # beyond the precomputed buckets (ITODD 1280x960, HB 1920x1440, or a
    # union bbox wider than 1024): grow by powers of two so the window
    # always covers the clipped bbox instead of silently cropping the
    # render (which would drop pixels from the visibility masks)
    b = buckets[-1]
    while b < v:
        b *= 2
    return b


def vsd_err(R_est, t_est, R_gt, t_gt, depth_test, K, verts, faces,
            diameter, delta=BOP19_DELTA, taus=BOP19_TAUS,
            normalized_by_diameter=True, cost_type="step",
            tile=16) -> np.ndarray:
    """VSD errors, one per tau (pose_error.py:22-129 semantics).

    Args:
      R_est/t_est/R_gt/t_gt: poses (metres).
      depth_test: [H, W] metric test depth (0 = missing).
      K: [3, 3] intrinsics.
      verts/faces: render mesh (metres, object frame).  Subdivision to
        the raster-tile bound happens internally (cached per mesh and
        distance bucket) — pass the mesh as loaded.

    Returns: [len(taus)] float errors in [0, 1].
    """
    job = _prep_job(R_est, t_est, R_gt, t_gt, depth_test, K, verts, tile)
    errs = _run_group(
        [job], np.asarray(verts, np.float32),
        np.asarray(faces, np.int32), diameter, delta, taus, tile,
        cost_type, normalized_by_diameter)
    return errs[0]


def _prep_job(R_est, t_est, R_gt, t_gt, depth_test, K, verts, tile):
    """Host-side per-frame prep: window origin/size bucket, depth crop,
    and the subdivision z bucket.  Returns a compact job dict (the crop,
    not the full frame) keyed for grouping by (side, z_bucket)."""
    depth_test = np.asarray(depth_test, np.float32)
    imh, imw = depth_test.shape
    R_est = np.asarray(R_est, np.float32)
    R_gt = np.asarray(R_gt, np.float32)
    t_est = np.asarray(t_est, np.float32).reshape(3)
    t_gt = np.asarray(t_gt, np.float32).reshape(3)
    verts = np.asarray(verts, np.float32)
    Knp = np.asarray(K, np.float32)

    # window = union bbox of both projections + raster margin
    def proj(R, t):
        vc = verts @ R.T + t[None, :]
        z = np.maximum(vc[:, 2], 1e-9)
        u = vc[:, 0] * Knp[0, 0] / z + Knp[0, 2]
        v = vc[:, 1] * Knp[1, 1] / z + Knp[1, 2]
        return u, v

    ue, ve = proj(R_est, t_est)
    ug, vg = proj(R_gt, t_gt)
    u = np.concatenate([ue, ug])
    v = np.concatenate([ve, vg])
    m = tile + 2.0
    x0, x1 = np.floor(u.min() - m), np.ceil(u.max() + m)
    y0, y1 = np.floor(v.min() - m), np.ceil(v.max() + m)
    # pixels outside the image never contribute (masked in-core) — clip
    # the window to the frame so far-out-of-view estimates stay cheap
    x0, x1 = np.clip([x0, x1], -m, imw + m)
    y0, y1 = np.clip([y0, y1], -m, imh + m)
    side = _bucket(max(x1 - x0, y1 - y0, 1.0), _WINDOW_BUCKETS)

    # crop the test depth at the window (zero-padded outside the frame)
    win = np.zeros((side, side), np.float32)
    ox, oy = int(x0), int(y0)
    sx0, sy0 = max(0, ox), max(0, oy)
    sx1, sy1 = min(imw, ox + side), min(imh, oy + side)
    if sx1 > sx0 and sy1 > sy0:
        win[sy0 - oy:sy1 - oy, sx0 - ox:sx1 - ox] = \
            depth_test[sy0:sy1, sx0:sx1]

    z_min = float(min((verts @ R_est.T + t_est)[:, 2].min(),
                      (verts @ R_gt.T + t_gt)[:, 2].min()))
    return {
        "R_est": R_est, "t_est": t_est, "R_gt": R_gt, "t_gt": t_gt,
        "origin": np.array([ox, oy], np.float32), "win": win,
        "side": side, "zb": _z_bucket(z_min), "z_min": z_min,
        "im_hw": np.array([imh, imw], np.float32), "margin": m,
        "K": Knp,
    }


def _run_group(jobs, verts, faces, diameter, delta, taus, tile,
               cost_type, normalized_by_diameter):
    """Run jobs that share (side, z bucket, K, im_hw) as ONE vmapped
    call.

    The batch is padded to a power of two (repeating the last job) so
    remainder groups reuse compiles instead of specialising per size."""
    n = len(jobs)
    side = jobs[0]["side"]
    Knp = jobs[0]["K"]
    imh, imw = jobs[0]["im_hw"]
    verts_s, faces_p = _prepared_mesh(
        verts, faces, Knp, min(j["z_min"] for j in jobs), tile,
        _ray_angle_factor(Knp, (imh, imw), jobs[0]["margin"]))
    nb = 1
    while nb < n:
        nb *= 2
    jobs = jobs + [jobs[-1]] * (nb - n)
    stack = {k: jnp.asarray(np.stack([j[k] for j in jobs]))
             for k in ("R_est", "t_est", "R_gt", "t_gt", "origin", "win")}
    errs = _vsd_core_batch(
        verts_s, faces_p,
        stack["R_est"], stack["t_est"], stack["R_gt"], stack["t_gt"],
        jnp.asarray(Knp), stack["origin"], stack["win"],
        jnp.asarray(jobs[0]["im_hw"]),
        jnp.asarray(list(taus), np.float32),
        jnp.asarray(delta, np.float32),
        jnp.asarray(diameter, np.float32),
        window=(side, side), tile=tile, n_taus=len(taus),
        cost_type=cost_type,
        normalized_by_diameter=normalized_by_diameter)
    return np.asarray(errs)[:n]


def vsd_err_batch(poses, depth_tests, K, verts, faces, diameter,
                  delta=BOP19_DELTA, taus=BOP19_TAUS,
                  normalized_by_diameter=True, cost_type="step",
                  tile=16, group_cap=64) -> np.ndarray:
    """VSD errors for many frames of one object: [n, len(taus)].

    Frames are grouped by (window bucket, subdivision z bucket) and each
    group runs as one vmapped device call — the per-frame dispatch and
    scatter-launch overhead of calling :func:`vsd_err` in a loop is the
    dominant cost of offline `score --vsd` over full test sets.

    Args:
      poses: sequence of (R_est, t_est, R_gt, t_gt).
      depth_tests: matching sequence of [H, W] metric test depths.
      K: one [3, 3] intrinsics shared by all frames, or a sequence of
        per-frame intrinsics (frames group by K as well).
      group_cap: max frames per device call (bounds the window buffer
        memory: group_cap * side^2 floats).
    """
    K = np.asarray(K, np.float32)
    Ks = ([K] * len(depth_tests)) if K.ndim == 2 else list(K)
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int32)
    jobs = [_prep_job(R_e, t_e, R_g, t_g, d, Ki, verts, tile)
            for (R_e, t_e, R_g, t_g), d, Ki
            in zip(poses, depth_tests, Ks)]
    out = np.zeros((len(jobs), len(taus)), np.float64)
    groups: dict = {}
    for i, j in enumerate(jobs):
        groups.setdefault(
            (j["side"], j["zb"], j["K"].tobytes(),
             tuple(j["im_hw"])), []).append(i)
    for idxs in groups.values():
        for s in range(0, len(idxs), group_cap):
            sel = idxs[s:s + group_cap]
            errs = _run_group(
                [jobs[i] for i in sel], verts, faces, diameter,
                delta, taus, tile, cost_type, normalized_by_diameter)
            for row, i in zip(errs, sel):
                out[i] = row
    return out


def vsd_recall(errors_per_frame, correct_ths=BOP19_CORRECT_TH) -> float:
    """Mean recall over frames x taus x thresholds.

    BOP19 scoring averages `e < th` over the tau grid and the threshold
    grid (eval_calc_scores.py:18 uses th=0.3; the BOP19 challenge also
    averages th over 0.05:0.05:0.5 — pass correct_ths accordingly).
    """
    errs = np.asarray(list(errors_per_frame), np.float64)  # [n, n_taus]
    if errs.size == 0:
        return 0.0
    hits = [(errs < th).mean() for th in correct_ths]
    return float(np.mean(hits))
