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

from gdm_tpu.ops.render_depth import (
    bin_faces_to_slots,
    bin_faces_to_tiles,  # noqa: F401 (dense layout kept for tests)
    render_depth_window,
    render_depth_window_gather,
)

BOP19_TAUS = tuple(float(t) for t in np.arange(0.05, 0.51, 0.05))
BOP19_DELTA = 0.015          # 15 mm (eval_calc_errors.py:37-48)
BOP19_CORRECT_TH = (0.3,)    # eval_calc_scores.py:18

_WINDOW_BUCKETS = (64, 128, 256, 512, 1024)
# 512-face buckets + raster chunks (measured on chip 2026-08-18, 16-frame
# sphere workload at tile=32: 39 -> 31 ms/frame vs 1024): finer buckets
# waste less padding on post-cull face counts and the smaller scan-step
# temporaries schedule better
_FACE_BUCKET_MIN = 512
_FACE_CHUNK = 512
# gather renderer: per-tile candidate-count bucket floor and the scan
# chunk bounding the live [G, chunk, tile^2] temporary (swept on chip
# 2026-08-19: 64 -> 20.6, 128 -> 17.7, 256 -> 17.5, 512 -> 16.7
# ms/frame on the bench workload)
_CAND_BUCKET_MIN = 64
_CAND_CHUNK = 512
# gather renderer slot capacity (bin_faces_to_slots): small enough that
# table bytes track the real candidate count (dense tiny-face meshes
# have mean per-tile occupancy ~25 but worst-tile occupancy in the
# thousands — a global max pad was ~1.2 GB/chunk and upload-bound
# through the tunnel), large enough that per-row fixed costs amortise
_SLOT_CAP = 64

# per-mesh subdivision cache: the raster tile bounds screen-space triangle
# size, so the required 3-D edge bound depends on how close the object can
# get; z is bucketed to powers of two so one subdivision serves all frames
# in a range of distances
_MESH_CACHE: dict = {}      # insertion-ordered, LRU-bounded (see below)
_MESH_CACHE_MAX = 16


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


def _winding_orientation(verts: np.ndarray, faces: np.ndarray):
    """+1/-1 if `faces` are a consistently wound closed 2-manifold
    (sign = direction of the signed volume, i.e. whether the winding is
    outward), else None.

    Consistent winding on a closed manifold means every undirected edge
    appears in exactly two faces with OPPOSITE directions — checked via
    directed-edge multisets.  Only such meshes can be backface-culled
    exactly (a front face always occludes the back surface along every
    ray); open sheets or mixed-winding meshes return None and are
    rendered two-sided.
    """
    f = np.asarray(faces, np.int64)
    if len(f) == 0:
        return None
    nv = int(f.max()) + 1
    e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    fwd = e[:, 0] * nv + e[:, 1]
    if np.unique(fwd).size != fwd.size:      # duplicated directed edge
        return None
    rev = e[:, 1] * nv + e[:, 0]
    if not np.array_equal(np.sort(fwd), np.sort(rev)):
        return None                          # boundary / non-manifold
    v = np.asarray(verts, np.float64)
    vol6 = np.einsum("ij,ij->i", v[f[:, 0]],
                     np.cross(v[f[:, 1]], v[f[:, 2]])).sum()
    if abs(vol6) < 1e-18:
        return None
    return 1.0 if vol6 > 0 else -1.0


def _face_bucket(n: int, base: int = _FACE_BUCKET_MIN) -> int:
    """Smallest base * {2^k, 3*2^(k-1)} >= n.

    Two buckets per octave instead of pow2: cuts the worst padding waste
    from 2x to 1.5x (average ~1.2x) while keeping the number of distinct
    scan lengths — i.e. distinct _vsd_core_batch executables paying a
    remote compile — to a handful per workload.  Every bucket is a
    multiple of the _FACE_CHUNK raster chunk, so the renderer's own
    chunk padding adds nothing on top.  The gather renderer buckets its
    per-tile candidate count with base=_CAND_BUCKET_MIN; _run_group
    rounds buckets above _CAND_CHUNK up to a multiple of it so the
    device scan length equals the bucket there too.
    """
    m = 1
    while base * m < n:
        if m == 1:
            m = 2
        elif (m & (m - 1)) == 0:        # power of two -> 1.5x
            m = 3 * m // 2
        else:                            # 3*2^(k-1)   -> 4/3x
            m = 4 * m // 3
    return base * m


def _prepared_mesh(verts: np.ndarray, faces: np.ndarray, K: np.ndarray,
                   z_min: float, tile: int, ray_factor: float):
    """Subdivide (cached) so every triangle fits the raster tile at z_min.

    Returns (verts_np [Vb,3] pow2-padded, faces_np [F,3] unpadded,
    dev_verts, orient): faces stay host-side because the batched path
    culls and compacts them per frame/pose before upload."""
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

        # winding consistency is a property of the ORIGINAL mesh (the
        # subdivision splits faces in place, preserving each parent's
        # orientation, but leaves midpoints unwelded — the directed-edge
        # check must run before subdividing)
        orient = _winding_orientation(verts, faces)
        # screen extent of a 3-D edge e at depth >= zb is bounded by
        # fx * e / zb * rf with rf = 1 + max(|x/z|,|y/z|) over the
        # clipped window (see _ray_angle_factor); the raster tile covers
        # bboxes up to tile-2 pixels (centre sampling)
        max_edge = (tile - 2) * zb / (fx * rf)
        v, f = subdivide_max_edge(verts, faces, max_edge)
        # pad the vertex count to a power of two: otherwise every
        # z bucket's subdivision yields a distinct vertex-array shape and
        # therefore a distinct _vsd_core_batch executable — through the
        # remote compile helper those recompiles dominated batched VSD
        # (padding verts is free: the extra rows are never indexed)
        vb = _FACE_BUCKET_MIN
        while vb < len(v):
            vb *= 2
        v = np.concatenate(
            [v, np.zeros((vb - len(v), 3), np.float32)], axis=0)
        # verts device-resident: re-used for every frame of the object;
        # re-uploading ~MBs per call through the tunnel is waste
        _MESH_CACHE[key] = (v, f.astype(np.int32), jnp.asarray(v), orient)
        # LRU-bound the cache: entries pin pow2-padded subdivided verts
        # in host RAM AND HBM (tens of MB each at near z buckets), and a
        # multi-object score over several z buckets would otherwise
        # accumulate them for the life of the process
        while len(_MESH_CACHE) > _MESH_CACHE_MAX:
            _MESH_CACHE.pop(next(iter(_MESH_CACHE)))
    else:
        _MESH_CACHE[key] = _MESH_CACHE.pop(key)     # refresh LRU order
    return _MESH_CACHE[key]


def _project_visible(v_sub, f_sub, orient, R, t, K, origin, side, tile):
    """Per-face window projections + contribution mask for one render.

    Always culls faces whose raster stamp cannot intersect the window or
    that the device would drop anyway (behind camera, zero screen area).
    When `orient` is set (consistently wound closed mesh) also culls
    backfaces: with outward winding (orient=+1) a camera-facing triangle
    projects with NEGATIVE signed area in y-down image coordinates, and
    on a closed manifold the front surface always occludes the back, so
    dropping backfaces cannot change the z-buffer minimum.  Mirrors the
    validity logic of ops/render_depth.render_depth_window.

    Returns (p [F,3,2] window-pixel coords, vis [F] bool).
    """
    eps = 1e-9
    vc = v_sub @ R.T + t[None, :]
    z = vc[:, 2]
    zs = np.maximum(z, eps)
    u = vc[:, 0] * K[0, 0] / zs + K[0, 2] - origin[0]
    w = vc[:, 1] * K[1, 1] / zs + K[1, 2] - origin[1]
    p = np.stack([u, w], axis=1)[f_sub]                     # [F,3,2]
    fz = z[f_sub]
    vis = (fz > eps).all(axis=1)                            # device 'front'
    d01 = p[:, 1] - p[:, 0]
    d02 = p[:, 2] - p[:, 0]
    area = d01[:, 0] * d02[:, 1] - d01[:, 1] * d02[:, 0]
    vis &= np.abs(area) > eps                               # device 'ok'
    if orient is not None:
        vis &= (area * orient) < 0
    bb0 = np.floor(p.min(axis=1))                           # stamp anchor
    vis &= ((bb0[:, 0] + tile > 0) & (bb0[:, 0] < side)
            & (bb0[:, 1] + tile > 0) & (bb0[:, 1] < side))
    return p, vis


def _visible_face_idx(v_sub, f_sub, orient, R, t, K, origin, side, tile):
    """Indices of subdivided faces that can contribute to this render."""
    _, vis = _project_visible(v_sub, f_sub, orient, R, t, K, origin,
                              side, tile)
    return np.where(vis)[0]


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
             normalized_by_diameter=True, renderer="scatter"):
    h, w = window
    # exact f32 pose transform: the host-side cull/binning projects the
    # same vertices in f32 and assumes it matches the device projection
    # (a bf16 MXU lowering would shift vertices ~0.2-0.5 px, opening
    # tile-seam holes in the gather renderer); [V,3]x[3,3] is tiny, so
    # HIGHEST costs nothing
    with jax.default_matmul_precision("float32"):
        v_est = verts @ R_est.T + t_est[None, :]
        v_gt = verts @ R_gt.T + t_gt[None, :]
    # one vmapped rasterization: XLA batches the two renders into a
    # single program instead of two dispatches.  Scatter form: `faces`
    # is [2,F,3] per-render culled/compacted face lists (zero rows =
    # degenerate padding the rasterizer skips).  Gather form: `faces` is
    # [2,G,Kc,3] per-tile candidate triples (bin_faces_to_tiles) and the
    # z-buffer becomes a dense per-tile min-reduction — measured ~3x
    # faster than the scatter-min updates at the bench workload.
    if renderer == "gather":
        cand, slots = faces
        d_est, d_gt = jax.vmap(
            lambda v, c, st: render_depth_window_gather(
                v, c, K, origin, window, tile, cand_chunk=_CAND_CHUNK,
                slot_tile=st)
        )(jnp.stack([v_est, v_gt]), cand, slots)
    else:
        d_est, d_gt = jax.vmap(
            lambda v, f: render_depth_window(v, f, K, origin, window,
                                             tile, face_chunk=_FACE_CHUNK)
        )(jnp.stack([v_est, v_gt]), faces)

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
    "window", "tile", "n_taus", "cost_type", "normalized_by_diameter",
    "renderer"))
def _vsd_core_batch(verts, faces, R_est, t_est, R_gt, t_gt, K, origin,
                    depth_wins, im_hw, taus, delta, diameter,
                    window=(256, 256), tile=16, n_taus=10,
                    cost_type="step", normalized_by_diameter=True,
                    renderer="scatter"):
    """Batched core: vmap over (poses, faces, origin, depth window) with
    the mesh verts/K/taus shared — one compile per (window, tile, face
    bucket) serves every frame group of every object, and the per-frame
    renders batch into a single dispatch instead of one launch per
    frame.  `faces` is [B, 2, Fb, 3] (scatter: per-frame, per-render
    culled face lists) or a ([B, 2, S, cap, 3], [B, 2, S]) slot-row
    candidate table + slot->tile map (gather; bin_faces_to_slots)."""

    def one(f, R_e, t_e, R_g, t_g, o, d):
        return _vsd_one(verts, f, R_e, t_e, R_g, t_g, K, o, d,
                        im_hw, taus, delta, diameter, window=window,
                        tile=tile, n_taus=n_taus, cost_type=cost_type,
                        normalized_by_diameter=normalized_by_diameter,
                        renderer=renderer)

    return jax.vmap(one)(faces, R_est, t_est, R_gt, t_gt, origin,
                         depth_wins)


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
            tile=32, renderer="gather") -> np.ndarray:
    """VSD errors, one per tau (pose_error.py:22-129 semantics).

    Args:
      R_est/t_est/R_gt/t_gt: poses (metres).
      depth_test: [H, W] metric test depth (0 = missing).
      K: [3, 3] intrinsics.
      verts/faces: render mesh (metres, object frame).  Subdivision to
        the raster-tile bound happens internally (cached per mesh and
        distance bucket) — pass the mesh as loaded.
      tile: raster stamp size.  Subdivided-face count scales with
        (tile/(tile-2))^2, so larger tiles do fewer z-buffer updates;
        32 measured 1.4x faster than 16 on chip with sub-0.005 metric
        drift (FP boundary flips of the step cost), but 64 LOSES (38.5
        vs 31.3 ms/frame on the bench workload, 2026-08-18): the ~6%
        update saving is outweighed by worse stamp utilisation on the
        4x-larger [chunk, 4096] scan rows.  32 is the sweet spot; don't
        retry 64.  Changing tile recompiles and re-subdivides.

    Returns: [len(taus)] float errors in [0, 1].
    """
    job = _prep_job(R_est, t_est, R_gt, t_gt, depth_test, K, verts, tile)
    errs = _run_group(
        [job], np.asarray(verts, np.float32),
        np.asarray(faces, np.int32), diameter, delta, taus, tile,
        cost_type, normalized_by_diameter, renderer=renderer)
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

    # subdivision bound: only vertices in FRONT of the camera constrain
    # the raster tile — faces at z <= eps are culled before
    # rasterization, so a behind-camera estimate (the <5-correspondence
    # failure-sentinel pose at t_z = -1000, eval/pose_fit.py) must not
    # drive z_min to the worst-case bucket (it can blow past
    # subdivide_max_edge's face cap and aborts the whole batch)
    z_all = np.concatenate([(verts @ R_est.T + t_est)[:, 2],
                            (verts @ R_gt.T + t_gt)[:, 2]])
    z_pos = z_all[z_all > 1e-6]
    z_min = float(z_pos.min()) if z_pos.size else 1e3
    return {
        "R_est": R_est, "t_est": t_est, "R_gt": R_gt, "t_gt": t_gt,
        "origin": np.array([ox, oy], np.float32), "win": win,
        "side": side, "zb": _z_bucket(z_min), "z_min": z_min,
        "im_hw": np.array([imh, imw], np.float32), "margin": m,
        "K": Knp,
    }


def _run_group(jobs, verts, faces, diameter, delta, taus, tile,
               cost_type, normalized_by_diameter, renderer="gather",
               fetch=True):
    """Run jobs that share (side, z bucket, K, im_hw) as ONE vmapped
    call.

    fetch=False returns the [n, n_taus] errors as a DEVICE array
    without blocking: the batched caller pipelines host-side prep of
    the next chunk (projection + tile binning, the ~3 ms/frame host
    share) against the device render of this one.

    The batch is padded to a power of two (repeating the last job) so
    remainder groups reuse compiles instead of specialising per size.
    Faces are culled per frame and per render (backfaces on consistently
    wound closed meshes, stamps that miss the window on any mesh).

    renderer="gather" (default): faces are additionally binned to raster
    tiles on the host and the device runs per-tile min-reductions —
    measured ~3x faster than the scatter path's z-buffer updates.
    renderer="scatter": compacted face lists + scatter-min z-buffer
    (the fallback; bit-identical outputs).
    """
    n = len(jobs)
    side = jobs[0]["side"]
    Knp = jobs[0]["K"]
    imh, imw = jobs[0]["im_hw"]
    v_np, f_np, verts_dev, orient = _prepared_mesh(
        verts, faces, Knp, min(j["z_min"] for j in jobs), tile,
        _ray_angle_factor(Knp, (imh, imw), jobs[0]["margin"]))
    nb = 1
    while nb < n:
        nb *= 2
    # host prep (projection + tile binning, the pipelined ~3 ms/frame
    # share) runs only for the n REAL jobs; padding lanes replicate the
    # last job's prepared arrays instead of recomputing them
    proj = [[_project_visible(v_np, f_np, orient, j[f"R_{k}"],
                              j[f"t_{k}"], Knp, j["origin"], side, tile)
             for k in ("est", "gt")] for j in jobs]
    jobs = jobs + [jobs[-1]] * (nb - n)
    if renderer == "gather":
        g = side // tile
        slotted = [[bin_faces_to_slots(p, vis, f_np, side, tile,
                                       _SLOT_CAP)
                    for p, vis in renders] for renders in proj]
        sb = _face_bucket(
            max(max(a[0].shape[0], b[0].shape[0]) for a, b in slotted),
            base=_CAND_BUCKET_MIN)
        lanes = np.zeros((nb, 2, sb, _SLOT_CAP, 3), np.int32)
        slots = np.full((nb, 2, sb), g * g, np.int32)  # pad sentinel
        for i in range(nb):
            for r, (cd, st) in enumerate(slotted[min(i, n - 1)]):
                lanes[i, r, :cd.shape[0]] = cd
                slots[i, r, :st.shape[0]] = st
        lanes = (lanes, slots)
    else:
        vis = [[np.where(v)[0] for _, v in renders] for renders in proj]
        fb = _face_bucket(max(max(len(a), len(b)) for a, b in vis))
        lanes = np.zeros((nb, 2, fb, 3), np.int32)
        for i in range(nb):
            ia, ib = vis[min(i, n - 1)]
            lanes[i, 0, :len(ia)] = f_np[ia]
            lanes[i, 1, :len(ib)] = f_np[ib]
    stack = {k: jnp.asarray(np.stack([j[k] for j in jobs]))
             for k in ("R_est", "t_est", "R_gt", "t_gt", "origin", "win")}
    errs = _vsd_core_batch(
        verts_dev,
        jax.tree_util.tree_map(jnp.asarray, lanes),
        stack["R_est"], stack["t_est"], stack["R_gt"], stack["t_gt"],
        jnp.asarray(Knp), stack["origin"], stack["win"],
        jnp.asarray(jobs[0]["im_hw"]),
        jnp.asarray(list(taus), np.float32),
        jnp.asarray(delta, np.float32),
        jnp.asarray(diameter, np.float32),
        window=(side, side), tile=tile, n_taus=len(taus),
        cost_type=cost_type,
        normalized_by_diameter=normalized_by_diameter,
        renderer=renderer)
    if not fetch:
        return errs[:n]
    return np.asarray(errs)[:n]


def vsd_err_batch(poses, depth_tests, K, verts, faces, diameter,
                  delta=BOP19_DELTA, taus=BOP19_TAUS,
                  normalized_by_diameter=True, cost_type="step",
                  tile=32, group_cap=16, renderer="gather",
                  pipeline_depth=2) -> np.ndarray:
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
      group_cap: max frames per device call (bounds the in-flight
        buffer memory — window floats + candidate lanes — at roughly
        pipeline_depth+1 chunks of group_cap frames each).
      pipeline_depth: device calls left un-fetched while the host preps
        the next chunk.  The per-frame host share (vert projection +
        tile binning, ~3 ms) then overlaps the device render of the
        previous chunk instead of serialising with it; depth 2 is
        enough to keep the device busy.  0 restores the serial
        launch-and-fetch behaviour.  Chip sweep (2026-08-19, 32-frame
        bench workload): cap16/depth2 11.5 ms/frame vs 16.9 serial
        (1.46x); cap8 12.9, cap4 17.1 (dispatch-bound), cap32 18.6 (one
        chunk - nothing to overlap); outputs bit-identical at every
        setting.
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
    pending: list = []    # (device errs [n, n_taus], frame indices)

    def drain(keep):
        while len(pending) > keep:
            errs_dev, sel = pending.pop(0)
            for row, i in zip(np.asarray(errs_dev), sel):
                out[i] = row

    for idxs in groups.values():
        for s in range(0, len(idxs), group_cap):
            sel = idxs[s:s + group_cap]
            errs_dev = _run_group(
                [jobs[i] for i in sel], verts, faces, diameter,
                delta, taus, tile, cost_type, normalized_by_diameter,
                renderer=renderer, fetch=False)
            pending.append((errs_dev, sel))
            drain(pipeline_depth)
    drain(0)
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
