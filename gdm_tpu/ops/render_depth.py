"""Device-side depth rendering of triangle meshes (z-buffer rasterizer).

TPU-native replacement for the external ``bop_renderer`` / glumpy OpenGL
renderers the reference binds for the BOP VSD metric
(lib/pysixd/renderer_cpp.py:1-35, renderer.py:94-99, pose_error.py:59-79).
Those render a full depth frame with a C++/GL rasterizer; here the render
is a jitted XLA program:

  * each triangle is rasterized over a fixed ``tile`` x ``tile`` pixel
    block anchored at its screen bbox (fixed shapes — no data-dependent
    loop bounds), with perspective-correct 1/z interpolation;
  * per-pixel z-buffering is a scatter-min (``.at[idx].min``) into a flat
    window buffer, so overlapping triangles resolve exactly like a
    hardware depth test;
  * correctness requires every triangle's screen bbox to fit in ``tile``
    pixels — :func:`subdivide_max_edge` bounds the 3-D edge length per
    mesh ONCE at load time, which bounds the screen size for any pose not
    closer than ``z_min`` (edge_px <= f * max_edge / z_min).

Rendering is window-local: callers pass the window origin in full-image
pixel coordinates and a static window size covering the object's
projection.  Outside the window the model depth is implicitly 0, which the
VSD visibility masks (gdm_tpu/eval/vsd.py) treat as "model not present" —
identical to rendering the full frame.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def subdivide_max_edge(verts: np.ndarray, faces: np.ndarray,
                       max_edge: float,
                       max_faces: int = 4_000_000
                       ) -> tuple[np.ndarray, np.ndarray]:
    """Host-side 4-way loop subdivision until every edge is <= max_edge.

    One-time per-mesh preprocessing (numpy).  Each oversized triangle is
    split at its edge midpoints into 4 triangles; repeats until all edges
    are short enough.  Midpoints are NOT welded across faces — harmless
    for depth rendering (coincident geometry), and it keeps the pass a
    pure per-face map.

    Raises ValueError once the face count would exceed `max_faces`: a
    metre-scale max_edge applied to a millimetre-scale mesh quadruples
    the face count ~10 extra times (4^10x) and looks like a hang —
    fail fast with a units hint instead.

    Returns (verts [V',3] float32, faces [F',3] int32).
    """
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int64)
    for _ in range(32):  # hard stop; each pass halves edge lengths
        tri = verts[faces]                                   # [F,3,3]
        e = np.linalg.norm(tri - np.roll(tri, -1, axis=1), axis=2)
        big = e.max(axis=1) > max_edge
        if not big.any():
            break
        if len(faces) + 3 * int(big.sum()) > max_faces:
            ext = float(np.abs(verts).max())
            raise ValueError(
                f"subdivide_max_edge: face count would exceed "
                f"{max_faces} (now {len(faces)}, max edge "
                f"{e.max():.3g} vs target {max_edge:.3g}). Mesh extent "
                f"is {ext:.3g} — VSD expects metres; a ~1e3 extent "
                f"suggests millimetre vertices (divide by 1000).")
        keep = faces[~big]
        t = tri[big]                                         # [B,3,3]
        m01 = 0.5 * (t[:, 0] + t[:, 1])
        m12 = 0.5 * (t[:, 1] + t[:, 2])
        m20 = 0.5 * (t[:, 2] + t[:, 0])
        base = len(verts)
        newv = np.concatenate([m01, m12, m20], axis=0)
        b = len(t)
        i01 = np.arange(b) + base
        i12 = np.arange(b) + base + b
        i20 = np.arange(b) + base + 2 * b
        v0, v1, v2 = faces[big, 0], faces[big, 1], faces[big, 2]
        newf = np.concatenate([
            np.stack([v0, i01, i20], 1),
            np.stack([i01, v1, i12], 1),
            np.stack([i12, v2, i20], 1),
            np.stack([i01, i12, i20], 1),
        ], axis=0)
        verts = np.concatenate([verts, newv], axis=0).astype(np.float32)
        faces = np.concatenate([keep, newf], axis=0)
    return verts, faces.astype(np.int32)


@functools.partial(jax.jit,
                   static_argnames=("window", "tile", "face_chunk"))
def render_depth_window(
    verts_cam: jax.Array,
    faces: jax.Array,
    K: jax.Array,
    origin: jax.Array,
    window: tuple[int, int] = (256, 256),
    tile: int = 16,
    face_chunk: int = 1024,
) -> jax.Array:
    """Rasterize a camera-frame mesh into a window-local depth image.

    Args:
      verts_cam: [V, 3] metres, camera frame (already R @ x + t).
      faces:     [F, 3] int32 vertex indices; degenerate (zero-area)
                 faces — e.g. all-zero padding rows — are skipped.
      K:         [3, 3] intrinsics of the FULL image.
      origin:    [2] (ox, oy) window origin in full-image pixels.
      window:    static (h, w) of the rendered window.
      tile:      static raster block; every triangle's screen bbox must
                 fit in ``tile`` pixels (see subdivide_max_edge).
      face_chunk: faces rasterized per scan step.  The per-face pixel
                 stamps ([chunk, tile*tile], flat minor axis so the TPU
                 (8,128) layout pads nothing) exist one chunk at a time,
                 which keeps HLO temp memory O(chunk·tile²) instead of
                 O(F·tile²) — vsd's frame-batched renders OOMed on the
                 unchunked form (19.5 GB at 32 frames x 4096 faces from
                 ~20 materialized [B,2,F,16,16] temporaries, each padded
                 4x by the (8,128) tiling of the 16-wide minor dims).

    Returns:
      [h, w] float32 depth (z, metres); 0 where no surface.
    """
    h, w = window
    if faces.shape[0] == 0:                  # empty mesh: no surface
        return jnp.zeros((h, w), jnp.float32)
    s = tile * tile
    eps = 1e-9
    z = verts_cam[:, 2]
    zs = jnp.maximum(z, eps)
    u = verts_cam[:, 0] * K[0, 0] / zs + K[0, 2] - origin[0]
    v = verts_cam[:, 1] * K[1, 1] / zs + K[1, 2] - origin[1]
    pix = jnp.stack([u, v], axis=1)                          # [V,2] window px

    p = pix[faces]                                           # [F,3,2]
    fz = z[faces]                                            # [F,3]
    front = jnp.all(fz > eps, axis=1)

    # signed double area; degenerate or back/front both rasterized (depth
    # test handles orientation), zero-area skipped
    d01 = p[:, 1] - p[:, 0]
    d02 = p[:, 2] - p[:, 0]
    area = d01[:, 0] * d02[:, 1] - d01[:, 1] * d02[:, 0]     # [F]
    ok = front & (jnp.abs(area) > eps)

    # raster anchor: bbox min, snapped to pixel centres
    bb0 = jnp.floor(jnp.min(p, axis=1))                      # [F,2]
    inv_a = 1.0 / jnp.where(jnp.abs(area) > eps, area, 1.0)

    # pad F to a chunk multiple with skipped faces, then chunk
    nf = faces.shape[0]
    chunk = min(face_chunk, nf)
    pad = (-nf) % chunk
    if pad:
        p = jnp.pad(p, ((0, pad), (0, 0), (0, 0)))
        fz = jnp.pad(fz, ((0, pad), (0, 0)), constant_values=1.0)
        ok = jnp.pad(ok, (0, pad))
        bb0 = jnp.pad(bb0, ((0, pad), (0, 0)))
        inv_a = jnp.pad(inv_a, (0, pad), constant_values=1.0)
    nc = (nf + pad) // chunk
    reshaped = tuple(a.reshape((nc, chunk) + a.shape[1:])
                     for a in (p, fz, ok, bb0, inv_a))

    # flat stamp offsets, [1, s] (s = tile*tile lane axis)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    dx = (lane % tile).astype(jnp.float32)
    dy = (lane // tile).astype(jnp.float32)
    big = jnp.asarray(jnp.inf, jnp.float32)

    def body(buf, args):
        p, fz, ok, bb0, inv_a = args                         # [chunk, ...]
        ix = bb0[:, 0:1] + dx                                # [chunk, s] col
        iy = bb0[:, 1:2] + dy                                # [chunk, s] row
        sx = ix + 0.5                                        # pixel centres
        sy = iy + 0.5

        # barycentric via edge functions, normalized by signed area
        def edge(a, b):
            ax, ay = p[:, a, 0:1], p[:, a, 1:2]
            bx, by = p[:, b, 0:1], p[:, b, 1:2]
            return (bx - ax) * (sy - ay) - (by - ay) * (sx - ax)

        b0 = edge(1, 2) * inv_a[:, None]
        b1 = edge(2, 0) * inv_a[:, None]
        b2 = edge(0, 1) * inv_a[:, None]
        inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0)

        # perspective-correct depth: 1/z interpolates linearly in screen
        invz = (b0 / fz[:, 0:1] + b1 / fz[:, 1:2] + b2 / fz[:, 2:3])
        zpix = 1.0 / jnp.maximum(invz, eps)

        px = ix.astype(jnp.int32)
        py = iy.astype(jnp.int32)
        valid = (inside & ok[:, None] & (px >= 0) & (px < w)
                 & (py >= 0) & (py < h) & (zpix > eps))
        flat_idx = jnp.where(valid, py * w + px, h * w)      # h*w = dropped
        zval = jnp.where(valid, zpix, big)
        buf = buf.at[flat_idx.reshape(-1)].min(
            zval.reshape(-1), mode="drop")
        return buf, None

    buf = jnp.full((h * w,), big, jnp.float32)
    buf, _ = jax.lax.scan(body, buf, reshaped)
    depth = buf.reshape(h, w)
    return jnp.where(jnp.isfinite(depth), depth, 0.0)


def _face_tile_pairs(p: np.ndarray, valid: np.ndarray, side: int,
                     tile: int):
    """Shared (tile id, face id) enumeration for both binning layouts.

    Encodes the tile-2px bbox invariant (subdivide_max_edge bound): a
    valid face's bbox fits in tile-2 px, so it overlaps at most 2x2
    grid tiles — enumerated as the bbox-min tile plus optional +1 steps
    in x/y, with keep masks dropping duplicate steps when the bbox
    spans a single tile column/row.  Factored out so a future fix to
    the overlap logic cannot diverge between the dense and slot
    layouts (ADVICE r3).

    Returns:
      (tid_s, fid_s, counts): (tile, face) pairs stable-sorted by tile,
      and per-tile pair counts [g*g]; or None when no face is valid.
    """
    g = side // tile
    assert g * tile == side, (side, tile)
    vi = np.where(valid)[0]
    if len(vi) == 0:
        return None
    pv = p[vi]
    bmin = np.floor(pv.min(axis=1))                       # [f, 2]
    bmax = np.floor(pv.max(axis=1))
    tx0 = np.clip(bmin[:, 0] // tile, 0, g - 1).astype(np.int64)
    tx1 = np.clip(bmax[:, 0] // tile, 0, g - 1).astype(np.int64)
    ty0 = np.clip(bmin[:, 1] // tile, 0, g - 1).astype(np.int64)
    ty1 = np.clip(bmax[:, 1] // tile, 0, g - 1).astype(np.int64)
    pairs_t, pairs_f = [], []
    for dy in (0, 1):
        ty = np.minimum(ty0 + dy, ty1)
        for dx in (0, 1):
            tx = np.minimum(tx0 + dx, tx1)
            keep = np.ones(len(vi), bool)
            if dx:
                keep &= tx1 > tx0
            if dy:
                keep &= ty1 > ty0
            pairs_t.append(ty[keep] * g + tx[keep])
            pairs_f.append(vi[keep])
    tid = np.concatenate(pairs_t)
    fid = np.concatenate(pairs_f)
    counts = np.bincount(tid, minlength=g * g)
    order = np.argsort(tid, kind="stable")
    return tid[order], fid[order], counts


def bin_faces_to_tiles(p: np.ndarray, valid: np.ndarray, faces: np.ndarray,
                       side: int, tile: int,
                       k_pad: int | None = None) -> np.ndarray:
    """Host-side face->raster-tile binning for the gather renderer.

    Args:
      p:     [F, 3, 2] projected window-pixel vertex coords (numpy).
      valid: [F] bool — faces that can contribute (vsd._visible_face_idx
             semantics: in front, non-degenerate, window-intersecting,
             optionally front-facing).
      faces: [F, 3] int32 vertex indices.
      side:  window side (multiple of `tile`).
      tile:  raster tile size; every valid face's bbox must fit in
             tile-2 px (subdivide_max_edge bound) so a face overlaps at
             most 2x2 grid tiles.
      k_pad: pad the per-tile candidate count to this (None = max
             occupancy).  Callers bucket it so compiles are shared.

    Returns:
      [G, k, 3] int32 candidate vertex-index triples per tile (G =
      (side/tile)^2, row-major tiles), zero-padded — an all-zero triple
      is degenerate and skipped by the renderer's area test.
    """
    g = side // tile
    pairs = _face_tile_pairs(p, valid, side, tile)
    if pairs is None:
        return np.zeros((g * g, k_pad or 1, 3), np.int32)
    tid_s, fid_s, counts = pairs
    k = int(counts.max())
    if k_pad is not None:
        assert k_pad >= k, (k_pad, k)
        k = k_pad
    starts = np.zeros(g * g + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    slot = np.arange(len(tid_s)) - starts[tid_s]
    cand = np.zeros((g * g, k, 3), np.int32)
    cand[tid_s, slot] = faces[fid_s]
    return cand


def bin_faces_to_slots(p: np.ndarray, valid: np.ndarray,
                       faces: np.ndarray, side: int, tile: int,
                       k_cap: int) -> tuple[np.ndarray, np.ndarray]:
    """bin_faces_to_tiles with a FIXED per-row capacity: dense tiles
    spill into extra rows ("slots") instead of inflating a global
    max-occupancy pad.

    The dense [G, k_max, 3] layout pays k_max = the WORST tile's
    occupancy for every tile: on dense tiny-face meshes (20k faces,
    1-2 px edges — real BOP complexity) one grazing-view tile can hold
    thousands of candidates while the mean is ~25, and the padded
    candidate table reached ~1.2 GB per 16-frame chunk — upload-bound
    through the axon tunnel's slow, variable H2D path (measured 472 ->
    13 MB/s between consecutive puts, 2026-08-20).  Slot rows bound the
    padding at ~2x total: table bytes follow the REAL candidate count.
    The renderer min-combines rows of the same tile afterwards
    (order-free f32 min — bit-identical to the dense layout).

    Returns:
      (cand [S, k_cap, 3] int32 zero-padded, slot_tile [S] int32 —
       row-major tile id of each slot row).  S = sum over non-empty
      tiles of ceil(occupancy / k_cap); 1 all-zero slot for an empty
      window.
    """
    g = side // tile
    pairs = _face_tile_pairs(p, valid, side, tile)
    if pairs is None:
        return (np.zeros((1, k_cap, 3), np.int32),
                np.zeros((1,), np.int32))
    tid_s, fid_s, counts = pairs
    starts = np.zeros(g * g + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    within = np.arange(len(tid_s)) - starts[tid_s]       # pos in tile
    rows_per_tile = -(-counts // k_cap)                  # ceil
    row_starts = np.zeros(g * g + 1, np.int64)
    np.cumsum(rows_per_tile, out=row_starts[1:])
    S = int(row_starts[-1])
    slot = row_starts[tid_s] + within // k_cap
    col = within % k_cap
    cand = np.zeros((S, k_cap, 3), np.int32)
    cand[slot, col] = faces[fid_s]
    slot_tile = np.repeat(np.arange(g * g, dtype=np.int32),
                          rows_per_tile)
    return cand, slot_tile


@functools.partial(jax.jit,
                   static_argnames=("window", "tile", "cand_chunk"))
def render_depth_window_gather(
    verts_cam: jax.Array,
    cand: jax.Array,
    K: jax.Array,
    origin: jax.Array,
    window: tuple[int, int] = (256, 256),
    tile: int = 32,
    cand_chunk: int = 256,
    slot_tile: jax.Array | None = None,
) -> jax.Array:
    """Gather-formulation depth rasterizer: per-tile min-reduction.

    Same math as :func:`render_depth_window` but turned inside out: the
    host bins faces to the raster tiles their bbox overlaps
    (:func:`bin_faces_to_tiles` / :func:`bin_faces_to_slots`), and each
    tile min-REDUCES the depth of
    its candidate faces over its tile x tile pixels — a dense
    vectorizable reduction with no scatter.  The scatter-min z-buffer
    update is the dominant cost of the scatter form (~10 ns/update on
    v5e); here the same pixel coverage is a VPU-bound elementwise
    pipeline.  Bit-identical to the scatter renderer given candidates
    that cover every (face, tile) its stamp touches: per pixel the same
    (face, z) set competes and f32 min is order-independent.

    Args:
      verts_cam: [V, 3] camera-frame vertices (metres).
      cand: [G, k, 3] int32 per-tile candidate vertex triples
        (bin_faces_to_tiles output; all-zero rows are skipped), OR —
        with `slot_tile` — [S, k, 3] slot rows (bin_faces_to_slots).
      K / origin / window / tile: as in render_depth_window; window
        sides must be multiples of `tile`.
      cand_chunk: memory knob.  Dense layout: candidates reduced per
        scan step (live temp [G, chunk, tile^2]).  Slot layout: sets
        the row-block size rc = 64*cand_chunk/k_cap so the live temp
        is [rc, k_cap, tile^2] (~64 MB f32 at the defaults),
        independent of the total slot-row count S.
      slot_tile: optional [S] int32 tile id per candidate row
        (bin_faces_to_slots layout: fixed row capacity, dense tiles
        span several rows).  Rows of the same tile min-combine via a
        cheap S-row scatter-min; rows with slot_tile == G (the
        caller's padding sentinel) are dropped.  This layout keeps the
        uploaded table proportional to the REAL candidate count
        instead of tiles x worst-tile occupancy — the dense layout's
        table reached ~1.2 GB/chunk on 20k-face meshes and was
        upload-bound through the tunnel.

    Returns: [h, w] float32 depth; 0 where no surface.
    """
    h, w = window
    gx, gy = w // tile, h // tile
    G = gx * gy
    s = tile * tile
    eps = 1e-9
    z = verts_cam[:, 2]
    zs = jnp.maximum(z, eps)
    u = verts_cam[:, 0] * K[0, 0] / zs + K[0, 2] - origin[0]
    v = verts_cam[:, 1] * K[1, 1] / zs + K[1, 2] - origin[1]
    pix = jnp.stack([u, v], axis=1)                       # [V, 2]

    rows = cand.shape[0]
    kc = cand.shape[1]
    big = jnp.asarray(jnp.inf, jnp.float32)

    def tri_min(cand_c, sxp, syp):
        """Min candidate depth per (row, pixel): cand_c [R, k, 3] +
        pixel centres sxp/syp [R, s] -> [R, s]."""
        p = pix[cand_c]                                   # [R, k, 3, 2]
        fz = z[cand_c]                                    # [R, k, 3]
        front = jnp.all(fz > eps, axis=-1)
        d01 = p[:, :, 1] - p[:, :, 0]
        d02 = p[:, :, 2] - p[:, :, 0]
        area = d01[..., 0] * d02[..., 1] - d01[..., 1] * d02[..., 0]
        ok = front & (jnp.abs(area) > eps)                # [R, k]
        inv_a = 1.0 / jnp.where(jnp.abs(area) > eps, area, 1.0)

        def edge(a, b):
            ax, ay = p[:, :, a, 0:1], p[:, :, a, 1:2]
            bx, by = p[:, :, b, 0:1], p[:, :, b, 1:2]
            return ((bx - ax) * (syp[:, None, :] - ay)
                    - (by - ay) * (sxp[:, None, :] - ax))

        b0 = edge(1, 2) * inv_a[..., None]                # [R, k, s]
        b1 = edge(2, 0) * inv_a[..., None]
        b2 = edge(0, 1) * inv_a[..., None]
        inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0)
        invz = (b0 / fz[..., 0:1] + b1 / fz[..., 1:2]
                + b2 / fz[..., 2:3])
        zpix = 1.0 / jnp.maximum(invz, eps)
        valid = inside & ok[..., None] & (zpix > eps)
        return jnp.min(jnp.where(valid, zpix, big), axis=1)

    def row_coords(tg):
        """Pixel-centre window coords for per-row tile ids [R, s]."""
        lane = jax.lax.broadcasted_iota(jnp.int32, tg.shape, 1)
        sx = ((tg % gx) * tile + lane % tile).astype(jnp.float32) + 0.5
        sy = ((tg // gx) * tile + lane // tile).astype(jnp.float32) + 0.5
        return sx, sy

    if slot_tile is None:
        # dense layout: rows == G is fixed but per-tile k can be huge ->
        # scanning k-axis chunks bounds the live temp to [G, chunk, s]
        chunk = min(cand_chunk, kc)
        pad = (-kc) % chunk
        if pad:
            cand = jnp.pad(cand, ((0, 0), (0, pad), (0, 0)))
        nc = (kc + pad) // chunk
        cand = cand.reshape(rows, nc, chunk, 3).transpose(1, 0, 2, 3)
        tg = jax.lax.broadcasted_iota(jnp.int32, (rows, s), 0)
        sx, sy = row_coords(tg)
        acc0 = jnp.full((rows, s), big, jnp.float32)
        acc, _ = jax.lax.scan(
            lambda a, c: (jnp.minimum(a, tri_min(c, sx, sy)), None),
            acc0, cand)
    else:
        # slot layout: per-row k == k_cap is SMALL, but the row count S
        # grows with the total candidate count — a k-axis scan would be
        # one unbounded [S, k_cap, s] step (ADVICE r3).  Map over ROW
        # blocks instead: live temp [rc, k_cap, s], independent of S.
        # rc sized so rc * k_cap ~ 64 * cand_chunk (64 MB f32 at the
        # defaults) whatever k_cap the caller picked.
        rc = min(rows, max(1, (cand_chunk * 64) // kc))
        rpad = (-rows) % rc
        if rpad:
            # padding rows carry the G sentinel: the combine scatter
            # below routes them to the dropped extra row
            cand = jnp.pad(cand, ((0, rpad), (0, 0), (0, 0)))
            slot_tile = jnp.pad(slot_tile, (0, rpad),
                                constant_values=G)
        rows_p = rows + rpad
        tg = jnp.broadcast_to(slot_tile[:, None], (rows_p, s))
        sx, sy = row_coords(tg)
        nb = rows_p // rc
        acc = jax.lax.map(
            lambda b: tri_min(*b),
            (cand.reshape(nb, rc, kc, 3),
             sx.reshape(nb, rc, s), sy.reshape(nb, rc, s))
        ).reshape(rows_p, s)
    if slot_tile is not None:
        # min-combine slot rows of the same tile: an S-row scatter-min
        # of s-wide rows (a few thousand updates — negligible next to
        # the reduction above); sentinel rows land in the extra row G
        acc = jnp.full((G + 1, s), big, jnp.float32) \
            .at[slot_tile].min(acc)[:G]
    depth = acc.reshape(gy, gx, tile, tile).transpose(0, 2, 1, 3)
    depth = depth.reshape(h, w)
    return jnp.where(jnp.isfinite(depth), depth, 0.0)
