"""Isolate the scatter-min cost in render_depth_window.

Times the real renderer against the same program with the z-buffer
scatter replaced by a dense chunk reduce (all stamp compute kept, no
scatter — NOT a correct z-buffer, purely a cost bound).  The gap is the
scatter's share; if large, a gather-formulation renderer (bin faces to
raster tiles, min-reduce per tile) is the next lever for VSD.

Run on an idle host (CLAUDE.md: concurrent CPU load corrupts TPU
timings).
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial import ConvexHull

from gdm_tpu.data.synthetic import make_object
from gdm_tpu.ops.render_depth import render_depth_window, subdivide_max_edge


def timeit(fn, fetch, iters=30, warmup=3):
    for _ in range(warmup):
        out = fn()
    float(jax.device_get(fetch(out)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    float(jax.device_get(fetch(out)))
    return (time.perf_counter() - t0) / iters * 1e3


@functools.partial(jax.jit, static_argnames=("window", "tile", "face_chunk"))
def render_noscatter(verts_cam, faces, K, origin, window=(128, 128),
                     tile=32, face_chunk=512):
    """render_depth_window with the scatter swapped for a dense reduce."""
    h, w = window
    s = tile * tile
    eps = 1e-9
    z = verts_cam[:, 2]
    zs = jnp.maximum(z, eps)
    u = verts_cam[:, 0] * K[0, 0] / zs + K[0, 2] - origin[0]
    v = verts_cam[:, 1] * K[1, 1] / zs + K[1, 2] - origin[1]
    pix = jnp.stack([u, v], axis=1)
    p = pix[faces]
    fz = z[faces]
    front = jnp.all(fz > eps, axis=1)
    d01 = p[:, 1] - p[:, 0]
    d02 = p[:, 2] - p[:, 0]
    area = d01[:, 0] * d02[:, 1] - d01[:, 1] * d02[:, 0]
    ok = front & (jnp.abs(area) > eps)
    bb0 = jnp.floor(jnp.min(p, axis=1))
    inv_a = 1.0 / jnp.where(jnp.abs(area) > eps, area, 1.0)
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
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, s), 1)
    dx = (lane % tile).astype(jnp.float32)
    dy = (lane // tile).astype(jnp.float32)
    big = jnp.asarray(jnp.inf, jnp.float32)

    def body(acc, args):
        p, fz, ok, bb0, inv_a = args
        ix = bb0[:, 0:1] + dx
        iy = bb0[:, 1:2] + dy
        sx = ix + 0.5
        sy = iy + 0.5

        def edge(a, b):
            ax, ay = p[:, a, 0:1], p[:, a, 1:2]
            bx, by = p[:, b, 0:1], p[:, b, 1:2]
            return (bx - ax) * (sy - ay) - (by - ay) * (sx - ax)

        b0 = edge(1, 2) * inv_a[:, None]
        b1 = edge(2, 0) * inv_a[:, None]
        b2 = edge(0, 1) * inv_a[:, None]
        inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0)
        invz = (b0 / fz[:, 0:1] + b1 / fz[:, 1:2] + b2 / fz[:, 2:3])
        zpix = 1.0 / jnp.maximum(invz, eps)
        px = ix.astype(jnp.int32)
        py = iy.astype(jnp.int32)
        valid = (inside & ok[:, None] & (px >= 0) & (px < w)
                 & (py >= 0) & (py < h) & (zpix > eps))
        zval = jnp.where(valid, zpix, big)
        return jnp.minimum(acc, jnp.min(zval, axis=0)), None

    acc0 = jnp.full((s,), big, jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, reshaped)
    return acc


def main():
    rng = np.random.RandomState(3)
    mesh_fps = make_object(512, rng, radius=0.05)
    verts = (mesh_fps[:, :3] / 1000.0).astype(np.float32)
    hull = ConvexHull(verts)
    faces = hull.simplices.astype(np.int32)
    verts_s, faces_s = subdivide_max_edge(verts, faces, 0.012)
    print("faces after subdivision:", len(faces_s))
    K = np.array([[572.4, 0, 64], [0, 573.6, 64], [0, 0, 1]], np.float32)
    t = np.array([0, 0, 0.8], np.float32)
    vc = verts_s + t
    dev = jax.devices()[0]
    vc_d = jax.device_put(vc, dev)
    f_d = jax.device_put(faces_s, dev)
    K_d = jax.device_put(K, dev)
    o_d = jax.device_put(np.zeros(2, np.float32), dev)

    t_real = timeit(
        lambda: render_depth_window(vc_d, f_d, K_d, o_d,
                                    window=(128, 128), tile=32,
                                    face_chunk=512),
        lambda o: o[0, 0])
    print(f"render (scatter-min): {t_real:.2f} ms")
    t_nos = timeit(lambda: render_noscatter(vc_d, f_d, K_d, o_d),
                   lambda o: o[0])
    print(f"render (stamps only, dense reduce): {t_nos:.2f} ms")
    print(f"scatter share: {(t_real - t_nos) / t_real * 100:.0f}%")


if __name__ == "__main__":
    main()
