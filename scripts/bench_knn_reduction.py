"""Compare k=16 KNN reduction strategies on the pyramid's hot shape.

The KNN pyramid's dominant cost is the DS0 self-KNN reduction:
[8x4096, 4096] squared distances -> 16 ascending-distance indices per
row.  Current default: ``lax.approx_max_k(recall_target=0.85)``
(~4.7 ms incl. distance, measured 0.95 recall).  Candidate: a two-stage
"block-argmin" reduction — per-row min/argmin over column blocks (k=1
reductions are cheap on the VPU), then an exact top-k over the
n/block block minima.  Loses a true neighbour only when two of the 16
share a block (birthday bound: block 64 -> ~0.89 expected recall on
uniform points, block 32 -> ~0.94).

Run on the chip: ``python scripts/bench_knn_reduction.py``.
Timing per CLAUDE.md: queued jitted reps, one scalar device_get at the
end of warmup AND inside the timed region.
"""

import os.path as osp
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from gdm_tpu.data.synthetic import make_batch, make_object
from gdm_tpu.ops.knn import pairwise_sqdist

B, N, K = 8, 4096, 16


def block_argmin_topk(sqd, k, block):
    """[m, n] sqd -> [m, k] int32, two-stage block-argmin reduction."""
    m, n = sqd.shape
    nb = n // block
    d = sqd.reshape(m, nb, block)
    bmin = jnp.min(d, axis=-1)                    # [m, nb]
    barg = jnp.argmin(d, axis=-1)                 # [m, nb]
    _, bidx = jax.lax.top_k(-bmin, k)             # [m, k] ascending dist
    within = jnp.take_along_axis(barg, bidx, axis=1)
    return (bidx * block + within).astype(jnp.int32)


def variants():
    def with_dist(reduce_fn):
        def f(pts):                                # pts [B, N, 3]
            def one(p):
                d = pairwise_sqdist(p, p)
                return reduce_fn(d)
            return jax.vmap(one)(pts)
        return f

    def approx(rt):
        return lambda d: jax.lax.approx_max_k(-d, K, recall_target=rt)[1]

    out = {
        "exact_topk": with_dist(lambda d: jax.lax.top_k(-d, K)[1]),
        "approx_0.85": with_dist(approx(0.85)),
        "approx_0.90": with_dist(approx(0.90)),
    }
    for blk in (32, 64, 128):
        out[f"block_argmin_{blk}"] = with_dist(
            lambda d, b=blk: block_argmin_topk(d, K, b))
    return out


def recall(idx, exact_idx):
    r = []
    for b in range(idx.shape[0]):
        hits = sum(len(set(idx[b, i].tolist())
                       & set(exact_idx[b, i].tolist()))
                   for i in range(0, idx.shape[1], 64))
        r.append(hits / (K * len(range(0, idx.shape[1], 64))))
    return float(np.mean(r))


def main():
    rng = np.random.RandomState(0)
    mesh_fps = make_object(N, rng, radius=0.08)
    K_cam = np.array([[572.4, 0, 128], [0, 573.6, 128], [0, 0, 1]],
                     np.float32)
    data, _ = make_batch(mesh_fps, B, K_cam, im_size=256, n_sample=N,
                         seed=0)
    pts = jnp.asarray(data["cld_rgb_nrm"][..., :3])   # realistic cloud
    dev = jax.devices()[0]
    pts = jax.device_put(pts, dev)

    fns = {name: jax.jit(fn) for name, fn in variants().items()}
    exact_idx = np.asarray(fns["exact_topk"](pts))

    print(f"shape [{B}x{N}, {N}] k={K} on {dev.platform}")
    for name, fn in fns.items():
        out = fn(pts)
        out.block_until_ready()
        int(jax.device_get(out[0, 0, 0]))             # real fetch
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(pts)
        int(jax.device_get(out[0, 0, 0]))
        dt = (time.perf_counter() - t0) / reps * 1e3
        rec = recall(np.asarray(out), exact_idx)
        print(f"{name:18s} {dt:7.2f} ms  recall {rec:.3f}")


if __name__ == "__main__":
    main()
