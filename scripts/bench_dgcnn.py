"""DGCNN GeoMatch variant (config 5) inference fps on the default backend.

The flagship bench (bench.py) measures the RandLA+SplineCNN model; this
measures the backbone-swap variant (`--opt model.backbone=dgcnn`,
reference models/geoMatch_DGCNN.py) at the same production shapes:
256x256 crop, 4096 scene points, 4096-node mesh, batch 8.  The DGCNN
path needs no KNN index pyramid (both branches build their edge-conv
graphs on device), so inference is finalize + one forward+fit program.

Timing follows the CLAUDE.md tunnel protocol: the warmup and the timed
loop each end with a scalar jax.device_get of the LAST result.

Run: ``python scripts/bench_dgcnn.py [--batch 8] [--iters 15]``.
"""

import argparse
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def train_bench(args, batch=24, steps=10, warmup=2):
    """b=24 DGCNN train step (forward+loss+backward+Adam in one jit),
    mirroring bench.py measure_train and the cli train path for the
    dgcnn backbone (inputs pre-assembled, build_pyramid_in_step=False)."""
    import jax
    import jax.numpy as jnp

    from gdm_tpu.data.synthetic import make_batch, make_object
    from gdm_tpu.models.geomatch_dgcnn import GeoMatchDGCNN
    from gdm_tpu.models.spline_mesh import IMAGENET_MEAN, IMAGENET_STD
    from gdm_tpu.train import (
        bn_momentum_schedule,
        create_train_state,
        cyclic_lr,
        make_train_step,
    )

    IM, NS, NM = args.im, args.n_sample, args.n_mesh
    rng = np.random.RandomState(0)
    K = np.array([[572.4, 0, IM / 2], [0, 573.6, IM / 2], [0, 0, 1]],
                 np.float32)
    mesh_fps = make_object(NM, rng, radius=0.08)
    pts_m = mesh_fps[:, :3] / 1000.0
    rgb_n = (mesh_fps[:, 3:6] / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    mesh_x = jnp.asarray(np.concatenate(
        [pts_m, rgb_n, mesh_fps[:, 6:9]], axis=1).astype(np.float32))
    data, _ = make_batch(mesh_fps, batch, K, im_size=IM, n_sample=NS,
                         seed=7)
    inputs = {k: jnp.asarray(data[k]) for k in (
        "cld_rgb_nrm", "labels", "origin_labels", "match_idx",
        "visible_flag", "RT")}

    model = GeoMatchDGCNN(approx_knn=not args.exact,
                          compute_dtype=jnp.bfloat16 if args.bf16
                          else jnp.float32)
    state = create_train_state(
        model, jax.random.PRNGKey(0), inputs, mesh_x,
        cyclic_lr(1e-5, 1e-3, 100))
    step = make_train_step(bn_momentum_schedule(batch_size=batch),
                           build_pyramid_in_step=False)
    key = jax.random.PRNGKey(3)
    print("train compile...", flush=True)
    for _ in range(warmup):
        state, metrics = step(state, inputs, mesh_x, key)
    float(jax.device_get(metrics["loss"]))       # real fetch (CLAUDE.md)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, inputs, mesh_x, key)
    float(jax.device_get(metrics["loss"]))
    dt = (time.perf_counter() - t0) / steps
    mode = "exact" if args.exact else "approx"
    if args.bf16:
        mode += " bf16"
    print(f"dgcnn train b={batch} ({mode} knn): {dt * 1e3:.1f} ms/step "
          f"= {batch / dt:.1f} samples/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--im", type=int, default=256)
    ap.add_argument("--n-sample", type=int, default=4096)
    ap.add_argument("--n-mesh", type=int, default=4096)
    ap.add_argument("--exact", action="store_true",
                    help="exact top_k edge-conv graphs "
                         "(model.dgcnn_exact_knn parity mode)")
    ap.add_argument("--train", action="store_true",
                    help="measure the b=24 fused train step instead "
                         "(samples/sec, like bench.py's flagship number)")
    ap.add_argument("--bf16", action="store_true",
                    help="model.compute_dtype=bfloat16 (trunk activations"
                         " narrow; KNN coords, heads, params stay f32)")
    args = ap.parse_args()
    if args.train:
        return train_bench(args)

    import jax
    import jax.numpy as jnp

    from gdm_tpu.data.synthetic import make_batch, make_object
    from gdm_tpu.eval.infer import run_inference
    from gdm_tpu.models.geomatch_dgcnn import GeoMatchDGCNN
    from gdm_tpu.models.spline_mesh import IMAGENET_MEAN, IMAGENET_STD

    B, IM, NS, NM = args.batch, args.im, args.n_sample, args.n_mesh
    rng = np.random.RandomState(0)
    K = np.array([[572.4, 0, IM / 2], [0, 573.6, IM / 2], [0, 0, 1]],
                 np.float32)
    mesh_fps = make_object(NM, rng, radius=0.08)   # [M, 9] mm|rgb|nrm
    pts_m = mesh_fps[:, :3] / 1000.0
    rgb_n = (mesh_fps[:, 3:6] / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    mesh_x = jnp.asarray(np.concatenate(
        [pts_m, rgb_n, mesh_fps[:, 6:9]], axis=1).astype(np.float32))
    mesh_xyz = jnp.asarray(pts_m.astype(np.float32))
    data, _ = make_batch(mesh_fps, B, K, im_size=IM, n_sample=NS, seed=0)
    fin = {k: jnp.asarray(data[k])
           for k in ("rgb", "cld_rgb_nrm", "choose", "xyz_img")}

    model = GeoMatchDGCNN(approx_knn=not args.exact,
                          compute_dtype=jnp.bfloat16 if args.bf16
                          else jnp.float32)
    print("init...", flush=True)
    variables = jax.jit(lambda r: model.init(
        r, {"cld_rgb_nrm": fin["cld_rgb_nrm"]}, mesh_x,
        train=False))(jax.random.PRNGKey(0))
    print("encode_mesh...", flush=True)
    mesh_feats = jax.jit(lambda m: model.apply(
        variables, m, train=False, method="encode_mesh"))(mesh_x)
    print("step compile...", flush=True)

    step = jax.jit(lambda f, mx, mf, xyz: run_inference(
        model.apply, variables, f, mx, mf, xyz, 0.01,
        needs_pyramid=False, knn_chunk=1024, exact_knn=False,
        refine=None))

    t0 = time.perf_counter()
    out = step(fin, mesh_x, mesh_feats, mesh_xyz)
    float(jax.device_get(out[0, 0, 0]))
    print(f"compile+first: {time.perf_counter() - t0:.1f} s "
          f"on {jax.devices()[0]}", flush=True)
    for _ in range(args.warmup):
        out = step(fin, mesh_x, mesh_feats, mesh_xyz)
    float(jax.device_get(out[0, 0, 0]))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = step(fin, mesh_x, mesh_feats, mesh_xyz)
    float(jax.device_get(out[0, 0, 0]))
    dt = (time.perf_counter() - t0) / args.iters
    mode = "exact" if args.exact else "approx"
    if args.bf16:
        mode += " bf16"
    print(f"dgcnn b={B} ({mode} knn): {dt * 1e3:.2f} ms/batch "
          f"= {B / dt:.1f} fps")


if __name__ == "__main__":
    main()
