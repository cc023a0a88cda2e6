"""Train-to-pose demonstration on synthetic data (no real datasets needed).

Trains the flagship GeoMatch on rendered frames of one synthetic object and
reports ADD / rotation / translation errors of the *trained network's*
matches versus the untrained network — an end-to-end correctness proof of
the full learning loop (loss -> descriptors -> correspondences -> Kabsch)
that runs anywhere, including this repo's single tunneled TPU chip.

    python scripts/train_synthetic_demo.py [--steps 300] [--batch 8]
        [--backbone randla|dgcnn] [--bf16]

--backbone dgcnn trains the DGCNN variant (approx edge-conv graphs, the
pipeline default); --bf16 sets model.compute_dtype=bfloat16 — together
they validate convergence of the fastest training config (241 sps at
production shapes, scripts/bench_dgcnn.py --train --bf16).
"""

import argparse
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--im", type=int, default=128)
    ap.add_argument("--n-sample", type=int, default=1024)
    ap.add_argument("--n-mesh", type=int, default=512)
    ap.add_argument("--n-train-frames", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--backbone", choices=("randla", "dgcnn"),
                    default="randla")
    ap.add_argument("--bf16", action="store_true",
                    help="model.compute_dtype=bfloat16")
    ap.add_argument("--hpr-param", type=float, default=2.0,
                    help="HPR flip exponent for GT visibility "
                         "(data.hpr_radius_param analogue; pi = the "
                         "reference's value — docs/CONVERGENCE.md A/B)")
    ap.add_argument("--exact-knn", action="store_true",
                    help="dgcnn only: exact top_k edge-conv graphs (the "
                         "reference's behaviour, models/dgcnn.py:21-27) "
                         "instead of the pipeline-default approx_max_k")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gdm_tpu.data.pipeline import assemble_inputs
    from gdm_tpu.data.synthetic import make_batch, make_object
    from gdm_tpu.eval.metrics import add_err, re_err, te_err
    from gdm_tpu.eval.pose_fit import fit_poses_from_outputs
    from gdm_tpu.models import GeoMatch
    from gdm_tpu.models.geomatch import MeshArrays
    from gdm_tpu.models.spline_mesh import build_mesh_graph
    from gdm_tpu.train import (
        bn_momentum_schedule,
        create_train_state,
        cyclic_lr,
        make_train_step,
    )

    print(f"backend: {jax.default_backend()}")
    K = np.array([[280.0, 0, args.im / 2], [0, 280.0, args.im / 2],
                  [0, 0, 1]], np.float32)
    rng = np.random.RandomState(args.seed)
    mesh_fps = make_object(args.n_mesh, rng, radius=0.06)

    print(f"rendering {args.n_train_frames} train + {args.batch} "
          f"test frames ...")
    train_data, _ = make_batch(
        mesh_fps, args.n_train_frames, K, im_size=args.im,
        n_sample=args.n_sample, seed=args.seed,
        hpr_radius_param=args.hpr_param)
    test_data, test_poses = make_batch(
        mesh_fps, args.batch, K, im_size=args.im,
        n_sample=args.n_sample, seed=args.seed + 999,
        hpr_radius_param=args.hpr_param)

    compute_dtype = jnp.bfloat16 if args.bf16 else jnp.float32

    if args.backbone == "dgcnn":
        from gdm_tpu.models.geomatch_dgcnn import GeoMatchDGCNN
        from gdm_tpu.models.spline_mesh import IMAGENET_MEAN, IMAGENET_STD

        pts_m = mesh_fps[:, :3] / 1000.0
        rgb_n = (mesh_fps[:, 3:6] / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        mesh_in = jnp.asarray(np.concatenate(
            [pts_m, rgb_n, mesh_fps[:, 6:9]], axis=1).astype(np.float32))
        mesh_xyz = mesh_in[:, :3]
        model = GeoMatchDGCNN(approx_knn=not args.exact_knn,
                              compute_dtype=compute_dtype)

        def inputs_of(d, sl=np.s_[:]):
            # no pyramid: the DGCNN variant builds its edge-conv graphs
            # inside the forward (bench.py measure_dgcnn_train layout)
            return {k: jnp.asarray(d[k][sl]) for k in (
                "cld_rgb_nrm", "labels", "origin_labels", "match_idx",
                "visible_flag", "RT")}
    else:
        # only the randla path needs the KNN-pyramid MeshArrays; the
        # dgcnn path builds edge-conv graphs on device (ADVICE r2)
        mesh = MeshArrays.from_graph(build_mesh_graph(mesh_fps, args.n_mesh))
        mesh_in, mesh_xyz = mesh, mesh.xyz

        def inputs_of(d, sl=np.s_[:]):
            return assemble_inputs(
                jnp.asarray(d["rgb"][sl]),
                jnp.asarray(d["cld_rgb_nrm"][sl]),
                jnp.asarray(d["choose"][sl]),
                jnp.asarray(d["xyz_img"][sl]),
                labels=jnp.asarray(d["labels"][sl]),
                match_idx=jnp.asarray(d["match_idx"][sl]),
                visible_flag=jnp.asarray(d["visible_flag"][sl]),
                RT=jnp.asarray(d["RT"][sl]), knn_chunk=256)

        model = GeoMatch(positive_r=0.008, compute_dtype=compute_dtype)
    sample = inputs_of(train_data, np.s_[:args.batch])
    state = create_train_state(
        model, jax.random.PRNGKey(args.seed), sample, mesh_in,
        cyclic_lr(1e-5, 1e-3, max(args.steps // 6, 1)))
    step = make_train_step(bn_momentum_schedule(batch_size=args.batch),
                           build_pyramid_in_step=False)
    rng_j = jax.random.PRNGKey(args.seed + 7)

    def evaluate(st, tag):
        test_inputs = inputs_of(test_data)
        out = st.apply_fn(
            {"params": st.params, "batch_stats": st.batch_stats},
            test_inputs, mesh_in, train=False)
        poses = np.asarray(fit_poses_from_outputs(
            jnp.asarray(test_data["cld_rgb_nrm"][..., :3]), out, mesh_xyz))
        ads, res, tes = [], [], []
        mesh_pts = mesh_fps[:, :3] / 1000.0
        for b in range(args.batch):
            ads.append(add_err(poses[b, :, :3], poses[b, :, 3],
                               test_poses[b, :, :3], test_poses[b, :, 3],
                               mesh_pts))
            res.append(re_err(poses[b, :, :3], test_poses[b, :, :3]))
            tes.append(te_err(poses[b, :, 3], test_poses[b, :, 3]))
        print(f"[{tag}] ADD {np.mean(ads) * 1000:7.2f} mm | "
              f"rot {np.mean(res):7.2f} deg | t {np.mean(tes) * 1000:6.2f} mm")
        return float(np.mean(ads))

    add_before = evaluate(state, "untrained")

    n_batches = args.n_train_frames // args.batch
    batches = [inputs_of(train_data,
                         np.s_[i * args.batch:(i + 1) * args.batch])
               for i in range(n_batches)]
    t0 = time.perf_counter()
    for it in range(args.steps):
        state, metrics = step(state, batches[it % n_batches], mesh_in,
                              rng_j)
        if it % 50 == 0 or it == args.steps - 1:
            m = jax.device_get(metrics)
            print(f"step {it:4d}  loss {m['loss']:8.4f}  "
                  f"seg {m['seg_loss']:7.4f}  match {m['match_loss']:8.4f}"
                  f"  ({time.perf_counter() - t0:5.1f}s)")
    add_after = evaluate(state, "trained  ")

    improved = add_after < 0.5 * add_before
    print(f"ADD {add_before * 1000:.2f} -> {add_after * 1000:.2f} mm "
          f"({'OK: >=2x better' if improved else 'NO IMPROVEMENT'})")
    return 0 if improved else 1


if __name__ == "__main__":
    raise SystemExit(main())
