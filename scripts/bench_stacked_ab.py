"""A/B the stacked multimodel infer: per-element mesh re-encode (the
round-4 design) vs precomputed stacked mesh features (round 5) — same
data, same process, back-to-back, so tunnel mood cancels.

Run: ``python scripts/bench_stacked_ab.py [--objects 4] [--batch 16]``.
"""

import argparse
import os.path as osp
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--objects", type=int, default=4)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from gdm_tpu.data.pipeline import assemble_inputs
    from gdm_tpu.eval.multimodel import (
        encode_stacked_mesh_feats,
        make_multi_model_infer,
        make_multi_model_infer_by_class,
        stack_trees,
    )
    from gdm_tpu.models import GeoMatch
    from gdm_tpu.models.geomatch import MeshArrays

    n_obj, batch = args.objects, args.batch
    graph, mesh, data, mesh_fps = bench.build_workload(n_mesh=4096)
    model = GeoMatch()
    small = {k: v[:1] for k, v in data.items()}
    sample_inputs = assemble_inputs(
        jnp.array(small["rgb"]), jnp.array(small["cld_rgb_nrm"]),
        jnp.array(small["choose"]), jnp.array(small["xyz_img"]))
    variables = jax.jit(
        lambda r, inp, m: model.init(r, inp, m, train=False)
    )(jax.random.PRNGKey(0), sample_inputs, mesh)

    rng = np.random.RandomState(5)
    all_vars = [jax.tree_util.tree_map(lambda a, i=i: a + 1e-3 * i,
                                       variables)
                for i in range(n_obj)]
    stacked_vars = stack_trees(all_vars)
    stacked_mesh = MeshArrays(
        *[jnp.stack([jnp.asarray(getattr(mesh, f))] * n_obj)
          for f in ("xyz", "node_x", "neigh_idx", "basis", "slot")],
        sym_idx=None)
    feats = encode_stacked_mesh_feats(model, all_vars, [mesh] * n_obj)

    reps = -(-batch // data["rgb"].shape[0])
    big = {k: np.concatenate([np.asarray(v)] * reps)[:batch]
           for k, v in data.items()}
    inputs = assemble_inputs(
        jnp.asarray(big["rgb"]), jnp.asarray(big["cld_rgb_nrm"]),
        jnp.asarray(big["choose"]), jnp.asarray(big["xyz_img"]))
    cld = jnp.asarray(big["cld_rgb_nrm"][..., :3])
    obj_idx = jnp.asarray(rng.randint(0, n_obj, batch).astype(np.int32))
    det = jnp.ones((batch,), jnp.float32)

    infer_fn = make_multi_model_infer(model, group=16)

    def run(fn, tag, **kw):
        rt = None
        for _ in range(2):
            rt = fn(stacked_vars, stacked_mesh, inputs, cld,
                    obj_idx, det, **kw)
        float(jax.device_get(rt[-1, 0, 0]))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            rt = fn(stacked_vars, stacked_mesh, inputs, cld,
                    obj_idx, det, **kw)
        float(jax.device_get(rt[-1, 0, 0]))
        fps = args.iters * batch / (time.perf_counter() - t0)
        print(f"{tag:28s} {fps:7.1f} fps", flush=True)
        return fps, np.asarray(rt)

    fps_re, rt_re = run(infer_fn, "recompute (r4 design)")
    fps_pre, rt_pre = run(infer_fn, "precomputed feats (r5)",
                          mesh_feats=feats)
    for g in (4, 8):
        byc = make_multi_model_infer_by_class(model, group=g)
        run(byc, f"by-class schedule g={g}", mesh_feats=feats)
    # and back-to-back again to expose drift
    fps_re2, _ = run(infer_fn, "recompute again")
    fps_pre2, _ = run(infer_fn, "precomputed again", mesh_feats=feats)
    print(f"speedup {max(fps_pre, fps_pre2) / max(fps_re, fps_re2):.2f}x; "
          f"max pose delta {np.abs(rt_pre - rt_re).max():.2e}")


if __name__ == "__main__":
    main()
