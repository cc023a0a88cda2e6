"""Pose-service latency on the default backend (TPU).

Exports a production-shaped artifact (256 crop, 4096 points, 4096-mesh,
random weights — latency is weight-value independent), serves it over a
live ThreadingHTTPServer, and measures end-to-end request latency
(client encode + HTTP + decode + device compute) and the device-only
``compute_ms`` the server reports, at request batch 1 and the full
compiled batch.

Run: ``python scripts/bench_serve.py [--batch 8] [--reps 50]``.
"""

import argparse
import os.path as osp
import sys
import tempfile
import threading
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--im", type=int, default=256)
    ap.add_argument("--n-sample", type=int, default=4096)
    ap.add_argument("--n-mesh", type=int, default=4096)
    ap.add_argument("--platform", default=None,
                    help="lowering/execution platform (default: the "
                         "default backend); --platform cpu for a "
                         "chip-free shakeout")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gdm_tpu import serve
    from gdm_tpu.data.pipeline import assemble_inputs, finalize_batch
    from gdm_tpu.data.synthetic import make_object
    from gdm_tpu.models import GeoMatch
    from gdm_tpu.models.geomatch import MeshArrays
    from gdm_tpu.models.spline_mesh import build_mesh_graph
    from gdm_tpu.server import PoseService, make_server, request_poses

    if args.platform:
        jax.config.update("jax_default_device",
                          jax.devices(args.platform)[0])

    B, IM, NS, NM = args.batch, args.im, args.n_sample, args.n_mesh
    rng = np.random.RandomState(0)
    K = np.array([[572.4, 0, IM / 2], [0, 573.6, IM / 2], [0, 0, 1]],
                 np.float32)
    mesh_fps = make_object(NM, rng, radius=0.08)
    mesh = MeshArrays.from_graph(build_mesh_graph(mesh_fps, NM))
    model = GeoMatch(positive_r=0.01)

    raw = {
        "rgb_u8": rng.randint(0, 255, (B, IM, IM, 3)).astype(np.uint8),
        "dpt_u16": (4000 + 2000 * rng.rand(B, IM, IM)).astype(np.uint16),
        "dpt_scale": np.full((B,), 10000.0, np.float32),
        "K_crop": np.tile(K, (B, 1, 1)),
        "choose": rng.randint(0, IM * IM, (B, NS)).astype(np.int32),
        "det": np.ones((B,), np.int32),
    }
    fin = finalize_batch({k: jnp.asarray(v) for k, v in raw.items()},
                         fill_depth=False)
    inputs = assemble_inputs(fin["rgb"], fin["cld_rgb_nrm"],
                             fin["choose"], fin["xyz_img"])
    variables = jax.jit(
        lambda r, i, m: model.init(r, i, m, train=False))(
            jax.random.PRNGKey(0), inputs, mesh)
    mesh_feats = model.apply(variables, mesh, train=False,
                             method="encode_mesh")

    platform = args.platform or jax.default_backend()
    out = tempfile.mkdtemp() + "/bench_obj"
    serve.export_serving_artifact(
        out, apply_fn=model.apply, variables=variables, mesh_input=mesh,
        mesh_feats=mesh_feats, mesh_xyz=mesh.xyz,
        raw_spec=serve.raw_input_spec(B, IM, NS, fill_depth=False),
        fill_depth=False, needs_pyramid=True, knn_chunk=1024,
        exact_knn=False, refine=None, icp_reject=0.01,
        platforms=(platform,), meta={"obj_name": "bench"})
    print(f"artifact exported for {platform!r}: {out}", flush=True)

    service = PoseService({"bench": serve.load_artifact(out)})
    service.warmup()
    server = make_server(service, "127.0.0.1", 0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    host, port = server.server_address[:2]
    url = f"http://{host}:{port}"

    try:
        import json

        stats = {}
        for tag, name, req in (("b1", "b=1 (padded)",
                                {k: v[:1] for k, v in raw.items()}),
                               ("full", f"b={B} (full)", raw)):
            request_poses(url, req)                       # warm
            lat, dev = [], []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                _, ms = request_poses(url, req)
                lat.append((time.perf_counter() - t0) * 1e3)
                dev.append(ms)
            lat.sort()
            n = len(lat)
            print(f"{name:14s} e2e p50 {lat[n // 2]:7.2f} ms  "
                  f"p95 {lat[int(n * 0.95)]:7.2f} ms  "
                  f"device-call {np.mean(dev):7.2f} ms", flush=True)
            stats[f"serve_p50_ms_{tag}"] = round(lat[n // 2], 2)
            stats[f"serve_p95_ms_{tag}"] = round(lat[int(n * 0.95)], 2)
        # machine-readable last line: bench.py's serve section parses it
        print(json.dumps(stats), flush=True)
    finally:
        server.shutdown()
        server.server_close()
        t.join(timeout=10)


if __name__ == "__main__":
    main()
