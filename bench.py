"""Headline benchmark: RGB-D pose-estimation frames/sec/chip.

Measures the full YCB-V-shaped inference path on the default backend
(TPU): on-device KNN pyramid build + GeoMatch forward (FFB6D + SplineCNN)
+ dense similarity matching + masked Kabsch pose fit, at the reference's
production shapes (256x256 crop, 4096 scene points, 4096-vertex mesh,
eval config ycbv_cfg.py).

vs_baseline: ratio against the ACTUAL reference torch model executed on
CPU (`reference_torch_cpu_fps`): the reference GeoMatch (train_lm.py
eval path) with its compiled extensions stubbed and the SplineCNN mesh
branch replaced by precomputed mesh features — the same mesh-feature
caching our pipeline uses, and the reference's CPU KNN-pyramid
dataloader cost is excluded from its timing, so the comparison favours
the reference.  If /root/reference is absent the denominator falls back
to this framework's own CPU execution (reported as baseline_kind).

Timing protocol: every timed loop ends with a small jax.device_get of
the final output INSIDE the timed region — through the axon tunnel
block_until_ready alone has returned before execution finished
(CLAUDE.md), while a data fetch cannot.  TPU programs execute in order,
so fetching one scalar of the last enqueued result proves the whole
queue ran without serialising the pipeline.

Also measures the b=24 training step (samples/sec, f32 and bf16) so
training throughput is driver-visible, not prose-only.  Set
GDM_BENCH_TRAIN=0 to skip (two extra compiles).  `fps_bf16` reports the
bfloat16-activation eval forward (the `--opt model.compute_dtype`
option; ~4% faster, identical synthetic convergence) — GDM_BENCH_BF16=0
skips it.  `dgcnn_fps` is the DGCNN backbone variant (config 5) at the
same shapes — GDM_BENCH_DGCNN=0 skips it.

Prints exactly one JSON line.
"""

import json
import os
import os.path as osp
import sys
import threading
import time

import numpy as np

REPO = osp.dirname(osp.abspath(__file__))

_PRINTED = threading.Event()


def _emit(result):
    """Print the one JSON line exactly once (main path or watchdog)."""
    if not _PRINTED.is_set():
        _PRINTED.set()
        print(json.dumps(result), flush=True)


def _start_watchdog(result):
    """The tunneled chip occasionally WEDGES (CLAUDE.md): a jax call then
    blocks forever in C, beyond any Python signal.  A daemon timer prints
    whatever `result` holds so far and hard-exits, so the driver always
    gets a JSON line.  GDM_BENCH_DEADLINE_S=0 disables (default 2700 s;
    a clean full run is ~25 min incl. ~8 first-compiles)."""
    deadline = float(os.environ.get("GDM_BENCH_DEADLINE_S", "2700"))
    if deadline <= 0:
        return None

    def fire():
        result["partial"] = True
        result["error"] = (f"bench deadline {deadline:.0f}s hit "
                           "(wedged chip?); metrics so far only")
        _emit(result)
        os._exit(2)

    t = threading.Timer(deadline, fire)
    t.daemon = True
    t.start()
    return t


def build_workload(im=256, n_sample=4096, n_mesh=4096, batch=8, seed=0):
    from gdm_tpu.data.synthetic import make_batch, make_object
    from gdm_tpu.models.geomatch import MeshArrays
    from gdm_tpu.models.spline_mesh import build_mesh_graph

    K = np.array([[572.4, 0, im / 2], [0, 573.6, im / 2], [0, 0, 1]],
                 np.float32)
    rng = np.random.RandomState(seed)
    mesh_fps = make_object(n_mesh, rng, radius=0.08)
    graph = build_mesh_graph(mesh_fps, n_mesh)
    data, _ = make_batch(mesh_fps, batch, K, im_size=im,
                         n_sample=n_sample, seed=seed)
    return graph, MeshArrays.from_graph(graph), data, mesh_fps


def make_pipeline(model, variables, mesh_xyz):
    """Staged inference: preprocess, forward, pose fit as separate jits.

    Staging lets successive batches pipeline through the device queue and
    keeps each XLA program small enough to schedule well (one monolithic
    program measured ~3x slower end to end on the axon chip).  The
    batch-independent SplineCNN mesh features are computed once and
    closed over — the per-batch program runs only the scene branch.
    """
    import jax

    from gdm_tpu.data.pipeline import assemble_inputs
    from gdm_tpu.eval.pose_fit import fit_poses_from_outputs

    asm = jax.jit(lambda b: assemble_inputs(
        b["rgb"], b["cld_rgb_nrm"], b["choose"], b["xyz_img"]))
    fwd = jax.jit(lambda inp, mesh, mf: model.apply(
        variables, inp, mesh, train=False, mesh_features=mf))
    fit = jax.jit(lambda c, o, x: fit_poses_from_outputs(c, o, x))

    encode_mesh = jax.jit(lambda mesh: model.apply(
        variables, mesh, train=False, method="encode_mesh"))
    cache = {}

    def infer(batch, mesh):
        key = id(mesh)
        if key not in cache:
            cache[key] = encode_mesh(mesh)
        inputs = asm(batch)
        out = fwd(inputs, mesh, cache[key])
        return fit(batch["cld_rgb_nrm"][..., :3], out, mesh_xyz)

    return infer


def run_on(device, batch_np, mesh, model, variables, mesh_xyz,
           iters, warmup=1):
    import jax

    with jax.default_device(device):
        batch = {k: jax.device_put(np.asarray(v), device)
                 for k, v in batch_np.items()}
        mesh_dev = jax.tree_util.tree_map(
            lambda x: jax.device_put(np.asarray(x), device), mesh)
        pipe = make_pipeline(model, variables, mesh_dev.xyz)
        for _ in range(warmup):
            out = pipe(batch, mesh_dev)
        # warmup must END with a real data fetch: through the tunnel
        # block_until_ready can return before execution, and the first
        # fetch in the timed region would then absorb the warmup's
        # still-pending work (measured: 142 vs 235 fps on rep 0)
        float(jax.device_get(out[0, 0, 0]))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = pipe(batch, mesh_dev)
        # forces execution of the whole in-order queue (see module
        # docstring) — one scalar, so the transfer cost is negligible
        float(jax.device_get(out[0, 0, 0]))
        dt = (time.perf_counter() - t0) / iters
    return batch_np["rgb"].shape[0] / dt


def _kabsch_np(A, B):
    """Reference best_fit_transform (pvn3d_eval_utils_kpls.py:43-76):
    plain-numpy Kabsch, used only to time the reference CPU path."""
    ca, cb = A.mean(0), B.mean(0)
    H = (A - ca).T @ (B - cb)
    U, _, Vt = np.linalg.svd(H)
    R = Vt.T @ U.T
    if np.linalg.det(R) < 0:
        Vt[2] *= -1
        R = Vt.T @ U.T
    return R, cb - R @ ca


def measure_reference_torch_cpu(d1, inp, n_mesh, iters=3):
    """fps of the ACTUAL reference torch model on CPU, or None.

    Runs the reference GeoMatch (models/geoMatch.py:159-200) in eval
    mode at b=1 production shapes: FFB6D dual-branch forward + heads +
    the cal_frame_poses pose path (evaluator.py:60-102: seg argmax,
    feature normalise, [n,128]x[128,M] similarity, per-point max,
    numpy Kabsch).  The SplineCNN mesh branch is replaced by a buffer of
    precomputed mesh features (its torch_geometric kernels are absent
    here), matching the mesh-feature caching of our pipeline.  The
    KNN-index pyramid is precomputed OUTSIDE the timed loop — the
    reference pays it on CPU dataloader workers; excluding it favours
    the reference.
    """
    if not osp.isdir("/root/reference"):
        return None
    sys.path.insert(0, osp.join(REPO, "tests"))
    try:
        import torch

        from reference_stubs import reference_imports

        def t(x, dt=torch.float32):
            return torch.from_numpy(np.ascontiguousarray(x)).to(dt)

        def idx3(a):
            a = np.asarray(a)
            return a[..., None] if a.ndim == 2 else a

        tin = {
            "rgb": t(np.transpose(d1["rgb"], (0, 3, 1, 2))),
            "cld_rgb_nrm": t(np.transpose(d1["cld_rgb_nrm"], (0, 2, 1))),
            "choose": t(d1["choose"][:, None, :], torch.int64),
        }
        for i in range(4):
            tin[f"cld_xyz{i}"] = t(inp[f"cld_xyz{i}"])
            for k2 in ("cld_nei_idx", "cld_sub_idx", "r2p_ds_nei_idx"):
                tin[f"{k2}{i}"] = t(inp[f"{k2}{i}"], torch.int64)
            for k2 in ("cld_interp_idx", "p2r_ds_nei_idx"):
                tin[f"{k2}{i}"] = t(idx3(inp[f"{k2}{i}"]), torch.int64)
        for i in range(3):
            tin[f"r2p_up_nei_idx{i}"] = t(inp[f"r2p_up_nei_idx{i}"],
                                          torch.int64)
            tin[f"p2r_up_nei_idx{i}"] = t(idx3(inp[f"p2r_up_nei_idx{i}"]),
                                          torch.int64)

        with reference_imports(patch_load_state_dict=True):
            import models.geoMatch as gm

            class MeshStub(torch.nn.Module):
                """Precomputed mesh features (SplineCNN branch needs
                torch_geometric kernels, absent here)."""

                def __init__(self, cfg, cls_id):
                    super().__init__()
                    torch.manual_seed(1)
                    self.register_buffer(
                        "f", torch.randn(cfg["feat_dim"], n_mesh))

                def forward(self):
                    return self.f

            orig = gm.MeshEmbModel
            gm.MeshEmbModel = MeshStub
            try:
                from config.lmo_cfg import MODEL as REF_MODEL_CFG

                torch.manual_seed(0)
                ref = gm.GeoMatch(REF_MODEL_CFG, 1)
            finally:
                gm.MeshEmbModel = orig
            ref.eval()

            mesh_xyz = np.random.RandomState(2).randn(n_mesh, 3) * 0.05
            cld = d1["cld_rgb_nrm"][0, :, :3]

            def one_frame():
                with torch.no_grad():
                    end = ref(tin)
                # cal_frame_poses (evaluator.py:78-99)
                seg = end["seg"][0].numpy()
                mask = np.argmax(seg, 0) == 1
                f = end["rgbd"][0].numpy().T
                f = f / np.maximum(
                    np.linalg.norm(f, axis=1, keepdims=True), 1e-12)
                mf = end["mesh"][0].numpy().T
                mf = mf / np.maximum(
                    np.linalg.norm(mf, axis=1, keepdims=True), 1e-12)
                idx = (f @ mf.T).argmax(1)
                sel = np.where(mask)[0]
                if len(sel) < 5:
                    sel = np.arange(len(cld))
                _kabsch_np(mesh_xyz[idx[sel]], cld[sel])

            one_frame()                                    # warmup
            t0 = time.perf_counter()
            for _ in range(iters):
                one_frame()
            return iters / (time.perf_counter() - t0)
    finally:
        sys.path.remove(osp.join(REPO, "tests"))


def measure_train(mesh_fps, mesh, batch=24, im=256, n_sample=4096,
                  dtype="float32", steps=10, warmup=2, seed=0):
    """Fused-train-step samples/sec at production shapes (one compile)."""
    import jax
    import jax.numpy as jnp

    from gdm_tpu.data.pipeline import assemble_inputs
    from gdm_tpu.data.synthetic import make_batch
    from gdm_tpu.models import GeoMatch
    from gdm_tpu.train import (
        bn_momentum_schedule,
        create_train_state,
        cyclic_lr,
        make_train_step,
    )

    K = np.array([[572.4, 0, im / 2], [0, 573.6, im / 2], [0, 0, 1]],
                 np.float32)
    data, _ = make_batch(mesh_fps, batch, K, im_size=im,
                         n_sample=n_sample, seed=seed + 31)
    inputs = assemble_inputs(
        jnp.asarray(data["rgb"]), jnp.asarray(data["cld_rgb_nrm"]),
        jnp.asarray(data["choose"]), jnp.asarray(data["xyz_img"]),
        labels=jnp.asarray(data["labels"]),
        match_idx=jnp.asarray(data["match_idx"]),
        visible_flag=jnp.asarray(data["visible_flag"]),
        RT=jnp.asarray(data["RT"]))
    model = GeoMatch(positive_r=0.004, compute_dtype=jnp.dtype(dtype))
    state = create_train_state(
        model, jax.random.PRNGKey(seed), inputs, mesh,
        cyclic_lr(1e-5, 1e-3, 100))
    step = make_train_step(bn_momentum_schedule(batch_size=batch),
                           build_pyramid_in_step=False)
    rng = jax.random.PRNGKey(seed + 7)
    for _ in range(warmup):
        state, metrics = step(state, inputs, mesh, rng)
    float(jax.device_get(metrics["loss"]))    # real fetch, see run_on
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, inputs, mesh, rng)
    # chained state dependency + scalar fetch => all steps really ran
    float(jax.device_get(metrics["loss"]))
    dt = (time.perf_counter() - t0) / steps
    return batch / dt


def measure_dgcnn(data, mesh_fps, iters=15, warmup=3):
    """DGCNN-variant (config 5) inference fps at the same production
    shapes: approx edge-conv graphs (the pipeline default; exact top_k
    was 11.8x slower — CLAUDE.md 2026-08-20), forward + pose fit via
    eval/infer.run_inference (no KNN pyramid needed)."""
    import jax
    import jax.numpy as jnp

    from gdm_tpu.eval.infer import run_inference
    from gdm_tpu.models.geomatch_dgcnn import GeoMatchDGCNN
    from gdm_tpu.models.spline_mesh import IMAGENET_MEAN, IMAGENET_STD

    pts_m = mesh_fps[:, :3] / 1000.0            # make_object returns mm
    rgb_n = (mesh_fps[:, 3:6] / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    mesh_x = jnp.asarray(np.concatenate(
        [pts_m, rgb_n, mesh_fps[:, 6:9]], axis=1).astype(np.float32))
    mesh_xyz = jnp.asarray(pts_m.astype(np.float32))
    fin = {k: jnp.asarray(data[k])
           for k in ("rgb", "cld_rgb_nrm", "choose", "xyz_img")}
    model = GeoMatchDGCNN(approx_knn=True)
    variables = jax.jit(lambda r: model.init(
        r, {"cld_rgb_nrm": fin["cld_rgb_nrm"]}, mesh_x,
        train=False))(jax.random.PRNGKey(0))
    mesh_feats = jax.jit(lambda m: model.apply(
        variables, m, train=False, method="encode_mesh"))(mesh_x)
    step = jax.jit(lambda f, mx, mf, xyz: run_inference(
        model.apply, variables, f, mx, mf, xyz, 0.01,
        needs_pyramid=False, knn_chunk=1024, exact_knn=False,
        refine=None))
    for _ in range(warmup):
        out = step(fin, mesh_x, mesh_feats, mesh_xyz)
    float(jax.device_get(out[0, 0, 0]))         # see run_on
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(fin, mesh_x, mesh_feats, mesh_xyz)
    float(jax.device_get(out[0, 0, 0]))
    return int(fin["rgb"].shape[0]) * iters / (time.perf_counter() - t0)


def measure_dgcnn_train(mesh_fps, batch=24, im=256, n_sample=4096,
                        steps=10, warmup=2, seed=0):
    """DGCNN-variant fused-train-step samples/sec at b=24 (approx
    edge-conv graphs, f32).  Measured 162 samples/s on the v5e chip
    2026-08-20 — 1.9x the flagship's f32 85 sps (no KNN pyramid,
    fewer neighbour gathers); scripts/bench_dgcnn.py --train is the
    standalone version."""
    import jax
    import jax.numpy as jnp

    from gdm_tpu.data.synthetic import make_batch
    from gdm_tpu.models.geomatch_dgcnn import GeoMatchDGCNN
    from gdm_tpu.models.spline_mesh import IMAGENET_MEAN, IMAGENET_STD
    from gdm_tpu.train import (
        bn_momentum_schedule,
        create_train_state,
        cyclic_lr,
        make_train_step,
    )

    K = np.array([[572.4, 0, im / 2], [0, 573.6, im / 2], [0, 0, 1]],
                 np.float32)
    pts_m = mesh_fps[:, :3] / 1000.0
    rgb_n = (mesh_fps[:, 3:6] / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    mesh_x = jnp.asarray(np.concatenate(
        [pts_m, rgb_n, mesh_fps[:, 6:9]], axis=1).astype(np.float32))
    data, _ = make_batch(mesh_fps, batch, K, im_size=im,
                         n_sample=n_sample, seed=seed + 13)
    inputs = {k: jnp.asarray(data[k]) for k in (
        "cld_rgb_nrm", "labels", "origin_labels", "match_idx",
        "visible_flag", "RT")}
    model = GeoMatchDGCNN(approx_knn=True)
    state = create_train_state(
        model, jax.random.PRNGKey(seed), inputs, mesh_x,
        cyclic_lr(1e-5, 1e-3, 100))
    step = make_train_step(bn_momentum_schedule(batch_size=batch),
                           build_pyramid_in_step=False)
    rng = jax.random.PRNGKey(seed + 7)
    for _ in range(warmup):
        state, metrics = step(state, inputs, mesh_x, rng)
    float(jax.device_get(metrics["loss"]))    # real fetch, see run_on
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, inputs, mesh_x, rng)
    float(jax.device_get(metrics["loss"]))
    dt = (time.perf_counter() - t0) / steps
    return batch / dt


def measure_vsd(n_frames=32, reps=2, seed=3):
    """Batched BOP-VSD ms/frame (eval/vsd.vsd_err_batch) on an LMO-like
    workload: ~0.1 m icosphere-ish object, 640x480 frames.  All frames
    share one distance so every chunk lands in ONE (window side,
    z-bucket, chunk-pow2) shape — exactly one compile through the remote
    helper (grouped multi-bucket dispatch is covered by tests; here we
    bound bench wall time).  32 frames = two group_cap=16 chunks, so the
    host-prep/device-render pipelining that offline scoring sees is in
    the measurement.  Steady state = second rep."""
    import jax

    from gdm_tpu.data.synthetic import make_object
    from gdm_tpu.eval.vsd import vsd_err_batch

    rng = np.random.RandomState(seed)
    mesh_fps = make_object(512, rng, radius=0.05)
    verts = (mesh_fps[:, :3] / 1000.0).astype(np.float32)  # fps is mm
    # triangulate the synthetic cloud crudely: fan over nearest triples
    from scipy.spatial import ConvexHull

    hull = ConvexHull(verts)
    faces = hull.simplices.astype(np.int32)
    # orient faces outward (hull.simplices has arbitrary winding; BOP
    # meshes are consistently wound, and the VSD renderer backface-culls
    # only when the winding-consistency check passes)
    tri = verts[faces]
    nrm = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    flip = np.einsum("ij,ij->i", nrm, hull.equations[:, :3]) < 0
    faces[flip] = faces[flip][:, [0, 2, 1]]
    verts = verts.astype(np.float32)
    K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]],
                 np.float32)
    poses, depths = [], []
    for i in range(n_frames):
        A = rng.randn(3, 3)
        q, _ = np.linalg.qr(A)
        Rg = (q * np.sign(np.linalg.det(q))).astype(np.float32)
        tg = np.array([rng.uniform(-.05, .05), rng.uniform(-.05, .05),
                       0.8], np.float32)
        dR, _ = np.linalg.qr(np.eye(3) + 0.05 * rng.randn(3, 3))
        Re = (dR * np.sign(np.linalg.det(dR))).astype(np.float32) @ Rg
        te = tg + rng.randn(3).astype(np.float32) * 0.005
        poses.append((Re, te, Rg, tg))
        d = np.full((480, 640), tg[2] + 0.3, np.float32)
        depths.append(d)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        vsd_err_batch(poses, depths, K, verts, faces, 0.1)
        dt = (time.perf_counter() - t0) / n_frames
        best = dt if best is None else min(best, dt)
    return best * 1e3


def main():
    result = {
        "metric": "ycbv_shaped_inference_fps_per_chip",
        "value": None,
        "unit": "frames/sec",
        "vs_baseline": None,
    }
    watchdog = _start_watchdog(result)

    import jax

    from gdm_tpu.models import GeoMatch

    n_mesh = 4096
    graph, mesh, data, mesh_fps = build_workload(n_mesh=n_mesh)
    model = GeoMatch()

    from gdm_tpu.data.pipeline import assemble_inputs

    import jax.numpy as jnp

    batch_small = {k: v[:1] for k, v in data.items()}
    sample_inputs = assemble_inputs(
        jnp.array(batch_small["rgb"]), jnp.array(batch_small["cld_rgb_nrm"]),
        jnp.array(batch_small["choose"]), jnp.array(batch_small["xyz_img"]))
    variables = jax.jit(
        lambda r, inp, m: model.init(r, inp, m, train=False)
    )(jax.random.PRNGKey(0), sample_inputs, mesh)

    accel = jax.devices()[0]
    # 15 iters: single-run fps through the axon tunnel varies ~10%
    # (observed 188-206 at iters=5); longer steady-state averages it out
    fps = run_on(accel, data, mesh, model, variables, mesh.xyz,
                 iters=15, warmup=3)

    cpu = jax.devices("cpu")[0]
    jax_cpu_fps = run_on(cpu, batch_small, mesh, model, variables,
                         mesh.xyz, iters=1, warmup=1)

    try:
        ref_fps = measure_reference_torch_cpu(
            batch_small, jax.device_get(sample_inputs), n_mesh)
    except Exception as e:   # torch/stub/import trouble must not cost
        print(f"reference baseline failed: {e!r}", file=sys.stderr)
        ref_fps = None       # the headline after the TPU run already ran
    if ref_fps is not None:
        baseline_fps, baseline_kind = ref_fps, "reference_torch_cpu"
    else:
        baseline_fps, baseline_kind = jax_cpu_fps, "self_jax_cpu"

    result.update({
        "value": round(fps, 3),
        "vs_baseline": round(fps / baseline_fps, 2),
        "baseline_fps": round(baseline_fps, 3),
        "baseline_kind": baseline_kind,
        "jax_cpu_fps": round(jax_cpu_fps, 3),
        "batch": int(data["rgb"].shape[0]),
        "device": str(accel.platform),
    })

    if os.environ.get("GDM_BENCH_BF16", "1") != "0":
        try:
            import jax.numpy as jnp

            model_bf16 = GeoMatch(compute_dtype=jnp.bfloat16)
            vars_bf16 = jax.jit(
                lambda r, inp, m: model_bf16.init(r, inp, m, train=False)
            )(jax.random.PRNGKey(0), sample_inputs, mesh)
            result["fps_bf16"] = round(run_on(
                accel, data, mesh, model_bf16, vars_bf16, mesh.xyz,
                iters=15, warmup=3), 3)
        except Exception as e:   # optional extra — never cost the headline
            result["fps_bf16"] = None
            result["fps_bf16_error"] = str(e)[:120]

    if os.environ.get("GDM_BENCH_TRAIN", "1") != "0":
        for dt_name, key in (("float32", "train_sps_b24_f32"),
                             ("bfloat16", "train_sps_b24_bf16")):
            try:
                result[key] = round(measure_train(
                    mesh_fps, mesh, dtype=dt_name), 2)
            except Exception as e:   # keep the headline even if train
                result[key] = None   # measurement fails
                result[key + "_error"] = str(e)[:120]

    if os.environ.get("GDM_BENCH_DGCNN", "1") != "0":
        try:
            result["dgcnn_fps"] = round(measure_dgcnn(data, mesh_fps), 3)
        except Exception as e:
            result["dgcnn_fps"] = None
            result["dgcnn_error"] = str(e)[:120]
        try:
            result["dgcnn_train_sps_b24"] = round(
                measure_dgcnn_train(mesh_fps), 2)
        except Exception as e:
            result["dgcnn_train_sps_b24"] = None
            result["dgcnn_train_error"] = str(e)[:120]

    if os.environ.get("GDM_BENCH_VSD", "1") != "0":
        try:
            result["vsd_ms_per_frame_batched"] = round(measure_vsd(), 2)
        except Exception as e:
            result["vsd_ms_per_frame_batched"] = None
            result["vsd_error"] = str(e)[:120]

    if watchdog is not None:
        watchdog.cancel()
    _emit(result)


if __name__ == "__main__":
    main()
