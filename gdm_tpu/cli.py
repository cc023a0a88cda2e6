"""Command-line driver: per-object training and full-dataset evaluation.

Replaces reference train_lm.py / train_ycb.py / test_lmo.sh:

    python -m gdm_tpu.cli train --dataset lmo --cls-id 1 \
        --data-root datasets/lm/linemod --ckpt-root train_log/lm
    python -m gdm_tpu.cli eval --dataset lmo --data-root ... \
        --ckpt-root train_log/lm [--refine icp] [--cls-id 1]
    python -m gdm_tpu.cli infer --dataset lmo --data-root ... \
        --ckpt-root train_log/lm            # GT-less deployment mode
    python -m gdm_tpu.cli score --dataset lmo --data-root ... \
        --csv output/infer_lmo.csv          # re-score once GT exists

Deviations from the reference (deliberate, documented):
  * one process drives all local devices — data parallelism comes from
    NamedSharding over the device mesh, not torch.distributed.launch
    (train_lm.py:376-388); multi-host runs call jax.distributed.initialize
    when --multihost is set;
  * evaluation runs per object with that object's jitted graph instead of
    routing batch elements through a per-object model dict one element at
    a time (train_lm.py:298-314) — same predictions, no bs=1 dispatches;
  * pose fitting happens on device inside the eval jit (evaluator.py's
    host ThreadPool + numpy SVD, :274-305, disappears).
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import time

import numpy as np


def _select_devices(args):
    """Device list for the run: first --devices PER PROCESS of the
    active platform (None = all).  Mirrors the reference's per-node
    --gpus (train_lm.py:78-82).  On a multi-process run the limit
    applies host-by-host (a jax Mesh must contain devices from every
    process, so slicing the global list would leave non-zero hosts
    without addressable devices)."""
    from gdm_tpu.parallel.mesh import default_devices

    devs = default_devices()
    n = getattr(args, "devices", None)
    if n is not None:
        by_proc = {}
        for d in devs:
            by_proc.setdefault(d.process_index, []).append(d)
        n_min = min(len(v) for v in by_proc.values())
        if not 1 <= n <= n_min:
            raise SystemExit(
                f"--devices {n} out of range (1..{n_min} per process)")
        devs = [d for p in sorted(by_proc) for d in by_proc[p][:n]]
    return devs


def _process_rank_world():
    """Data-parallel (rank, world), robust to plugin default backends
    that hide the process topology: the axon TPU plugin reports
    process_index 0 / process_count 1 on EVERY rank (measured —
    tests/_mp_resume_worker.py), so a rank check against the default
    backend would make all ranks take the rank-0 write path and race.
    Prefer whichever backend reports the largest world (the one
    jax.distributed.initialize actually federated)."""
    import jax

    best = (jax.process_index(), jax.process_count())
    for plat in ("cpu", "tpu"):
        try:
            if jax.process_count(plat) > best[1]:
                best = (jax.process_index(plat), jax.process_count(plat))
        except RuntimeError:            # backend absent
            continue
    return best


def _build_object_setup(cfg, refd, cls_id, data_root):
    """Mesh graph + diameter + names for one object."""
    from gdm_tpu.data.ply import load_or_build_fps_mesh
    from gdm_tpu.models.geomatch import MeshArrays
    from gdm_tpu.models.spline_mesh import build_mesh_graph
    from gdm_tpu.refdata._base import symmetry_transform

    obj_name = refd.id2obj[cls_id]
    diameter_m = refd.diameters_mm_by_id[cls_id] / 1000.0
    mesh_fps = load_or_build_fps_mesh(
        data_root, cls_id, cfg.data.model_pt_num)

    sym = None
    if obj_name in cfg.data.sym_objs:
        try:
            info = refd.load_models_info(osp.join(data_root, "models"))
            sym = symmetry_transform(info[str(cls_id)])
        except FileNotFoundError:
            sym = None
    # build_mesh_graph consumes the reference npy LAYOUT (xyz in mm,
    # SplineCNN.py:180-193) while load_or_build_fps_mesh returns metres
    # for the dataset/pose paths — feeding metres in here divided by
    # 1000 twice, shrinking graph.xyz/node_x 1000x (degenerate circle-
    # loss positives, biased fitted translations) on every real-data run
    fps_mm = np.concatenate(
        [mesh_fps[:, :3] * 1000.0, mesh_fps[:, 3:]], axis=1)
    graph = build_mesh_graph(fps_mm, cfg.data.model_pt_num,
                             sym_transform=sym)
    return obj_name, diameter_m, mesh_fps, graph, MeshArrays.from_graph(
        graph)


def _make_model(cfg, diameter_m, mesh_fps, mesh_arr, exact_knn=False,
                sp_mesh=None):
    """(model, mesh_input, mesh_xyz, needs_pyramid) for the configured
    backbone — 'randla_spline' (flagship) or 'dgcnn' (config 5).

    `exact_knn` (the eval/infer/export --exact-knn flag) forces exact
    edge-conv graphs on the dgcnn backbone, like it forces the exact
    KNN pyramid on the flagship.

    `sp_mesh` (train --model-shards): a 2-D ('data', 'model') Mesh —
    routes the train matching loss through
    parallel.sp.sharded_matching_loss so the [B*N, M] similarity/loss
    tensor is sharded over the model axis (the memory-limiting tensor
    at lmfull shapes, SURVEY §2d)."""
    import jax.numpy as jnp

    if cfg.model.backbone == "dgcnn":
        from gdm_tpu.models.geomatch_dgcnn import GeoMatchDGCNN
        from gdm_tpu.models.spline_mesh import IMAGENET_MEAN, IMAGENET_STD

        matching_loss_fn = None
        if sp_mesh is not None:
            # dgcnn sharded loss: e0 pad column + per-COLUMN
            # depth-scaled radius (geoMatch_DGCNN.py:23,62-65) — the
            # r4 exclusion lifted (VERDICT r4 item 4)
            from gdm_tpu.parallel.sp import sharded_matching_loss

            def matching_loss_fn(rgbd, mf, mxyz, lab, midx, vis, rt,
                                 r_mm):
                return sharded_matching_loss(
                    rgbd, mf, mxyz, lab, midx, vis, 0.0, sp_mesh,
                    pad_onehot=True, rt=rt, depth_scaled_r_mm=r_mm)
        model = GeoMatchDGCNN(
            feat_dim=cfg.model.feat_dim,
            approx_knn=not (exact_knn or cfg.model.dgcnn_exact_knn),
            compute_dtype=jnp.dtype(cfg.model.compute_dtype),
            matching_loss_fn=matching_loss_fn)
        pts = mesh_fps[:, :3]                    # metres (load_fps_mesh)
        rgb_n = (mesh_fps[:, 3:6] / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        mesh_x = jnp.asarray(np.concatenate(
            [pts, rgb_n, mesh_fps[:, 6:9]], axis=1).astype(np.float32))
        return model, mesh_x, jnp.asarray(pts), False

    from gdm_tpu.models import GeoMatch
    from gdm_tpu.models.randla import set_gather_bwd_dtype

    set_gather_bwd_dtype(cfg.model.gather_bwd_dtype)
    matching_loss_fn = None
    if sp_mesh is not None:
        from gdm_tpu.parallel.sp import sharded_matching_loss

        def matching_loss_fn(rgbd, mf, mxyz, lab, midx, vis, pr, sym):
            return sharded_matching_loss(
                rgbd, mf, mxyz, lab, midx, vis, pr, sp_mesh,
                sym_idx=sym)
    model = GeoMatch(
        feat_dim=cfg.model.feat_dim,
        positive_r=cfg.model.neighbor_dis_th * diameter_m,
        compute_dtype=jnp.dtype(cfg.model.compute_dtype),
        matching_loss_fn=matching_loss_fn)
    return model, mesh_arr, mesh_arr.xyz, True


def _eval_object_metadata(cfg, refd, cls_id, data_root, want_vsd, log,
                          models_info, fallback_pts=None):
    """Per-object eval metadata shared by evaluate() and score().

    Returns (obj_name, diameter_m, model points [m], (verts, faces) for
    VSD or None, symmetry rotations or None, full BOP symmetry
    transforms [(R, t_m)] or None).  PLY loading, unit conversions, and
    the kps fallback live HERE so the online and offline scoring paths
    cannot diverge.
    """
    from gdm_tpu.data.ply import find_kps_mesh, load_ply
    from gdm_tpu.refdata._base import (
        all_symmetry_rotations,
        all_symmetry_transforms,
    )

    obj_name = refd.id2obj[cls_id]
    diameter = refd.diameters_mm_by_id[cls_id] / 1000.0
    eval_ply = osp.join(data_root, "models_eval", f"obj_{cls_id:06d}.ply")
    vsd_mesh = None
    if osp.exists(eval_ply):
        ply = load_ply(eval_ply)
        pts = ply["pts"] / 1000.0
        if want_vsd:
            if "faces" in ply:
                vsd_mesh = (pts, ply["faces"])
            else:
                log.warning("--vsd: %s has no faces — skipping VSD "
                            "for %s", eval_ply, obj_name)
    else:
        # find_kps_mesh already converts xyz to metres (and knows the
        # per-dataset kps directory names, e.g. ycbv's bop_ycb_kps/)
        pts = (fallback_pts if fallback_pts is not None else
               find_kps_mesh(data_root, cls_id,
                             cfg.data.model_pt_num)[:, :3])
        if want_vsd:
            log.warning("--vsd: no faces for %s (missing %s) — "
                        "skipping VSD for this object", obj_name,
                        eval_ply)
    sym = None
    sym_tf = None
    if str(cls_id) in models_info:
        if obj_name in cfg.data.sym_objs:
            sym = all_symmetry_rotations(models_info[str(cls_id)])
        # MSSD/MSPD use the models_info symmetry set for EVERY object
        # (identity-only when the model has none), translations -> metres
        sym_tf = [(R, t / 1000.0) for R, t in
                  all_symmetry_transforms(models_info[str(cls_id)])]
    return obj_name, diameter, pts, vsd_mesh, sym, sym_tf


def _load_targets(path):
    """BOP test-targets JSON -> {(scene_id, im_id, obj_id)} int triples
    (test_targets_bop19.json: [{scene_id, im_id, obj_id, inst_count}])."""
    import json

    with open(path) as f:
        targets = {(int(t["scene_id"]), int(t["im_id"]), int(t["obj_id"]))
                   for t in json.load(f)}
    if not targets:
        raise SystemExit(f"{path}: no targets parsed")
    return targets


def _filter_targets(annos, targets, cls_id):
    """Annotation records restricted to a BOP target set."""
    return [r for r in annos
            if (int(r.file_name.split("/")[0]),
                int(r.file_name.split("/")[1]), cls_id) in targets]


def _gts_from_annos(ds):
    """GT dict for the Evaluator (file_name -> pose/K/depth source)."""
    return {r.file_name: {"R": r.pose[:, :3], "t": r.pose[:, 3],
                          "K": r.cam_K, "depth_file": r.depth_file,
                          "depth_factor": r.depth_factor}
            for r in ds.annos}


def _train_inputs(fin, knn_chunk, needs_pyramid, positive_r=None):
    """Model inputs for a finalized batch (train keys included).

    positive_r rides in the input dict as a traced scalar so one compiled
    train step serves every object (diameters differ per object)."""
    import jax.numpy as jnp

    from gdm_tpu.data.pipeline import assemble_inputs

    if not needs_pyramid:
        inputs = {k: fin[k] for k in (
            "cld_rgb_nrm", "labels", "origin_labels", "match_idx",
            "visible_flag", "RT") if k in fin}
    else:
        inputs = assemble_inputs(
            fin["rgb"], fin["cld_rgb_nrm"], fin["choose"], fin["xyz_img"],
            labels=fin["labels"], match_idx=fin["match_idx"],
            visible_flag=fin["visible_flag"], RT=fin["RT"],
            knn_chunk=knn_chunk)
        if positive_r is not None:
            inputs["positive_r"] = jnp.float32(positive_r)
    return inputs


def _make_infer_jits(needs_pyramid, knn_chunk, exact_knn, refine,
                     sp_mesh=None):
    """Staged inference jits shared by `eval` and `infer`.

    encode_mesh computes the batch-independent mesh features once per
    object; infer_step runs preprocess + forward + on-device pose fit.
    Staged programs schedule better than one monolithic jit on TPU and
    pipeline through the device queue (bench.py make_pipeline notes).
    `sp_mesh` (a 2-D ('data', 'model') Mesh, from --model-shards) routes
    the similarity argmax through parallel.sp.sharded_cosine_argmax.
    """
    import jax

    from gdm_tpu.eval.infer import run_inference

    @jax.jit
    def encode_mesh(state, mesh_input):
        return state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            mesh_input, train=False, method="encode_mesh")

    @jax.jit
    def infer_step(state, fin, mesh_input, mesh_feats, mesh_xyz,
                   icp_reject):
        return run_inference(
            state.apply_fn,
            {"params": state.params, "batch_stats": state.batch_stats},
            fin, mesh_input, mesh_feats, mesh_xyz, icp_reject,
            needs_pyramid=needs_pyramid, knn_chunk=knn_chunk,
            exact_knn=exact_knn, refine=refine, sp_mesh=sp_mesh)

    return encode_mesh, infer_step


def _make_run_mesh(args, batch_size):
    """The run's device mesh: 1-D 'data', or — when --model-shards N>1 —
    a 2-D ('data', 'model') mesh whose 'model' axis shards the mesh
    columns of the similarity argmax (parallel/sp.py; the SURVEY §2d
    sequence-parallel story made reachable from the CLI, VERDICT r2
    item 4).  Returns (mesh, model_shards)."""
    from gdm_tpu.parallel import make_mesh

    devs = _select_devices(args)
    shards = getattr(args, "model_shards", None) or 1
    if shards <= 1:
        return make_mesh(devs), 1
    from gdm_tpu.parallel.sp import make_mesh_2d

    if len(devs) % shards:
        raise SystemExit(f"--model-shards {shards} does not divide "
                         f"{len(devs)} devices")
    mesh = make_mesh_2d(devs, model=shards)
    n_data = mesh.shape["data"]
    if batch_size % n_data:
        raise SystemExit(f"batch {batch_size} not divisible by the "
                         f"data-axis size {n_data} "
                         f"({len(devs)} devices / {shards} model shards)")
    return mesh, shards


def _device_batch(batch, mesh_dev, fill_depth):
    """Host batch -> sharded device arrays -> finalized model inputs."""
    import jax.numpy as jnp

    from gdm_tpu.data.pipeline import finalize_batch
    from gdm_tpu.parallel import shard_batch

    # depth ships as uint16 counts + per-sample scale and the GT label
    # arrays ship narrow (u8/u16) — H2D bytes are the binding e2e-train
    # resource through the tunneled chip (docs/SCALING.md); dpt_m kept
    # for callers staging pre-scaled float batches
    keys = ["rgb_u8", "dpt_u16", "dpt_scale", "dpt_m", "K_crop",
            "choose", "labels", "origin_labels", "match_idx",
            "visible_flag", "RT", "det"]
    if fill_depth:
        # finalize_batch reads dpt_filled only when filling; skipping
        # it otherwise drops dead ship weight
        keys.append("dpt_filled")
    dev = {k: jnp.asarray(batch[k]) for k in keys if k in batch}
    dev = shard_batch(dev, mesh_dev)
    return finalize_batch(dev, fill_depth=fill_depth)


def _save_viz(viz_dir, obj_name, file_name, rgb_u8, K_crop, pts, pose,
              gt_rt=None, max_pts=2048, inst=0):
    """Write a qualitative pose-overlay PNG: predicted pose in green,
    GT (when available and non-zero) in blue, onto the network's input
    crop (reference basic_utils draw figures, :355-440).  `inst`
    disambiguates multiple detections of the same object in one frame
    (infer mode keeps every detection of the class)."""
    import os

    from PIL import Image

    from gdm_tpu.utils.viz import draw_pose

    os.makedirs(viz_dir, exist_ok=True)
    pts = np.asarray(pts)
    if len(pts) > max_pts:
        pts = pts[:: len(pts) // max_pts + 1]
    img = np.ascontiguousarray(rgb_u8)
    if gt_rt is not None and np.abs(gt_rt).sum() > 0:
        img = draw_pose(img, pts, gt_rt[:, :3], gt_rt[:, 3], K_crop,
                        color=(60, 120, 255))
    img = draw_pose(img, pts, pose[:, :3], pose[:, 3], K_crop,
                    color=(0, 255, 80))
    name = file_name.replace("/", "_")
    suffix = "" if inst == 0 else f"_{inst}"
    Image.fromarray(img).save(
        osp.join(viz_dir, f"{obj_name}_{name}{suffix}.png"))


def _pad_batch(batch: dict, bs: int) -> dict:
    """Pad a trailing partial batch to the compiled batch size by
    repeating its last row (shared by the eval/infer/validation loops —
    callers slice results back to the real row count)."""
    n_real = next(iter(batch.values())).shape[0]
    if n_real >= bs:
        return batch
    pad = bs - n_real
    return {k: np.concatenate([v, np.repeat(v[-1:], pad, 0)])
            for k, v in batch.items()}


class _ValContext:
    """Lazy per-object validation harness for `train --eval-every`.

    Runs the full inference path (pyramid + forward + on-device pose
    fit) over the object's test split and reports ADD(-S) recall@0.1d
    and the VOC AUC — the headline numbers `eval` computes — without the
    full Evaluator bookkeeping.  Built lazily so training without a test
    split (common for pbr-only roots) costs nothing but a warning.

    `shared_jits` must be the SAME (encode_mesh, infer_step) pair for
    every object — objects share shapes, so one compile serves all
    (CLAUDE.md: don't reintroduce per-object jit defs).
    """

    def __init__(self, cfg, refd, cls_id, args, diameter_m, log, n_dev,
                 shared_jits):
        self.ok = False
        self.log = log
        self.jits = shared_jits
        try:
            from gdm_tpu.data.dataset import PoseDataset
            from gdm_tpu.data.loader import DataLoader

            ds = PoseDataset(cfg, cls_id, "test", diameter_m=diameter_m,
                             data_root=args.data_root)
            if len(ds) == 0:
                log.warning("--eval-every: no test annotations for "
                            "cls %d — skipping validation", cls_id)
                return
            # batch must stay divisible by the device mesh (shard_batch
            # device_puts a P('data') layout); round down, floor n_dev
            bs = min(args.batch_size or cfg.solver.val_batch_size,
                     max(len(ds), 1))
            self.bs = max(bs - bs % n_dev, n_dev)
            self.dl = DataLoader(ds, self.bs, shuffle=False,
                                 drop_last=False,
                                 num_workers=args.num_workers,
                                 workers=args.loader_workers)
            obj_name = refd.id2obj[cls_id]
            self.is_sym = obj_name in cfg.data.sym_objs
            self.diameter = diameter_m
            self.gts = _gts_from_annos(ds)
            self.fill_depth = cfg.data.fill_depth
            self.ok = True
        except OSError as e:
            log.warning("--eval-every: test split unavailable (%s) — "
                        "skipping validation", e)

    def run(self, state, mesh_input, mesh_xyz, dev_mesh, models_pts):
        """Returns {'val_add_auc', 'val_ad_10', 'val_frames'} or None."""
        import jax

        from gdm_tpu.eval.metrics import add_err, adi_err, voc_auc

        if not self.ok:
            return None
        encode_mesh, infer_step = self.jits
        mesh_feats = encode_mesh(state, mesh_input)
        errs = []
        for batch, meta in self.dl:
            n_real = batch["rgb_u8"].shape[0]
            batch = _pad_batch(batch, self.bs)
            fin = _device_batch(batch, dev_mesh, self.fill_depth)
            poses = jax.device_get(
                infer_step(state, fin, mesh_input, mesh_feats, mesh_xyz,
                           np.float32(0.01)))
            for i in range(n_real):
                gt = self.gts[meta[i]["file_name"]]
                err_fn = adi_err if self.is_sym else add_err
                errs.append(err_fn(
                    poses[i][:, :3], poses[i][:, 3],
                    gt["R"], gt["t"], models_pts))
        return {
            "val_add_auc": float(voc_auc(errs, max_dis=0.1)),
            "val_ad_10": float(np.mean(
                np.asarray(errs) < 0.1 * self.diameter) * 100.0),
            "val_frames": len(errs),
        }


def train(args):
    import jax

    from gdm_tpu.configs.base import get_config
    from gdm_tpu.data.dataset import PoseDataset
    from gdm_tpu.data.loader import DataLoader
    from gdm_tpu.parallel import replicate
    from gdm_tpu.refdata import get as get_refdata
    from gdm_tpu.train import (
        bn_momentum_schedule,
        create_train_state,
        cyclic_lr,
        load_checkpoint,
        make_optimizer,
        make_train_step,
        save_checkpoint,
    )
    from gdm_tpu.utils.logging import JsonlLogger, get_logger

    if args.multihost:
        jax.distributed.initialize()
    # rank/world from the backend that actually has the topology (the
    # axon plugin reports 0/1 on every rank — ADVICE r4)
    rank, world = _process_rank_world()
    log = get_logger("train")
    cfg = get_config(args.dataset, args.opt)
    refd = get_refdata(args.dataset)
    sol = cfg.solver
    epochs = args.epochs or sol.total_epochs
    batch_size = args.batch_size or sol.train_batch_size
    cls_ids = (list(cfg.data.obj_ids) if args.cls_id == "all"
               else [int(args.cls_id)])

    # --model-shards N>1 gives a 2-D (data, model) mesh: batch rows
    # shard over 'data', the matching-loss mesh columns over 'model'
    dev_mesh, model_shards = _make_run_mesh(args, batch_size)
    n_dev = dev_mesh.shape["data"]      # data-parallel batch divisor
    if batch_size % n_dev:
        raise SystemExit(
            f"batch {batch_size} not divisible by the data-axis size "
            f"{n_dev}")
    bnm = bn_momentum_schedule(sol.bn_momentum, sol.bn_decay,
                               sol.bn_decay_step, batch_size,
                               sol.bn_momentum_clip)
    # the input pyramid is built in its own jit (staged programs schedule
    # better than one monolithic program on TPU; gradients don't flow
    # through neighbour indices); positive_r rides in the inputs so the
    # SAME compiled step serves every object in --cls-id all runs
    train_step = make_train_step(bnm, build_pyramid_in_step=False)
    model = None
    state = None
    lr = None
    val_jits = None
    pretrained = (args.pretrained_backbone
                  or cfg.model.pretrained_backbone)
    pretrained_sd = None

    for cls_id in cls_ids:
        obj_name, diameter_m, mesh_fps, _, mesh_arr = _build_object_setup(
            cfg, refd, cls_id, args.data_root)
        log.info("object %s (id %d), diameter %.3f m",
                 obj_name, cls_id, diameter_m)

        ds = PoseDataset(cfg, cls_id, "train", diameter_m=diameter_m,
                         data_root=args.data_root,
                         rng=np.random.RandomState(args.seed + rank))
        # each host loads ONLY the rows its devices consume (shard_batch
        # assembles the global batch from per-process local chunks)
        if batch_size % world:
            raise SystemExit(f"batch {batch_size} not divisible by "
                             f"{world} processes")
        dl = DataLoader(ds, batch_size // world,
                        shuffle=True, drop_last=True,
                        num_workers=args.num_workers, seed=args.seed,
                        rank=rank, world=world,
                        workers=args.loader_workers)
        log.info("%d samples, %d steps/epoch", len(ds), len(dl))

        model_i, mesh_input, mesh_xyz, needs_pyramid = _make_model(
            cfg, diameter_m, mesh_fps, mesh_arr,
            sp_mesh=dev_mesh if model_shards > 1 else None)
        if model is None:
            model = model_i
        val_ctx = None
        val_mesh, val_n_dev = dev_mesh, n_dev
        if args.eval_every and world > 1:
            # multihost: validate on rank 0 alone over ITS local mesh
            # devices (no cross-host collectives -> other ranks skip
            # without deadlocking; state is fetched to host first, so
            # the val jits re-stage it locally)
            from gdm_tpu.parallel import make_mesh

            devs = list(np.asarray(dev_mesh.devices).flat)
            plat = devs[0].platform
            local = [d for d in devs
                     if d.process_index == jax.process_index(plat)]
            val_mesh, val_n_dev = make_mesh(local), len(local)
        if args.eval_every and (world == 1 or rank == 0):
            if val_jits is None:    # ONE compile serves every object
                val_jits = _make_infer_jits(needs_pyramid,
                                            args.knn_chunk, False, None)
            val_ctx = _ValContext(cfg, refd, cls_id, args, diameter_m,
                                  log, val_n_dev, val_jits)
        positive_r = (cfg.model.neighbor_dis_th * diameter_m
                      if needs_pyramid else None)
        # step_size follows the reference's epochs*len/bs/div/n_replicas
        # (train_lm.py:441-447) with len(dl) already per-process; built
        # once — a fresh schedule closure per object would change the
        # optimizer pytree identity and force a train-step recompile
        if lr is None:
            lr = cyclic_lr(sol.base_lr, sol.max_lr,
                           max(epochs * len(dl) // sol.clr_div, 1))
            tx = make_optimizer(lr, sol.weight_decay, sol.skip_nonfinite)

        if len(dl) == 0:
            raise SystemExit(
                f"{obj_name}: {len(ds)} samples on this process is "
                f"smaller than the per-process batch "
                f"{batch_size // world} (drop_last)")
        # init shapes straight from the dataset — spinning a throwaway
        # DataLoader (full worker pool, prefetch) per object just to
        # discard one batch is pure startup waste in --cls-id all runs
        from gdm_tpu.data.loader import collate

        batch0, _ = collate([ds[i % len(ds)] for i in
                             range(batch_size // world)])
        fin0 = _device_batch(batch0, dev_mesh, cfg.data.fill_depth)
        sample_inputs = _train_inputs(fin0, args.knn_chunk, needs_pyramid,
                                      positive_r)
        mesh_input_h, mesh_xyz_h = mesh_input, mesh_xyz  # host copies
        mesh_input = replicate(mesh_input, dev_mesh)
        mesh_xyz = replicate(mesh_xyz, dev_mesh)
        state = create_train_state(
            model, jax.random.PRNGKey(args.seed + cls_id), sample_inputs,
            mesh_input, lr, weight_decay=sol.weight_decay, tx=tx)
        if pretrained:
            if not needs_pyramid:   # dgcnn variant has no CNN branch
                raise SystemExit("--pretrained-backbone needs the "
                                 "randla_spline (FFB6D) backbone")
            from gdm_tpu.train.import_torch import (
                load_pretrained_backbone,
                read_torchvision_state,
            )

            if pretrained_sd is None:   # read ONCE across --cls-id all
                pretrained_sd = read_torchvision_state(pretrained)
            state = load_pretrained_backbone(state, pretrained_sd)
            log.info("CNN backbone initialised from %s", pretrained)
        state = replicate(state, dev_mesh)

        ckpt_dir = osp.join(args.ckpt_root, "checkpoints", obj_name)
        start_epoch = 0
        if args.resume:
            state, ep = load_checkpoint(state, ckpt_dir)
            if ep is not None:
                start_epoch = ep + 1
                log.info("resumed from epoch %d", ep)

        # machine-readable metrics stream alongside the console log
        # (reference observability is stdout-only, train_lm.py:275-283)
        mlog = (JsonlLogger(osp.join(args.ckpt_root, "metrics",
                                     f"{obj_name}.jsonl"))
                if rank == 0 else None)
        notfinite_seen = 0
        rng = jax.random.PRNGKey(args.seed + 7 + cls_id)

        # staging is DIRECT on the main thread: jax dispatch is async,
        # so the H2D puts + finalize/pyramid dispatches below already
        # overlap device execution of the previous step.  An explicit
        # staging thread (DevicePrefetcher) was A/B-measured WORSE on
        # the 1-core tunnel host — e2e 18.8-37.5 sps threaded vs 47.4
        # direct (2026-08-20): a second dispatching thread only
        # contends with the loader pool for the core and the tunnel
        # client.  The reference needs DataLoader workers running ahead
        # of the GPU step (train_lm.py:399-403) because torch dispatch
        # blocks; here the runtime's async queue IS the double buffer.
        for epoch in range(start_epoch, epochs):
            dl.set_epoch(epoch)
            t0 = time.perf_counter()
            it_prev = 0
            for it, (batch, _) in enumerate(dl):
                fin = _device_batch(batch, dev_mesh, cfg.data.fill_depth)
                inputs = _train_inputs(fin, args.knn_chunk,
                                       needs_pyramid, positive_r)
                state, metrics = train_step(state, inputs, mesh_input, rng)
                if it % 100 == 0:
                    m = jax.device_get(metrics)
                    dt = time.perf_counter() - t0
                    sps = (it - it_prev + 1) * batch_size / max(dt, 1e-9)
                    step = int(jax.device_get(state.step))
                    log.info(
                        "epoch %d it %d loss %.4f (seg %.4f match %.4f) "
                        "%.2f s (%.1f samples/s)", epoch, it, m["loss"],
                        m["seg_loss"], m["match_loss"], dt, sps)
                    nf = int(m.get("total_notfinite", 0))
                    if nf > notfinite_seen:
                        log.warning(
                            "%d non-finite update(s) skipped so far "
                            "(solver.skip_nonfinite guard)", nf)
                        notfinite_seen = nf
                    if not np.isfinite(m["loss"]):
                        log.warning("non-finite loss at epoch %d it %d",
                                    epoch, it)
                    if mlog is not None:
                        mlog.write({
                            "obj": obj_name, "epoch": epoch, "it": it,
                            "step": step, "loss": m["loss"],
                            "seg_loss": m["seg_loss"],
                            "match_loss": m["match_loss"],
                            # step is fetched POST-update; the update just
                            # logged was computed at schedule count step-1
                            "lr": float(lr(max(step - 1, 0))),
                            "bn_momentum": m["bn_momentum"],
                            "samples_per_sec": round(sps, 2),
                            "total_notfinite": nf,
                        })
                    t0 = time.perf_counter()
                    it_prev = it + 1
            if ((epoch + 1) % sol.checkpoint_every_epochs == 0
                    or epoch + 1 == epochs):
                # every process calls save; each fetches the replicated
                # leaves to host and rank 0 alone writes numpy — see
                # train/checkpoint.py for why the orbax collective save
                # is a measured loser here
                path = save_checkpoint(state, ckpt_dir, epoch,
                                       process_index=rank)
                if rank == 0:
                    log.info("checkpoint -> %s", path)
            if val_ctx is not None and (
                    (epoch + 1) % args.eval_every == 0
                    or epoch + 1 == epochs):
                # validation on the kps model points (the eval command
                # uses models_eval PLYs when present; kps points are the
                # same cloud the matching head is trained against)
                if world > 1:
                    # replicated leaves -> host numpy; the val jits
                    # re-commit them to the rank-local mesh
                    val = val_ctx.run(jax.device_get(state),
                                      mesh_input_h, mesh_xyz_h,
                                      val_mesh, mesh_fps[:, :3])
                else:
                    val = val_ctx.run(state, mesh_input, mesh_xyz,
                                      dev_mesh, mesh_fps[:, :3])
                if val is not None:
                    log.info("epoch %d val: add_auc %.2f ad_10 %.2f%% "
                             "(%d frames)", epoch, val["val_add_auc"],
                             val["val_ad_10"], val["val_frames"])
                    if mlog is not None:
                        mlog.write({"obj": obj_name, "epoch": epoch,
                                    **val})
        if mlog is not None:
            mlog.close()
    return state


def evaluate(args):
    import jax

    if args.multihost:    # same contract as train()/infer()
        jax.distributed.initialize()

    from gdm_tpu.configs.base import get_config
    from gdm_tpu.data.dataset import PoseDataset
    from gdm_tpu.data.loader import DataLoader
    from gdm_tpu.eval.evaluator import Evaluator
    from gdm_tpu.parallel import (
        all_gather_host,
        local_rows,
        replicate,
    )
    from gdm_tpu.refdata import get as get_refdata
    from gdm_tpu.train import (
        create_train_state,
        load_checkpoint,
        make_optimizer,
    )
    from gdm_tpu.train.import_torch import load_torch_reference_checkpoint
    from gdm_tpu.utils.logging import get_logger

    log = get_logger("eval")
    cfg = get_config(args.dataset, args.opt)
    refd = get_refdata(args.dataset)
    batch_size = args.batch_size or cfg.solver.val_batch_size
    dev_mesh, model_shards = _make_run_mesh(args, batch_size)
    cls_ids = [args.cls_id] if args.cls_id else list(cfg.data.obj_ids)
    targets = _load_targets(args.targets) if args.targets else None

    obj_names, diameters, models_pts, sym_rots = [], {}, {}, {}
    vsd_meshes, sym_tfs = {}, {}
    try:
        models_info = refd.load_models_info(
            osp.join(args.data_root, "models"))
    except FileNotFoundError:
        models_info = {}

    evaluator = None
    gts = {}
    # one model / one set of jits / one init serves every object: objects
    # share the architecture and shapes, so params and mesh constants are
    # plain arguments — 21-object YCB-V eval compiles once, not 21 times
    model = None
    state_template = None
    encode_mesh = infer = None
    for cls_id in cls_ids:
        _, _, mesh_fps, graph, mesh_arr = _build_object_setup(
            cfg, refd, cls_id, args.data_root)
        obj_name, diameter, pts, vsd_mesh, sym, sym_tf = \
            _eval_object_metadata(
                cfg, refd, cls_id, args.data_root, args.vsd, log,
                models_info, fallback_pts=mesh_fps[:, :3])
        obj_names.append(obj_name)
        diameters[obj_name] = diameter
        models_pts[obj_name] = pts
        if vsd_mesh is not None:
            vsd_meshes[obj_name] = vsd_mesh
        if sym is not None:
            sym_rots[obj_name] = sym
        if sym_tf is not None:
            sym_tfs[obj_name] = sym_tf

        ds = PoseDataset(cfg, cls_id, "test",
                         diameter_m=diameters[obj_name],
                         data_root=args.data_root)
        if targets is not None:
            # restrict both inference and scoring to the BOP target list
            ds.annos = _filter_targets(ds.annos, targets, cls_id)
        if len(ds) == 0:
            log.warning("no test annotations for %s%s", obj_name,
                        " (after --targets filter)" if targets else "")
            continue
        gts[obj_name] = _gts_from_annos(ds)
        if evaluator is None:
            evaluator = Evaluator(
                args.dataset, [refd.id2obj[c] for c in cls_ids],
                diameters, models_pts, sym_objs=cfg.data.sym_objs,
                sym_rots=sym_rots, output_dir=args.output_dir,
                obj2id=refd.obj2id, vsd_meshes=vsd_meshes,
                sym_transforms=sym_tfs, im_w=cfg.data.img_hw[1])

        model_i, mesh_input, mesh_xyz, needs_pyramid = _make_model(
            cfg, diameters[obj_name], mesh_fps, mesh_arr,
            exact_knn=args.exact_knn)
        if model is None:
            model = model_i        # positive_r differences are train-only
        if batch_size % jax.process_count():
            raise SystemExit(f"batch {batch_size} not divisible by "
                             f"{jax.process_count()} processes")
        host_bs = batch_size // jax.process_count()
        dl = DataLoader(ds, host_bs, shuffle=False, drop_last=False,
                        num_workers=args.num_workers,
                        rank=jax.process_index(),
                        world=jax.process_count(),
                        workers=args.loader_workers)
        mesh_input_h, mesh_xyz_h = mesh_input, mesh_xyz  # host copies
        mesh_input = replicate(mesh_input, dev_mesh)
        mesh_xyz = replicate(mesh_xyz, dev_mesh)

        state = None
        ckpt_dir = osp.join(args.ckpt_root, "checkpoints", obj_name)

        # staged jits: the batch-independent mesh features are encoded
        # once per object; per-batch programs stay small (a monolithic
        # program schedules ~3x slower on TPU) and pipeline in the queue
        mesh_feats = None

        # ICP correspondence gate follows the dataset threshold
        # convention (nn_dist_th x diameter, linemod_pbr.py:38 /
        # ycbv_pbr.py:49); traced scalar so the shared compile survives
        icp_reject = (args.icp_reject if args.icp_reject is not None
                      else cfg.data.nn_dist_th * diameters[obj_name])

        if infer is None:
            encode_mesh, infer = _make_infer_jits(
                needs_pyramid, args.knn_chunk, args.exact_knn,
                args.refine,
                sp_mesh=dev_mesh if model_shards > 1 else None)

        n_done = 0
        viz_seen = {}
        for batch, meta in dl:
            # pad the trailing partial batch to this host's compiled size
            n_real = batch["rgb_u8"].shape[0]
            batch = _pad_batch(batch, host_bs)
            fin = _device_batch(batch, dev_mesh, cfg.data.fill_depth)
            warm = False
            if state is None:
                if state_template is None:
                    # init runs in train mode (awl params), so the sample
                    # inputs need the GT keys the loss consumes; one init
                    # serves all objects (identical structure).  The
                    # optimizer must be built exactly as train() builds it
                    # (same weight_decay / skip_nonfinite wrapping): the
                    # checkpoint restore target is this state's own
                    # opt_state tree.
                    sample_inputs = _train_inputs(
                        fin, args.knn_chunk, needs_pyramid)
                    state_template = create_train_state(
                        model, jax.random.PRNGKey(0), sample_inputs,
                        mesh_input, lambda _: 1e-4,
                        tx=make_optimizer(lambda _: 1e-4,
                                          cfg.solver.weight_decay,
                                          cfg.solver.skip_nonfinite))
                state = state_template
                if args.torch_checkpoint:
                    state = load_torch_reference_checkpoint(
                        state, osp.join(args.torch_checkpoint, obj_name))
                else:
                    state, ep = load_checkpoint(state, ckpt_dir)
                    if ep is None:
                        log.warning("no checkpoint for %s in %s — "
                                    "evaluating untrained weights",
                                    obj_name, ckpt_dir)
                state = replicate(state, dev_mesh)
            if mesh_feats is None:
                mesh_feats = encode_mesh(state, mesh_input)
                warm = True
            if warm:
                # absorb the first-batch compile + the queued encode_mesh
                # so the per-frame time recorded in the CSV is a compute
                # time, not a compile time (CLAUDE.md timing gotcha)
                local_rows(infer(state, fin, mesh_input, mesh_feats,
                                 mesh_xyz, np.float32(icp_reject)))
            t0 = time.perf_counter()
            # local_rows: on multi-host runs each process fetches the
            # rows it loaded (device_get of non-addressable shards
            # raises); single-host it is a plain device_get
            poses = local_rows(
                infer(state, fin, mesh_input, mesh_feats, mesh_xyz,
                      np.float32(icp_reject)))
            # divide by the PADDED size: the device computed host_bs rows
            dt = (time.perf_counter() - t0) / host_bs
            for i in range(n_real):
                evaluator.add_prediction(
                    obj_name, meta[i]["file_name"], poses[i][:, :3],
                    poses[i][:, 3], time=dt,
                    det=int(batch["det"][i]))
                if args.save_viz:
                    fname = meta[i]["file_name"]
                    viz_seen[fname] = viz_seen.get(fname, 0) + 1
                    _save_viz(args.save_viz, obj_name,
                              fname, batch["rgb_u8"][i],
                              batch["K_crop"][i], models_pts[obj_name],
                              np.asarray(poses[i]), batch["RT"][i],
                              inst=viz_seen[fname] - 1)
            n_done += n_real
        log.info("%s: %d frames", obj_name, n_done)

    if evaluator is None:
        raise SystemExit("nothing evaluated")
    if jax.process_count() > 1:
        evaluator.gather(all_gather_host)
    if jax.process_index() == 0:
        results = evaluator.evaluate(gts)
        print(results["table"])
        return results
    return None


def _write_infer_csv(rows, args, log):
    """BOP-format results CSV shared by the per-object and stacked
    infer paths; rows = (file_name, obj_id, pose [3,4] m, dt_seconds)."""
    import os

    if not rows:
        raise SystemExit("nothing inferred (no detections matched)")
    out_csv = args.output or osp.join(
        "output", f"infer_{args.dataset}.csv")
    os.makedirs(osp.dirname(osp.abspath(out_csv)), exist_ok=True)
    lines = ["scene_id,im_id,obj_id,score,R,t,time"]
    for file_name, obj_id, pose, dt in rows:
        scene_s, im_s = file_name.split("/")[:2]
        R, t_mm = pose[:, :3], pose[:, 3] * 1000.0
        lines.append(
            f"{int(scene_s)},{int(im_s)},{obj_id},-1,"
            f"{' '.join(map(str, R.flatten().tolist()))},"
            f"{' '.join(map(str, t_mm.flatten().tolist()))},"
            f"{dt:.6f}")
    with open(out_csv, "w") as f:
        f.write("\n".join(lines))
    log.info("%d predictions -> %s", len(rows), out_csv)
    return {"csv": out_csv, "n": len(rows)}


class _MixedInferDataset:
    """Round-robin interleave of several per-object infer datasets, so
    consecutive batches MIX object classes (the stacked-routing
    workload).  Each sample gains `obj_pos`, its position in the
    stacked object axis."""

    def __init__(self, parts):
        self.parts = parts
        self.order = [(p, i)
                      for i in range(max(len(ds) for _, ds in parts))
                      for p, (_, ds) in enumerate(parts)
                      if i < len(ds)]

    def __len__(self):
        return len(self.order)

    def __getitem__(self, k):
        p, i = self.order[k]
        s = dict(self.parts[p][1][i])
        s["obj_pos"] = np.int32(p)
        return s


def _infer_stacked(args):
    """`infer --stacked`: mixed-class batches through the stacked
    multi-model path (eval/multimodel.py) — ONE jit serves every
    object; each batch element dynamic-slices its own object's weights
    and mesh constants by detected class.

    Reference analogue: cal_result_multimodel (train_lm.py:298-314)
    runs a python dict of per-object models one bs=1 forward at a time.
    The default per-object infer loop (reference semantics, ~4.5x
    faster when frames CAN be grouped by object) stays the default;
    this mode is for streams where grouping is impossible (e.g. a live
    feed of mixed detections).  Single-process, randla_spline backbone.
    """
    import jax
    import jax.numpy as jnp

    from gdm_tpu.configs.base import get_config
    from gdm_tpu.data.dataset import PoseDataset
    from gdm_tpu.data.loader import DataLoader
    from gdm_tpu.data.pipeline import assemble_inputs
    from gdm_tpu.eval.multimodel import (
        encode_stacked_mesh_feats,
        make_multi_model_infer,
        make_multi_model_infer_by_class,
        stack_trees,
    )
    from gdm_tpu.models.geomatch import MeshArrays
    from gdm_tpu.refdata import get as get_refdata
    from gdm_tpu.train import (
        create_train_state,
        load_checkpoint,
        make_optimizer,
    )
    from gdm_tpu.train.import_torch import load_torch_reference_checkpoint
    from gdm_tpu.utils.logging import get_logger

    log = get_logger("infer")
    if args.multihost or jax.process_count() > 1:
        raise SystemExit("--stacked is single-process (use the default "
                         "per-object loop for multihost runs)")
    # --refine supported since round 5: the same per-element
    # apply_refine the per-object fit runs, with a PER-OBJECT ICP gate
    # table indexed by each element's class (eval/multimodel.py)
    if getattr(args, "model_shards", 1) > 1:
        raise SystemExit("--stacked and --model-shards are exclusive")
    cfg = get_config(args.dataset, args.opt)
    if cfg.model.backbone != "randla_spline":
        raise SystemExit("--stacked requires the randla_spline backbone")
    refd = get_refdata(args.dataset)
    # full val_batch_size batches (round 5): the stacked jit scans
    # vmapped groups of <=16 elements, so the per-element weight-gather
    # temporaries are bounded at group x params regardless of batch
    # (a whole-batch vmap scaled them as batch x params and crashed the
    # XLA compile at b=128, 2026-08-20 — see eval/multimodel.py).
    batch_size = args.batch_size or cfg.solver.val_batch_size
    cls_ids = [args.cls_id] if args.cls_id else list(cfg.data.obj_ids)
    targets = _load_targets(args.targets) if args.targets else None

    # per-object setup: dataset + mesh graph + checkpointed variables
    parts, meshes, all_vars, icp_gates = [], [], [], []
    model = None
    state_template = None
    raw_keys = {"rgb_u8", "dpt_u16", "dpt_scale", "dpt_m", "K_crop",
                "choose", "det"}
    if cfg.data.fill_depth:     # see _device_batch: upload only if read
        raw_keys.add("dpt_filled")
    for cls_id in cls_ids:
        obj_name, diameter_m, mesh_fps, _, mesh_arr = _build_object_setup(
            cfg, refd, cls_id, args.data_root)
        ds = PoseDataset(cfg, cls_id, "infer", diameter_m=diameter_m,
                         data_root=args.data_root,
                         detections_file=args.detections)
        if targets is not None:
            ds.annos = _filter_targets(ds.annos, targets, cls_id)
        if len(ds) == 0:
            log.warning("no detections for %s", obj_name)
            continue
        model_i, mesh_input, _, needs_pyramid = _make_model(
            cfg, diameter_m, mesh_fps, mesh_arr, exact_knn=args.exact_knn)
        if model is None:
            model = model_i
        if state_template is None:
            from gdm_tpu.data.loader import collate
            from gdm_tpu.data.pipeline import finalize_batch

            batch0, _ = collate([ds[0]] * batch_size)
            # the template init runs train=True (losses traced), so it
            # needs the infer-mode GT placeholder keys too
            dev0 = {k: jnp.asarray(v) for k, v in batch0.items()
                    if k in raw_keys or k in (
                        "labels", "origin_labels", "match_idx",
                        "visible_flag", "RT")}
            fin0 = finalize_batch(dev0, fill_depth=cfg.data.fill_depth)
            sample_inputs = _train_inputs(fin0, args.knn_chunk,
                                          needs_pyramid)
            state_template = create_train_state(
                model, jax.random.PRNGKey(0), sample_inputs, mesh_input,
                lambda _: 1e-4,
                tx=make_optimizer(lambda _: 1e-4,
                                  cfg.solver.weight_decay,
                                  cfg.solver.skip_nonfinite))
        state = state_template
        if args.torch_checkpoint:
            state = load_torch_reference_checkpoint(
                state, osp.join(args.torch_checkpoint, obj_name))
        else:
            state, ep = load_checkpoint(
                state, osp.join(args.ckpt_root, "checkpoints", obj_name))
            if ep is None:
                log.warning("no checkpoint for %s — untrained weights",
                            obj_name)
        all_vars.append({"params": state.params,
                         "batch_stats": state.batch_stats})
        # sym_idx is a loss-only field; keep the stacked mesh uniform
        meshes.append(mesh_arr._replace(sym_idx=None))
        # per-object ICP gate (nn_dist_th x diameter convention, same
        # rule as the per-object eval loop)
        icp_gates.append(args.icp_reject if args.icp_reject is not None
                         else cfg.data.nn_dist_th * diameter_m)
        parts.append((cls_id, ds))
    if not parts:
        raise SystemExit("nothing inferred (no detections matched)")

    stacked_vars = stack_trees(all_vars)
    stacked_mesh = MeshArrays(
        *[jnp.stack([jnp.asarray(getattr(m, f)) for m in meshes])
          for f in ("xyz", "node_x", "neigh_idx", "basis", "slot")],
        sym_idx=None)
    # encode each object's mesh ONCE (the per-object loop caches this
    # too); elements gather their class's features inside the jit
    stacked_feats = encode_stacked_mesh_feats(model, all_vars, meshes)
    import math

    if getattr(args, "stacked_schedule", "by_class") == "by_class":
        # default since round 5: one b=group forward per same-class
        # run of sorted rows (2.5x the vmap schedule at the bench
        # workload; exact vs the per-object loop, test_multimodel)
        infer_fn = make_multi_model_infer_by_class(
            model, group=getattr(args, "stacked_group", 4),
            refine=args.refine)
    else:
        infer_fn = make_multi_model_infer(
            model, group=math.gcd(batch_size, 16), refine=args.refine)
    icp_table = jnp.asarray(np.asarray(icp_gates, np.float32))
    mixed = _MixedInferDataset(parts)
    dl = DataLoader(mixed, batch_size, shuffle=False, drop_last=False,
                    num_workers=args.num_workers,
                    workers=args.loader_workers)

    rows = []
    warm = False
    for batch, meta in dl:
        n_real = batch["rgb_u8"].shape[0]
        batch = _pad_batch(batch, batch_size)
        dev = {k: jnp.asarray(v) for k, v in batch.items()
               if k in raw_keys}
        from gdm_tpu.data.pipeline import finalize_batch

        fin = finalize_batch(dev, fill_depth=cfg.data.fill_depth)
        inputs = assemble_inputs(
            fin["rgb"], fin["cld_rgb_nrm"], fin["choose"],
            fin["xyz_img"], knn_chunk=args.knn_chunk,
            approx=not args.exact_knn)
        cld = fin["cld_rgb_nrm"][..., :3]
        obj_idx = jnp.asarray(batch["obj_pos"].astype(np.int32))
        det = (fin["det"].astype(jnp.float32) if "det" in fin
               else jnp.ones((batch_size,), jnp.float32))
        call = lambda: infer_fn(stacked_vars, stacked_mesh, inputs, cld,
                                obj_idx, det, icp_table,
                                mesh_feats=stacked_feats)
        if not warm:      # absorb the one compile; CSV times = compute
            np.asarray(call())
            warm = True
        t0 = time.perf_counter()
        poses = np.asarray(call())
        dt = (time.perf_counter() - t0) / batch_size
        for i in range(n_real):
            rows.append((meta[i]["file_name"],
                         parts[int(batch["obj_pos"][i])][0],
                         np.asarray(poses[i], np.float64), dt))
    return _write_infer_csv(rows, args, log)


def infer(args):
    """GT-less deployment inference: frames + detections -> results CSV.

    The reference cannot run without ground truth (its test path reads
    scene_gt.json for masks and poses even at inference,
    train_lm.py:320-373 + linemod_pbr.py:145-201).  This mode consumes
    only rgb/depth images, scene_camera intrinsics and a detection file,
    and writes the same BOP-format results CSV `eval` produces — which
    `cli score` can re-score later once GT is available (deploy now,
    audit later).

    `--stacked` routes MIXED-class batches through the vmap-stacked
    multi-model path instead of this per-object loop (_infer_stacked).
    """
    import jax

    if getattr(args, "stacked", False):
        return _infer_stacked(args)

    from gdm_tpu.configs.base import get_config
    from gdm_tpu.data.dataset import PoseDataset
    from gdm_tpu.data.loader import DataLoader
    from gdm_tpu.parallel import (
        all_gather_host,
        local_rows,
        replicate,
    )
    from gdm_tpu.refdata import get as get_refdata
    from gdm_tpu.train import (
        create_train_state,
        load_checkpoint,
        make_optimizer,
    )
    from gdm_tpu.train.import_torch import load_torch_reference_checkpoint
    from gdm_tpu.utils.logging import get_logger

    if args.multihost:
        jax.distributed.initialize()
    log = get_logger("infer")
    cfg = get_config(args.dataset, args.opt)
    refd = get_refdata(args.dataset)
    batch_size = args.batch_size or cfg.solver.val_batch_size
    dev_mesh, model_shards = _make_run_mesh(args, batch_size)
    cls_ids = [args.cls_id] if args.cls_id else list(cfg.data.obj_ids)
    if batch_size % jax.process_count():
        raise SystemExit(f"batch {batch_size} not divisible by "
                         f"{jax.process_count()} processes")
    host_bs = batch_size // jax.process_count()

    model = None
    state_template = None
    encode_mesh = infer_step = None
    targets = _load_targets(args.targets) if args.targets else None
    rows = []                       # (file_name, obj_id, pose [3,4], dt)
    for cls_id in cls_ids:
        obj_name, diameter_m, mesh_fps, _, mesh_arr = _build_object_setup(
            cfg, refd, cls_id, args.data_root)
        ds = PoseDataset(cfg, cls_id, "infer", diameter_m=diameter_m,
                         data_root=args.data_root,
                         detections_file=args.detections)
        if targets is not None:
            ds.annos = _filter_targets(ds.annos, targets, cls_id)
        if len(ds) == 0:
            log.warning("no detections for %s%s", obj_name,
                        " (after --targets filter)" if targets else "")
            continue
        model_i, mesh_input, mesh_xyz, needs_pyramid = _make_model(
            cfg, diameter_m, mesh_fps, mesh_arr,
            exact_knn=args.exact_knn)
        if model is None:
            model = model_i
        dl = DataLoader(ds, host_bs, shuffle=False, drop_last=False,
                        num_workers=args.num_workers,
                        rank=jax.process_index(),
                        world=jax.process_count(),
                        workers=args.loader_workers)
        mesh_input_h, mesh_xyz_h = mesh_input, mesh_xyz  # host copies
        mesh_input = replicate(mesh_input, dev_mesh)
        mesh_xyz = replicate(mesh_xyz, dev_mesh)
        icp_reject = (args.icp_reject if args.icp_reject is not None
                      else cfg.data.nn_dist_th * diameter_m)
        if infer_step is None:
            encode_mesh, infer_step = _make_infer_jits(
                needs_pyramid, args.knn_chunk, args.exact_knn,
                args.refine,
                sp_mesh=dev_mesh if model_shards > 1 else None)

        state = None
        mesh_feats = None
        ckpt_dir = osp.join(args.ckpt_root, "checkpoints", obj_name)
        n_done = 0
        viz_seen = {}
        for batch, meta in dl:
            n_real = batch["rgb_u8"].shape[0]
            batch = _pad_batch(batch, host_bs)
            fin = _device_batch(batch, dev_mesh, cfg.data.fill_depth)
            warm = False
            if state is None:
                if state_template is None:
                    sample_inputs = _train_inputs(
                        fin, args.knn_chunk, needs_pyramid)
                    state_template = create_train_state(
                        model, jax.random.PRNGKey(0), sample_inputs,
                        mesh_input, lambda _: 1e-4,
                        tx=make_optimizer(lambda _: 1e-4,
                                          cfg.solver.weight_decay,
                                          cfg.solver.skip_nonfinite))
                state = state_template
                if args.torch_checkpoint:
                    state = load_torch_reference_checkpoint(
                        state, osp.join(args.torch_checkpoint, obj_name))
                else:
                    state, ep = load_checkpoint(state, ckpt_dir)
                    if ep is None:
                        log.warning("no checkpoint for %s in %s — "
                                    "inferring with untrained weights",
                                    obj_name, ckpt_dir)
                state = replicate(state, dev_mesh)
            if mesh_feats is None:
                mesh_feats = encode_mesh(state, mesh_input)
                warm = True
            if warm:
                # absorb first-batch compile + queued encode_mesh so the
                # CSV time column records compute, not compile
                local_rows(infer_step(state, fin, mesh_input, mesh_feats,
                                      mesh_xyz, np.float32(icp_reject)))
            t0 = time.perf_counter()
            poses = local_rows(
                infer_step(state, fin, mesh_input, mesh_feats, mesh_xyz,
                           np.float32(icp_reject)))
            dt = (time.perf_counter() - t0) / host_bs
            for i in range(n_real):
                rows.append((meta[i]["file_name"], cls_id,
                             np.asarray(poses[i], np.float64), dt))
                if args.save_viz:
                    fname = meta[i]["file_name"]
                    viz_seen[fname] = viz_seen.get(fname, 0) + 1
                    _save_viz(args.save_viz, obj_name,
                              fname, batch["rgb_u8"][i],
                              batch["K_crop"][i], mesh_fps[:, :3],
                              np.asarray(poses[i]),
                              inst=viz_seen[fname] - 1)
            n_done += n_real
        log.info("%s: %d frames", obj_name, n_done)

    if jax.process_count() > 1:
        rows = [r for sub in all_gather_host(rows) for r in sub]
    if jax.process_index() != 0:
        return None
    return _write_infer_csv(rows, args, log)


def score(args):
    """Offline re-scoring of a BOP-format results CSV.

    Mirrors the reference's offline eval workflow (lib/pysixd/scripts/
    eval_calc_errors.py + eval_calc_scores.py, wired via
    cfg.VAL.SCRIPT_PATH, config/ycbv_cfg.py:143-152): take a results CSV
    (the file `eval` writes — scene_id,im_id,obj_id,score,R,t[mm],time),
    recompute every pose error against the dataset GT, and print/dump
    the same metric table the online evaluator produces (incl. --vsd).

    --targets restricts scoring to a BOP test-targets JSON
    (test_targets_bop19.json: [{scene_id, im_id, obj_id, inst_count}]),
    the eval_pose_results_more.py --targets_filename protocol — GT
    frames and predictions outside the target list are both ignored.
    """
    from gdm_tpu.data.dataset import PoseDataset
    from gdm_tpu.configs.base import get_config
    from gdm_tpu.eval.evaluator import Evaluator
    from gdm_tpu.refdata import get as get_refdata
    from gdm_tpu.utils.logging import get_logger

    log = get_logger("score")
    cfg = get_config(args.dataset, args.opt)
    refd = get_refdata(args.dataset)
    cls_ids = [args.cls_id] if args.cls_id else list(cfg.data.obj_ids)
    try:
        models_info = refd.load_models_info(
            osp.join(args.data_root, "models"))
    except FileNotFoundError:
        models_info = {}

    targets = _load_targets(args.targets) if args.targets else None

    diameters, models_pts, sym_rots, vsd_meshes, gts = {}, {}, {}, {}, {}
    sym_tfs = {}
    for cls_id in cls_ids:
        obj_name, diameter, pts, vsd_mesh, sym, sym_tf = \
            _eval_object_metadata(
                cfg, refd, cls_id, args.data_root, args.vsd, log,
                models_info)
        diameters[obj_name] = diameter
        models_pts[obj_name] = pts
        if vsd_mesh is not None:
            vsd_meshes[obj_name] = vsd_mesh
        if sym is not None:
            sym_rots[obj_name] = sym
        if sym_tf is not None:
            sym_tfs[obj_name] = sym_tf
        ds = PoseDataset(cfg, cls_id, "test",
                         diameter_m=diameter, data_root=args.data_root)
        if targets is not None:
            ds.annos = _filter_targets(ds.annos, targets, cls_id)
            if len(ds) == 0:
                log.info("%s: no targeted frames — skipped", obj_name)
                continue
        gts[obj_name] = _gts_from_annos(ds)

    if not gts:
        raise SystemExit("no GT frames to score (targets filtered "
                         "everything out?)")
    evaluator = Evaluator(
        args.dataset, list(gts), diameters, models_pts,
        sym_objs=cfg.data.sym_objs, sym_rots=sym_rots,
        output_dir=args.output_dir, obj2id=refd.obj2id,
        vsd_meshes=vsd_meshes, sym_transforms=sym_tfs,
        im_w=cfg.data.img_hw[1])

    # BOP results may carry several hypotheses per (scene, image, object)
    # ranked by the score column; keep the best-scored one
    best = {}
    with open(args.csv) as f:
        header = f.readline()
        if not header.strip().startswith("scene_id"):
            raise SystemExit(
                f"{args.csv}: expected a BOP results CSV starting with a "
                f"'scene_id,...' header, got: {header.strip()[:60]!r}")
        for line in f:
            parts = line.strip().split(",")
            if len(parts) < 7:
                continue
            scene, im, obj_id = parts[0], parts[1], int(parts[2])
            if obj_id not in refd.id2obj:
                continue
            s = float(parts[3])
            if (targets is not None
                    and (int(scene), int(im), obj_id) not in targets):
                continue
            key = (obj_id, int(scene), int(im))
            if key not in best or s > best[key][0]:
                best[key] = (s, parts)
    if not best:
        raise SystemExit(f"no result rows parsed from {args.csv}")
    for (obj_id, scene, im), (_, parts) in best.items():
        R = np.array([float(x) for x in parts[4].split()],
                     np.float64).reshape(3, 3)
        t = np.array([float(x) for x in parts[5].split()],
                     np.float64) / 1000.0
        evaluator.add_prediction(
            refd.id2obj[obj_id], f"{scene:06d}/{im:06d}", R, t,
            time=float(parts[6]))
    results = evaluator.evaluate(gts)
    print(results["table"])
    return results


def export_serving(args):
    """Serialize one object's inference path as an AOT serving artifact.

    Deployment story the reference lacks: its serving host re-runs
    `train_lm.py -state=eval` with the whole repo + torch + compiled
    extensions on board.  Here `gdm_tpu.serve.load_artifact(dir)` on a
    bare jax install replays the exact traced programs (see
    gdm_tpu/serve.py).
    """
    import jax
    import jax.numpy as jnp

    from gdm_tpu.configs.base import get_config
    from gdm_tpu.data.pipeline import finalize_batch
    from gdm_tpu.refdata import get as get_refdata
    from gdm_tpu.serve import export_serving_artifact, raw_input_spec
    from gdm_tpu.train import (
        create_train_state,
        load_checkpoint,
        make_optimizer,
    )
    from gdm_tpu.train.import_torch import load_torch_reference_checkpoint
    from gdm_tpu.utils.logging import get_logger

    log = get_logger("export-serving")
    cfg = get_config(args.dataset, args.opt)
    refd = get_refdata(args.dataset)
    cls_id = args.cls_id
    batch = args.batch_size or cfg.solver.val_batch_size
    im = cfg.data.input_size
    n_pts = cfg.data.num_sample_points
    n_mesh = cfg.model.n_mesh_node

    obj_name, diameter, mesh_fps, _, mesh_arr = _build_object_setup(
        cfg, refd, cls_id, args.data_root)
    model, mesh_input, mesh_xyz, needs_pyramid = _make_model(
        cfg, diameter, mesh_fps, mesh_arr, exact_knn=args.exact_knn)
    icp_reject = (args.icp_reject if args.icp_reject is not None
                  else cfg.data.nn_dist_th * diameter)

    # zero-filled raw batch derived from the SAME spec the artifact is
    # traced against (serve.raw_input_spec) with the SAME non-degenerate
    # dpt/K fills the serve daemon's warmup uses (serve.synthetic_raw),
    # so a loader-contract change cannot desynchronise the init shapes
    # or fills from the exported program.
    from gdm_tpu.serve import synthetic_raw

    raw_spec = raw_input_spec(batch, im, n_pts, cfg.data.fill_depth,
                              with_det=False)
    raw = {k: jnp.asarray(v) for k, v in synthetic_raw(raw_spec).items()}
    raw.update({                       # GT-only extras init also traces
        "labels": jnp.zeros((batch, n_pts), jnp.int32),
        "origin_labels": jnp.zeros((batch, n_pts), jnp.int32),
        "match_idx": jnp.zeros((batch, n_pts), jnp.int32),
        "visible_flag": jnp.zeros((batch, n_mesh), jnp.uint8),
        "RT": jnp.tile(jnp.eye(3, 4, dtype=jnp.float32), (batch, 1, 1)),
    })
    fin = finalize_batch(raw, fill_depth=cfg.data.fill_depth)
    sample_inputs = _train_inputs(fin, args.knn_chunk, needs_pyramid)
    state = create_train_state(
        model, jax.random.PRNGKey(0), sample_inputs, mesh_input,
        lambda _: 1e-4,
        tx=make_optimizer(lambda _: 1e-4, cfg.solver.weight_decay,
                          cfg.solver.skip_nonfinite))
    if args.torch_checkpoint:
        state = load_torch_reference_checkpoint(
            state, osp.join(args.torch_checkpoint, obj_name))
    else:
        ckpt_dir = osp.join(args.ckpt_root, "checkpoints", obj_name)
        state, ep = load_checkpoint(state, ckpt_dir)
        if ep is None:
            raise SystemExit(f"no checkpoint for {obj_name} in "
                             f"{ckpt_dir} — refusing to export "
                             "untrained weights")

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    mesh_feats = state.apply_fn(variables, mesh_input, train=False,
                                method="encode_mesh")
    out_dir = args.out or osp.join("serving", args.dataset, obj_name)
    info = export_serving_artifact(
        out_dir,
        apply_fn=state.apply_fn, variables=variables,
        mesh_input=mesh_input, mesh_feats=mesh_feats, mesh_xyz=mesh_xyz,
        raw_spec=raw_input_spec(batch, im, n_pts, cfg.data.fill_depth),
        fill_depth=cfg.data.fill_depth, needs_pyramid=needs_pyramid,
        knn_chunk=args.knn_chunk, exact_knn=args.exact_knn,
        refine=args.refine, icp_reject=icp_reject,
        platforms=tuple(p.strip() for p in args.platforms.split(",")
                        if p.strip()),
        meta={"dataset": args.dataset, "obj_name": obj_name,
              "cls_id": cls_id, "diameter_m": diameter})
    log.info("exported %s -> %s (platforms %s)", obj_name, out_dir,
             info["platforms"])
    return info


def serve_cmd(args):
    """Long-running HTTP pose service over exported AOT artifacts.

    Deployment surface the reference lacks entirely (its "serving" is
    re-running train_lm.py -state=eval over a directory): load per-object
    artifacts once, then answer POST /pose requests until killed.  See
    gdm_tpu/server.py for the wire protocol.
    """
    from gdm_tpu.server import PoseService, load_artifact_tree, make_server
    from gdm_tpu.utils.logging import get_logger

    log = get_logger("serve")
    try:
        artifacts = load_artifact_tree(args.artifact)
    except (ValueError, OSError) as e:     # bad name, missing/non-dir path
        raise SystemExit(str(e))
    for name, art in sorted(artifacts.items()):
        log.info("loaded %s (batch %d, platforms %s)", name,
                 next(iter(art.meta["raw_spec"].values()))[0][0],
                 ",".join(art.platforms))
    service = PoseService(artifacts)
    if not args.no_warmup:
        log.info("warming up %d object(s)...", len(artifacts))
        service.warmup()
    server = make_server(service, args.host, args.port)
    host, port = server.server_address[:2]
    log.info("serving %d object(s) on http://%s:%d  "
             "(POST /pose, GET /healthz, GET /meta)",
             len(artifacts), host, port)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        log.info("shutting down")
    finally:
        server.server_close()


def build_parser():
    p = argparse.ArgumentParser("gdm_tpu")
    sub = p.add_subparsers(dest="command", required=True)

    def common(sp):
        sp.add_argument("--dataset", required=True,
                        choices=["lmo", "lmfull", "lm_full", "ycbv"])
        sp.add_argument("--data-root", required=True)
        sp.add_argument("--ckpt-root", default="train_log")
        sp.add_argument("--batch-size", type=int, default=None)
        sp.add_argument("--num-workers", type=int, default=8)
        sp.add_argument("--loader-workers", choices=["thread", "process"],
                        default="thread",
                        help="decode worker kind (data.loader.DataLoader):"
                             " threads (PIL/cv2/scipy release the GIL) or"
                             " processes (when per-sample python overhead"
                             " dominates)")
        sp.add_argument("--knn-chunk", type=int, default=1024)
        sp.add_argument("--seed", type=int, default=0)
        sp.add_argument("--devices", type=int, default=None,
                        help="use only the first N local devices "
                             "(reference --gpus, train_lm.py:78-82); "
                             "default: all devices of the active "
                             "platform")
        sp.add_argument("--multihost", action="store_true")
        sp.add_argument("--opt", action="append", default=[],
                        metavar="SECTION.FIELD=VALUE",
                        help="config override, repeatable (e.g. "
                             "model.gather_bwd_dtype=bfloat16)")
        sp.add_argument("--profile-dir", default=None,
                        help="write a jax.profiler trace here "
                             "(inspect with xprof/TensorBoard)")

    t = sub.add_parser("train", help="train per-object models")
    common(t)
    t.add_argument("--cls-id", required=True,
                   help="object id, or 'all' to train every object in the "
                        "config sequentially (one shared compile)")
    t.add_argument("--epochs", type=int, default=None)
    t.add_argument("--resume", action="store_true")
    t.add_argument("--pretrained-backbone", default=None,
                   help="torchvision resnet .pth/.npz: ImageNet init for "
                        "the CNN branch (the reference's pretrained=True; "
                        "overrides model.pretrained_backbone)")
    t.add_argument("--eval-every", type=int, default=None,
                   help="validate on the test split every N epochs "
                        "(ADD(-S) recall@0.1d + VOC AUC, logged to the "
                        "console and the metrics JSONL; single-host "
                        "only; skipped when no test split exists)")
    t.add_argument("--model-shards", type=int, default=1,
                   help="shard the matching-loss mesh columns over a "
                        "'model' mesh axis of this size (2-D (data, "
                        "model) mesh; bounds the [B*N, M] similarity "
                        "tensor per chip — the memory limit at lmfull "
                        "shapes; randla_spline backbone only)")

    e = sub.add_parser("eval", help="evaluate checkpoints on the test set")
    common(e)
    e.add_argument("--cls-id", type=int, default=None,
                   help="single object (default: all in config)")
    e.add_argument("--refine", choices=["ransac", "icp", "meanshift"],
                   default=None)
    e.add_argument("--icp-reject", type=float, default=None,
                   help="ICP correspondence gate in metres (default: "
                        "nn_dist_th x object diameter, the dataset "
                        "threshold convention)")
    e.add_argument("--output-dir", default="output")
    e.add_argument("--torch-checkpoint", default=None,
                   help="directory of reference .pth.tar checkpoints to "
                        "import instead of native orbax checkpoints")
    e.add_argument("--vsd", action="store_true",
                   help="also compute the BOP VSD metric (device-side "
                        "renders; needs models_eval PLYs with faces)")
    e.add_argument("--targets", default=None,
                   help="BOP test-targets JSON — evaluate only the "
                        "listed (scene, im, obj) instances (skips "
                        "inference on everything else)")
    e.add_argument("--exact-knn", action="store_true",
                   help="exact top-k for the aggregation KNN pyramid "
                        "(~7x slower; measured no pose-accuracy gain)")
    e.add_argument("--save-viz", default=None, metavar="DIR",
                   help="write per-frame pose-overlay PNGs (prediction "
                        "green, GT blue) onto the input crops")
    e.add_argument("--model-shards", type=int, default=1,
                   help="shard the mesh columns of the similarity "
                        "argmax over a 'model' mesh axis of this size "
                        "(2-D (data, model) device mesh; for meshes too "
                        "large for one chip — parallel/sp.py)")

    i = sub.add_parser(
        "infer", help="GT-less deployment inference: rgb/depth + "
                      "detections -> BOP results CSV (re-scorable "
                      "later with `score`)")
    common(i)
    i.add_argument("--cls-id", type=int, default=None,
                   help="single object (default: all in config)")
    i.add_argument("--detections", default=None,
                   help="detection JSON (default: "
                        "<subset>/real_det.json)")
    i.add_argument("--output", default=None,
                   help="results CSV path (default: "
                        "output/infer_<dataset>.csv)")
    i.add_argument("--refine", choices=["ransac", "icp", "meanshift"],
                   default=None)
    i.add_argument("--icp-reject", type=float, default=None,
                   help="ICP correspondence gate in metres (default: "
                        "nn_dist_th x object diameter)")
    i.add_argument("--torch-checkpoint", default=None,
                   help="directory of reference .pth.tar checkpoints to "
                        "import instead of native orbax checkpoints")
    i.add_argument("--exact-knn", action="store_true")
    i.add_argument("--save-viz", default=None, metavar="DIR",
                   help="write per-frame pose-overlay PNGs (prediction "
                        "only — no GT in infer mode)")
    i.add_argument("--targets", default=None,
                   help="BOP test-targets JSON — infer only the listed "
                        "(scene, im, obj) instances")
    i.add_argument("--stacked", action="store_true",
                   help="route MIXED-class batches through the "
                        "stacked multi-model path (one jit serves "
                        "every object; eval/multimodel.py) instead of "
                        "the per-object loop — for streams where "
                        "grouping frames by object is impossible")
    i.add_argument("--stacked-schedule", default="by_class",
                   choices=("by_class", "vmap"),
                   help="stacked routing schedule: by_class sorts rows "
                        "by class inside the jit and runs one batched "
                        "forward per same-class group (287 vs 116 fps "
                        "at the b=16/4-object bench workload); vmap = "
                        "a b=1 forward per element")
    i.add_argument("--stacked-group", type=int, default=4,
                   help="rows per grouped forward in the by_class "
                        "schedule (padding waste is <group per present "
                        "class; 4 measured best at ~4 rows/class)")
    i.add_argument("--model-shards", type=int, default=1,
                   help="shard the similarity argmax's mesh columns "
                        "over a 'model' mesh axis of this size")

    s = sub.add_parser(
        "score", help="offline re-scoring of a BOP results CSV "
                      "(reference lib/pysixd offline eval workflow)")
    common(s)
    s.add_argument("--csv", required=True,
                   help="results CSV (the gt_<dataset>-test.csv that "
                        "`eval` writes)")
    s.add_argument("--cls-id", type=int, default=None)
    s.add_argument("--output-dir", default=None)
    s.add_argument("--vsd", action="store_true")
    s.add_argument("--targets", default=None,
                   help="BOP test-targets JSON (test_targets_bop19.json) "
                        "— score only the listed (scene, im, obj) "
                        "instances, the eval_pose_results_more.py "
                        "--targets_filename protocol")

    x = sub.add_parser(
        "export-serving",
        help="serialize one object's inference path (preprocess + "
             "forward + pose fit, weights baked) as an AOT jax.export "
             "artifact loadable with gdm_tpu.serve on a bare jax "
             "install")
    common(x)
    x.add_argument("--cls-id", type=int, required=True)
    x.add_argument("--out", default=None,
                   help="artifact directory (default: "
                        "serving/<dataset>/<obj>)")
    x.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated lowering targets")
    x.add_argument("--refine", choices=["ransac", "icp", "meanshift"],
                   default=None)
    x.add_argument("--icp-reject", type=float, default=None)
    x.add_argument("--torch-checkpoint", default=None,
                   help="import reference .pth.tar checkpoints instead "
                        "of native orbax checkpoints")
    x.add_argument("--exact-knn", action="store_true")

    v = sub.add_parser(
        "serve",
        help="HTTP pose service over exported AOT artifacts: load once, "
             "answer POST /pose (npz in, npz poses out) until killed")
    v.add_argument("--artifact", action="append", required=True,
                   metavar="DIR",
                   help="artifact directory (from export-serving), or a "
                        "root whose subdirectories are artifacts; "
                        "repeatable")
    v.add_argument("--host", default="127.0.0.1")
    v.add_argument("--port", type=int, default=8360)
    v.add_argument("--no-warmup", action="store_true",
                   help="skip the synthetic warmup batch per object "
                        "(first real request then pays the compile)")
    v.add_argument("--profile-dir", default=None, help=argparse.SUPPRESS)
    return p


def main(argv=None):
    from gdm_tpu.utils.logging import profiler_trace

    args = build_parser().parse_args(argv)
    with profiler_trace(args.profile_dir):
        if args.command == "train":
            return train(args)
        if args.command == "score":
            return score(args)
        if args.command == "infer":
            return infer(args)
        if args.command == "export-serving":
            return export_serving(args)
        if args.command == "serve":
            return serve_cmd(args)
        return evaluate(args)


if __name__ == "__main__":
    main()
