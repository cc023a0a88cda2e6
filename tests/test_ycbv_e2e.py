"""YCB-V config driven END TO END through the CLI (VERDICT r4 item 2).

Every ycbv-specific mechanism was unit-tested (test_ycbv_paths) but no
test chained `cli train --dataset ycbv` -> `eval` -> `infer`/`score`
until round 5.  This file fabricates a ycbv-SHAPED miniature BOP tree —
train_real (mm depth counts) + train_pbr (depth_scale counts) +
train_synt (photometric noise + real-background paste) + test — with a
symmetric object (024_bowl: continuous z symmetry in models_info.json,
sym matching loss + ADD-S eval) and a non-symmetric one (025_mug), and
drives the full surface: real/pbr sampling mix, background paste, crop
depth fill, sym-aware train loss, ADD-S + BOP19-AR (incl. VSD) eval,
GT-less infer + offline score, and stacked mixed-class infer.

Reference: train_ycb.py:1-495 (the YCB-V driver),
ycbv_pbr.py:352-387 (add_real_back), :477-506 (crop fill + normals),
:643 (nn_dist_th x diameter), :663-690 (real/pbr mix).
"""

import json
import os
import os.path as osp

import numpy as np
import pytest
from PIL import Image

import conftest  # noqa: F401  (forces CPU platform)
import test_data
from test_data import IM_H, IM_W, N_MESH, N_SAMPLE  # noqa: F401

from gdm_tpu import cli
from gdm_tpu.configs.base import Config, DataConfig, ModelConfig, \
    SolverConfig

IN_SIZE = 64
BOWL, MUG = 13, 14                       # 024_bowl (sym), 025_mug


def _mini_ycbv_config():
    return Config(
        data=DataConfig(
            name="ycbv", obj_ids=(BOWL, MUG), img_hw=(IM_H, IM_W),
            model_pt_num=N_MESH, num_sample_points=N_SAMPLE,
            input_size=IN_SIZE,
            train_subsets=("train_real", "train_pbr", "train_synt"),
            # nn_dist_th x diameter is the ycbv GT-match rule
            # (ycbv_pbr.py:643); 0.1 keeps the threshold above the mini
            # tree's 3-px splat quantisation (~10 mm at z=0.45/f=140)
            nn_dist_th=0.1,
            sym_objs=("024_bowl",),
            real_pbr_mix=0.8,
            fill_depth=True),
        model=ModelConfig(n_mesh_node=N_MESH, neighbor_dis_th=0.06),
        solver=SolverConfig())


@pytest.fixture(scope="module")
def ycbv_root(tmp_path_factory):
    """Miniature ycbv-shaped BOP tree: one scene per object per subset.

    Depth counts follow the reference's per-subset scaling
    (ycbv_pbr.py:190,429-433 / bop._img_type): real + synt frames store
    millimetres (loader divides by 1000), pbr + test store
    depth_scale=0.1 counts (loader divides by depth_factor=10000).
    """
    from scipy.spatial import ConvexHull

    from gdm_tpu.data.ply import write_ply
    from gdm_tpu.data.synthetic import make_object

    root = str(tmp_path_factory.mktemp("mini_ycbv"))
    rng = np.random.RandomState(11)
    meshes = {BOWL: make_object(N_MESH, rng, radius=0.05),
              MUG: make_object(N_MESH, rng, radius=0.06)}
    os.makedirs(osp.join(root, "kps"))
    os.makedirs(osp.join(root, "models_eval"))
    os.makedirs(osp.join(root, "models"))
    info = {}
    for oid, mesh in meshes.items():
        np.save(osp.join(root, "kps", f"obj_{oid:06d}_fps.npy"), mesh)
        hull = ConvexHull(mesh[:, :3])
        write_ply(osp.join(root, "models_eval", f"obj_{oid:06d}.ply"),
                  mesh[:, :3], faces=hull.simplices)
        d = float(np.linalg.norm(
            mesh[None, :, :3] - mesh[:, None, :3], axis=-1).max())
        info[str(oid)] = {"diameter": d}
    # the bowl's continuous z symmetry drives symmetry_transform ->
    # sym_idx on the mesh graph -> the sym branch of the matching loss
    info[str(BOWL)]["symmetries_continuous"] = [
        {"axis": [0, 0, 1], "offset": [0, 0, 0]}]
    with open(osp.join(root, "models", "models_info.json"), "w") as f:
        json.dump(info, f)

    K = np.array([[140.0, 0, IM_W / 2], [0, 140.0, IM_H / 2], [0, 0, 1]],
                 np.float32)
    for subset in ("train_real", "train_pbr", "train_synt", "test"):
        mm_counts = subset in ("train_real", "train_synt")
        ext = "jpg" if subset == "train_pbr" else "png"
        lines, det = [], {}
        for scene_id, oid in enumerate(meshes):
            sdir = osp.join(root, subset, f"{scene_id:06d}")
            for sub in ("rgb", "depth", "mask_visib"):
                os.makedirs(osp.join(sdir, sub))
            gt, gt_info, cams = {}, {}, {}
            for i in range(4):
                R = np.linalg.qr(rng.randn(3, 3))[0]
                if np.linalg.det(R) < 0:
                    R[:, 0] *= -1
                t = np.array([0.0, 0.0, 0.45 + 0.04 * i])
                pose = np.hstack([R, t[:, None]]).astype(np.float32)
                rgb, depth, mask, bbox = test_data._render_frame(
                    meshes[oid], pose, K)
                if mm_counts:       # _render_frame wrote 0.1mm counts
                    depth = (depth / 10).astype(np.uint16)
                Image.fromarray(rgb).save(
                    osp.join(sdir, f"rgb/{i:06d}.{ext}"), quality=95)
                Image.fromarray(depth).save(
                    osp.join(sdir, f"depth/{i:06d}.png"))
                Image.fromarray(mask).save(
                    osp.join(sdir, f"mask_visib/{i:06d}_000000.png"))
                gt[str(i)] = [{"obj_id": oid,
                               "cam_R_m2c": R.ravel().tolist(),
                               "cam_t_m2c": (t * 1000).tolist()}]
                gt_info[str(i)] = [{
                    "bbox_obj": bbox,
                    "px_count_visib": int((mask > 0).sum())}]
                cams[str(i)] = {
                    "cam_K": K.ravel().tolist(),
                    "depth_scale": 1.0 if mm_counts else 0.1}
                x1, y1, w, h = bbox
                det[f"{scene_id}/{i}"] = {str(oid): [
                    {"score": 0.9, "bbox": [x1, y1, x1 + w, y1 + h]}]}
                lines.append(f"{scene_id:06d}/{i:06d}")
            for name, obj in (("scene_gt", gt),
                              ("scene_gt_info", gt_info),
                              ("scene_camera", cams)):
                with open(osp.join(sdir, f"{name}.json"), "w") as f:
                    json.dump(obj, f)
        with open(osp.join(root, subset, "train.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
        with open(osp.join(root, subset, "real_det.json"), "w") as f:
            json.dump(det, f)
    return root


@pytest.fixture(scope="module")
def ycbv_preset(monkeypatch_module):
    cfg = _mini_ycbv_config()
    from gdm_tpu.configs import base as cfg_base

    monkeypatch_module.setitem(cfg_base._PRESETS, "ycbv", cfg)
    return cfg


@pytest.fixture(scope="module")
def monkeypatch_module():
    from _pytest.monkeypatch import MonkeyPatch

    mp = MonkeyPatch()
    yield mp
    mp.undo()


def test_ycbv_dataset_mechanisms(ycbv_preset, ycbv_root):
    """Fast (no-jit) check that the tree drives every ycbv-specific
    host mechanism: subset classing + depth scaling, real/pbr mix,
    synt background paste, crop fill (dpt_filled shipped), and the
    symmetry chain models_info.json -> sym_idx on the mesh graph."""
    from gdm_tpu.data.dataset import PoseDataset
    from gdm_tpu.refdata import get as get_refdata

    refd = get_refdata("ycbv")
    assert refd.id2obj[BOWL] == "024_bowl"
    ds = PoseDataset(ycbv_preset, BOWL, "train",
                     diameter_m=refd.diameters_mm_by_id[BOWL] / 1000.0,
                     data_root=ycbv_root, rng=np.random.RandomState(0))
    # subset classing: real+synt records vs pbr records, mix active
    assert len(ds.real_annos) == 8 and len(ds.pbr_annos) == 4
    assert ds.mix_real == pytest.approx(0.8)
    assert ds.add_noise and ds.fill_depth
    # ycbv GT-match rule: nn_dist_th x diameter (ycbv_pbr.py:643)
    assert ds.gt_match_th_m == pytest.approx(
        0.1 * refd.diameters_mm_by_id[BOWL] / 1000.0)
    # depth scaling per subset: real/synt divide by 1000, pbr by 1e4
    by_type = {r.img_type for r in ds.real_annos}
    assert by_type == {"real", "synt"}
    s = ds.get_item(ds.pbr_annos[0], rng=np.random.RandomState(1))
    assert s is not None and s["dpt_scale"] == pytest.approx(10000.0)
    sr = ds.get_item(
        [r for r in ds.real_annos if r.img_type == "real"][0],
        rng=np.random.RandomState(1))
    assert sr is not None and sr["dpt_scale"] == pytest.approx(1000.0)
    # same physical depth either way (the scene z range)
    for it in (s, sr):
        z = it["dpt_u16"][it["dpt_u16"] > 0] / it["dpt_scale"]
        assert 0.3 < float(np.median(z)) < 0.8
    # fill path ships the filled plane
    assert "dpt_filled" in s and s["dpt_filled"].dtype == np.float32
    # the synt paste path runs (real backgrounds exist) and stays valid
    ss = ds.get_item(
        [r for r in ds.real_annos if r.img_type == "synt"][0],
        rng=np.random.RandomState(2))
    assert ss is not None and (ss["labels"] > 0).any()
    # epoch mix: ~80% of train picks are real/synt records
    rng = np.random.RandomState(3)
    picks = [ds._pick_record(i % len(ds), rng) for i in range(400)]
    frac_real = np.mean([p.img_type != "pbr" for p in picks])
    assert 0.7 < frac_real < 0.9

    # symmetry chain: models_info.json continuous z-sym -> sym_idx
    from gdm_tpu.cli import _build_object_setup

    _, _, _, graph, _ = _build_object_setup(
        ycbv_preset, refd, BOWL, ycbv_root)
    sym_idx = np.asarray(graph.sym_idx)
    assert sym_idx.shape == (N_MESH,)
    assert (sym_idx != np.arange(N_MESH)).any()     # nontrivial mapping
    _, _, _, graph_mug, _ = _build_object_setup(
        ycbv_preset, refd, MUG, ycbv_root)
    # non-sym object: no sym mapping at all
    assert graph_mug.sym_idx is None


@pytest.mark.slow
def test_ycbv_train_eval_infer_score(ycbv_preset, ycbv_root,
                                     tmp_path_factory):
    """The full YCB-V chain: train --cls-id all (mix + paste + fill +
    sym matching loss) -> eval --vsd (ADD-S for the bowl, BOP19 AR) ->
    infer -> score == eval, + stacked mixed-class infer == per-object."""
    ckpt_root = str(tmp_path_factory.mktemp("yck"))
    out_dir = str(tmp_path_factory.mktemp("yout"))

    cli.main([
        "train", "--dataset", "ycbv", "--data-root", ycbv_root,
        "--ckpt-root", ckpt_root, "--cls-id", "all", "--epochs", "1",
        "--batch-size", "2", "--devices", "2", "--num-workers", "2",
        "--knn-chunk", "64", "--eval-every", "1",
    ])
    for obj in ("024_bowl", "025_mug"):
        assert osp.exists(
            osp.join(ckpt_root, "checkpoints", obj, "latest")), obj
    # metrics stream carries train + validation records per object
    with open(osp.join(ckpt_root, "metrics", "024_bowl.jsonl")) as f:
        recs = [json.loads(line) for line in f]
    assert any("loss" in r for r in recs)
    val = [r for r in recs if "val_add_auc" in r]
    assert val and val[-1]["val_frames"] == 4
    assert 0.0 <= val[-1]["val_add_auc"] <= 100.0

    results = cli.main([
        "eval", "--dataset", "ycbv", "--data-root", ycbv_root,
        "--ckpt-root", ckpt_root, "--batch-size", "2", "--devices", "2",
        "--num-workers", "2", "--knn-chunk", "64",
        "--output-dir", out_dir, "--vsd",
    ])
    for obj in ("024_bowl", "025_mug"):
        assert obj in results["recalls"]
        assert len(results["errors"][obj]["ad"]) == 4
        assert len(results["errors"][obj]["vsd"]) == 4
        assert 0.0 <= results["auc"][obj] <= 100.0
        ar = results["bop19_ar"][obj]
        assert set(ar) == {"ar_vsd", "ar_mssd", "ar_mspd", "bop19_ar"}
    # the bowl is evaluated with ADD-S (closest-point): its ad error
    # must be <= the plain ADD recomputed from the CSV poses
    csv = osp.join(out_dir, "gt_ycbv-test.csv")
    assert osp.exists(csv)

    scored = cli.main([
        "score", "--dataset", "ycbv", "--data-root", ycbv_root,
        "--csv", csv, "--vsd"])
    for obj in ("024_bowl", "025_mug"):
        assert scored["errors"][obj]["ad"] == pytest.approx(
            results["errors"][obj]["ad"], abs=1e-9)
        assert scored["bop19_ar"][obj]["bop19_ar"] == pytest.approx(
            results["bop19_ar"][obj]["bop19_ar"], abs=1e-9)

    # ADD-S sanity: recompute both ADD and ADD-S for the bowl from the
    # CSV; the evaluator's recorded ad error must equal ADD-S
    from gdm_tpu.eval.metrics import add_err, adi_err

    mesh_pts = np.load(osp.join(
        ycbv_root, "kps", f"obj_{BOWL:06d}_fps.npy"))[:, :3] / 1000.0
    with open(csv) as f:
        rows = [r.split(",") for r in f.read().strip().split("\n")[1:]]
    gt = {}
    with open(osp.join(ycbv_root, "test", "000000",
                       "scene_gt.json")) as f:
        for fid, anns in json.load(f).items():
            gt[int(fid)] = anns[0]
    checked = 0
    for p in rows:
        if int(p[2]) != BOWL:
            continue
        R_pred = np.fromstring(p[4], sep=" ").reshape(3, 3)
        t_pred = np.fromstring(p[5], sep=" ") / 1000.0
        ann = gt[int(p[1])]
        R_gt = np.asarray(ann["cam_R_m2c"]).reshape(3, 3)
        t_gt = np.asarray(ann["cam_t_m2c"]) / 1000.0
        adi = adi_err(R_pred, t_pred, R_gt, t_gt, mesh_pts)
        add = add_err(R_pred, t_pred, R_gt, t_gt, mesh_pts)
        i = checked
        assert results["errors"]["024_bowl"]["ad"][i] == \
            pytest.approx(adi, abs=1e-6)
        assert adi <= add + 1e-9
        checked += 1
    assert checked == 4

    # GT-less infer reproduces eval exactly, then stacked == per-object
    inf_dir = str(tmp_path_factory.mktemp("yinf"))
    per_csv = osp.join(inf_dir, "per.csv")
    st_csv = osp.join(inf_dir, "stacked.csv")
    common = ["infer", "--dataset", "ycbv", "--data-root", ycbv_root,
              "--ckpt-root", ckpt_root, "--batch-size", "2",
              "--num-workers", "2", "--knn-chunk", "64"]
    inf = cli.main(common + ["--devices", "2", "--output", per_csv])
    assert inf["n"] == 8
    scored_inf = cli.main([
        "score", "--dataset", "ycbv", "--data-root", ycbv_root,
        "--csv", per_csv])
    for obj in ("024_bowl", "025_mug"):
        assert scored_inf["errors"][obj]["ad"] == pytest.approx(
            results["errors"][obj]["ad"], abs=1e-7)

    cli.main(common + ["--stacked", "--output", st_csv])

    def read_csv(path):
        rows = {}
        with open(path) as f:
            for line in f.read().strip().split("\n")[1:]:
                p = line.split(",")
                rows[(int(p[0]), int(p[1]), int(p[2]))] = (
                    np.fromstring(p[4], sep=" ").reshape(3, 3),
                    np.fromstring(p[5], sep=" ") / 1000.0)
        return rows

    per, st = read_csv(per_csv), read_csv(st_csv)
    assert set(per) == set(st) and len(per) == 8
    assert {k[2] for k in st} == {BOWL, MUG}       # mixed classes
    meshes = {oid: np.load(osp.join(
        ycbv_root, "kps", f"obj_{oid:06d}_fps.npy"))[:, :3] / 1000.0
        for oid in (BOWL, MUG)}
    for key in per:
        (R1, t1), (R2, t2) = per[key], st[key]
        pts = meshes[key[2]]
        disp = np.linalg.norm(
            (pts @ R1.T + t1) - (pts @ R2.T + t2), axis=1).max()
        assert disp < 1e-3, (key, disp)
