"""CLI driver end-to-end: train one epoch on the fabricated mini BOP
dataset, checkpoint, then evaluate the checkpoint through the full eval
path (detections, pose fit on device, metric table)."""

import os.path as osp

import numpy as np
import pytest

import conftest  # noqa: F401


class TestConfigOverrides:
    def test_opt_overrides_typed(self):
        import pytest

        from gdm_tpu.configs.base import get_config

        c = get_config("lmo", ["model.gather_bwd_dtype=bfloat16",
                               "solver.train_batch_size=16",
                               "data.fill_depth=true"])
        assert c.model.gather_bwd_dtype == "bfloat16"
        assert c.solver.train_batch_size == 16
        assert c.data.fill_depth is True
        # presets are immutable
        assert get_config("lmo").model.gather_bwd_dtype == "float32"
        # tuple overrides cast elements with the existing element type
        c2 = get_config("lmo", ["model.randla_d_out=16,32,64,128",
                                "data.sym_objs=ape,can"])
        assert c2.model.randla_d_out == (16, 32, 64, 128)
        assert c2.data.sym_objs == ("ape", "can")
        with pytest.raises(AttributeError):
            get_config("lmo", ["model.no_such_field=1"])
        with pytest.raises(ValueError):
            get_config("lmo", ["not_an_assignment"])
        # bool typos are rejected loudly, not silently False
        with pytest.raises(ValueError, match="not a boolean"):
            get_config("lmo", ["data.fill_depth=Ture"])
        assert get_config("lmo", ["data.fill_depth=no"]) \
            .data.fill_depth is False
        # overrides of None-valued (Optional) fields get typed values
        c3 = get_config("lmo", ["data.real_pbr_mix=0.7"])
        assert c3.data.real_pbr_mix == pytest.approx(0.7)
        assert isinstance(c3.data.real_pbr_mix, float)
import test_data  # reuse the mini BOP fixture builder
from test_data import IM_H, IM_W, IN_SIZE, N_MESH, N_SAMPLE, bop_root  # noqa: F401

from gdm_tpu import cli


@pytest.fixture(scope="module")
def mini_preset(monkeypatch_module, bop_root):  # noqa: F811
    cfg = test_data._mini_config()
    from gdm_tpu.configs import base as cfg_base

    monkeypatch_module.setitem(cfg_base._PRESETS, "lmo", cfg)
    return cfg


@pytest.fixture(scope="module")
def monkeypatch_module():
    from _pytest.monkeypatch import MonkeyPatch

    mp = MonkeyPatch()
    yield mp
    mp.undo()


@pytest.mark.slow
def test_train_model_shards_matches_dense(mini_preset, bop_root,  # noqa: F811
                                          tmp_path_factory):
    """`cli train --model-shards 2` (2-D (data=1, model=2) mesh — the
    matching loss through parallel.sp.sharded_matching_loss) must
    reproduce the N=1 run's first-step metrics.  Same seed => same
    batch and init; the sharded-vs-dense MATCHING loss is exact to f32
    reduction order (match_loss rel 1e-3; the math itself is pinned
    tighter in test_sp.py).  seg/total get a looser 2e-2: the approx
    KNN pyramid's neighbour picks are layout-dependent (CLAUDE.md:
    approx_max_k PartialReduce), and the (1,2) vs (2,) mesh changes
    layouts — measured seg drift 0.56% from different-but-equal-recall
    neighbour sets, NOT from the sharded loss (VERDICT r3 item 4)."""
    import json

    def run(shards, root):
        cli.main([
            "train", "--dataset", "lmo", "--data-root", bop_root,
            "--ckpt-root", root, "--cls-id", "1", "--epochs", "1",
            "--batch-size", "2", "--devices", "2", "--num-workers", "2",
            "--knn-chunk", "64", "--model-shards", str(shards),
        ])
        with open(osp.join(root, "metrics", "ape.jsonl")) as f:
            return [json.loads(line) for line in f]

    base = run(1, str(tmp_path_factory.mktemp("ck_dense")))
    sp = run(2, str(tmp_path_factory.mktemp("ck_sp")))
    r0b = next(r for r in base if r.get("it") == 0)
    r0s = next(r for r in sp if r.get("it") == 0)
    assert r0s["match_loss"] == pytest.approx(r0b["match_loss"],
                                              rel=1e-3)
    assert r0s["seg_loss"] == pytest.approx(r0b["seg_loss"], rel=2e-2)
    assert r0s["loss"] == pytest.approx(r0b["loss"], rel=2e-2)


@pytest.mark.slow
def test_train_then_eval(mini_preset, bop_root, tmp_path_factory):  # noqa: F811
    ckpt_root = str(tmp_path_factory.mktemp("ckpt"))
    out_dir = str(tmp_path_factory.mktemp("out"))

    state = cli.main([
        "train", "--dataset", "lmo", "--data-root", bop_root,
        "--ckpt-root", ckpt_root, "--cls-id", "1", "--epochs", "1",
        "--batch-size", "2", "--devices", "2", "--num-workers", "2", "--knn-chunk", "64",
        "--eval-every", "1",
    ])
    assert state is not None
    ckpt_dir = osp.join(ckpt_root, "checkpoints", "ape")
    assert osp.exists(osp.join(ckpt_dir, "latest"))
    with open(osp.join(ckpt_dir, "latest")) as f:
        assert f.read().strip() == "epoch_0000"
    # observability: JSONL metrics stream with train records and the
    # --eval-every validation record (ADD AUC on the test split)
    import json

    with open(osp.join(ckpt_root, "metrics", "ape.jsonl")) as f:
        recs = [json.loads(line) for line in f]
    assert any("loss" in r and "samples_per_sec" in r for r in recs)
    val = [r for r in recs if "val_add_auc" in r]
    assert val and val[-1]["val_frames"] == 4
    assert 0.0 <= val[-1]["val_add_auc"] <= 100.0

    # --resume picks up from the latest checkpoint (train_lm.py:118-146
    # parity): asking for 2 epochs after 1 is done trains exactly one
    # more and advances the latest pointer
    state = cli.main([
        "train", "--dataset", "lmo", "--data-root", bop_root,
        "--ckpt-root", ckpt_root, "--cls-id", "1", "--epochs", "2",
        "--batch-size", "2", "--devices", "2", "--num-workers", "2",
        "--knn-chunk", "64", "--resume",
    ])
    assert osp.exists(osp.join(ckpt_dir, "epoch_0001"))
    with open(osp.join(ckpt_dir, "latest")) as f:
        assert f.read().strip() == "epoch_0001"

    viz_dir = str(tmp_path_factory.mktemp("viz"))
    results = cli.main([
        "eval", "--dataset", "lmo", "--data-root", bop_root,
        "--ckpt-root", ckpt_root, "--cls-id", "1", "--batch-size", "2", "--devices", "2",
        "--num-workers", "2", "--knn-chunk", "64",
        "--output-dir", out_dir, "--vsd", "--save-viz", viz_dir,
    ])
    assert "ape" in results["recalls"]
    # qualitative overlays: one PNG per frame, green prediction over the
    # input crop (+ blue GT)
    import glob

    pngs = glob.glob(osp.join(viz_dir, "ape_*.png"))
    assert len(pngs) == 4, pngs
    # all 4 test frames got a prediction row
    assert len(results["errors"]["ape"]["ad"]) == 4
    # --vsd: device-rendered VSD computed per frame from models_eval ply
    assert len(results["errors"]["ape"]["vsd"]) == 4
    # per-tau error vectors, all in [0, 1]
    assert all(np.all((e >= 0.0) & (e <= 1.0))
               for e in results["errors"]["ape"]["vsd"])
    assert "vsd" in results["table"]
    # BOP19 average-recall rows (vsd present -> combined AR too)
    ar = results["bop19_ar"]["ape"]
    assert set(ar) == {"ar_vsd", "ar_mssd", "ar_mspd", "bop19_ar"}
    assert "bop19_ar" in results["table"]
    # artifacts written
    assert osp.exists(osp.join(out_dir, "_lmo_tab.txt"))
    assert osp.exists(osp.join(out_dir, "gt_lmo-test.csv"))
    with open(osp.join(out_dir, "gt_lmo-test.csv")) as f:
        lines = f.read().strip().split("\n")
    assert len(lines) == 5  # header + 4 frames

    # offline re-scoring of the CSV reproduces the online metrics
    scored = cli.main([
        "score", "--dataset", "lmo", "--data-root", bop_root,
        "--csv", osp.join(out_dir, "gt_lmo-test.csv"), "--vsd"])
    for m in ("ad_10", "re_5", "te_5", "proj_5"):
        assert scored["recalls"]["ape"][m] == \
            results["recalls"]["ape"][m], m
    assert scored["errors"]["ape"]["ad"] == pytest.approx(
        results["errors"]["ape"]["ad"], abs=1e-9)
    assert np.asarray(scored["errors"]["ape"]["vsd"]) == pytest.approx(
        np.asarray(results["errors"]["ape"]["vsd"]), abs=1e-6)
    assert scored["bop19_ar"]["ape"]["bop19_ar"] == pytest.approx(
        results["bop19_ar"]["ape"]["bop19_ar"], abs=1e-9)

    # multi-hypothesis CSVs: a junk pose with a LOWER score must lose to
    # the original row (BOP results may carry several ranked hypotheses)
    csv2 = osp.join(out_dir, "multi.csv")
    with open(osp.join(out_dir, "gt_lmo-test.csv")) as f:
        rows = f.read().strip().split("\n")
    junk = rows[1].split(",")
    junk[3] = "-99"                       # worse score
    junk[5] = "0 0 9999"                  # garbage translation
    with open(csv2, "w") as f:
        f.write("\n".join(rows + [",".join(junk)]))
    scored2 = cli.main([
        "score", "--dataset", "lmo", "--data-root", bop_root,
        "--csv", csv2])
    assert scored2["errors"]["ape"]["ad"] == pytest.approx(
        results["errors"]["ape"]["ad"], abs=1e-9)

    # --- checkpoint-VALUE parity rehearsal (VERDICT r1 item 2) --------
    # Export the just-trained weights as a reference-format .pth.tar
    # (train_lm.py:102-154 layout), then evaluate THROUGH the torch
    # import path (--torch-checkpoint, train_lm.py:118-146 counterpart).
    # Identical metrics prove the import/eval harness is value-faithful:
    # once real reference checkpoints/data exist, this exact command is
    # the only remaining step.
    import os

    import jax
    import torch

    from gdm_tpu.train.import_torch import export_state_dict

    params = jax.device_get(state.params)
    stats = jax.device_get(state.batch_stats)
    sd = export_state_dict(params, stats)
    tdir = str(tmp_path_factory.mktemp("torch_ckpt"))
    os.makedirs(osp.join(tdir, "ape"))
    torch.save(
        {"epoch": 1,
         "model_state": {k: torch.from_numpy(np.ascontiguousarray(v))
                         for k, v in sd.items()}},
        osp.join(tdir, "ape", "geomatch.pth.tar"))

    results_t = cli.main([
        "eval", "--dataset", "lmo", "--data-root", bop_root,
        "--ckpt-root", str(tmp_path_factory.mktemp("ck_unused")),
        "--cls-id", "1", "--batch-size", "2", "--devices", "2", "--num-workers", "2",
        "--knn-chunk", "64",
        "--output-dir", str(tmp_path_factory.mktemp("out_t")),
        "--torch-checkpoint", tdir,
    ])
    assert results_t["auc"]["ape"] == pytest.approx(
        results["auc"]["ape"], abs=1e-6)
    assert results_t["errors"]["ape"]["ad"] == pytest.approx(
        results["errors"]["ape"]["ad"], abs=1e-7)
    for m in ("ad_10", "re_5", "te_5", "proj_5", "mssd_0.2"):
        assert results_t["recalls"]["ape"][m] == \
            results["recalls"]["ape"][m], m

    # --- model-axis sharded similarity argmax (--model-shards) --------
    # parallel/sp.py reachable from the CLI (VERDICT r2 item 4): a 2-D
    # (data=1, model=2) device mesh shards the mesh columns of the
    # correspondence argmax (sharded_cosine_argmax, exact jnp.argmax
    # tie-break) — the metrics must reproduce the dense N=1 path.
    results_sp = cli.main([
        "eval", "--dataset", "lmo", "--data-root", bop_root,
        "--ckpt-root", ckpt_root, "--cls-id", "1", "--batch-size", "2",
        "--devices", "2", "--num-workers", "2", "--knn-chunk", "64",
        "--output-dir", str(tmp_path_factory.mktemp("out_sp")),
        "--model-shards", "2",
    ])
    assert results_sp["errors"]["ape"]["ad"] == pytest.approx(
        results["errors"]["ape"]["ad"], abs=1e-6)
    for m in ("ad_10", "re_5", "te_5", "proj_5"):
        assert results_sp["recalls"]["ape"][m] == \
            results["recalls"]["ape"][m], m

    # --- GT-less deployment inference (cli infer) ---------------------
    # Same checkpoint, but the dataset path reads ONLY rgb/depth/
    # scene_camera + detections (no scene_gt, no masks).  Re-scoring the
    # infer CSV against GT must reproduce the online eval metrics: the
    # deterministic per-index sampling makes the predictions identical.
    infer_csv = osp.join(str(tmp_path_factory.mktemp("inf")), "poses.csv")
    inf = cli.main([
        "infer", "--dataset", "lmo", "--data-root", bop_root,
        "--ckpt-root", ckpt_root, "--cls-id", "1", "--batch-size", "2",
        "--devices", "2", "--num-workers", "2", "--knn-chunk", "64",
        "--output", infer_csv,
    ])
    assert inf["n"] == 4 and osp.exists(infer_csv)
    scored_inf = cli.main([
        "score", "--dataset", "lmo", "--data-root", bop_root,
        "--csv", infer_csv])
    assert scored_inf["errors"]["ape"]["ad"] == pytest.approx(
        results["errors"]["ape"]["ad"], abs=1e-7)
    for m in ("ad_10", "re_5", "te_5", "proj_5"):
        assert scored_inf["recalls"]["ape"][m] == \
            results["recalls"]["ape"][m], m

    # --- AOT serving artifact (cli export-serving + gdm_tpu.serve) ----
    # The serialized programs carry the SAME checkpoint; replaying the
    # test split's raw loader batches through the artifact must
    # reproduce the poses the eval CSV recorded.
    from gdm_tpu import serve
    from gdm_tpu.data.dataset import PoseDataset
    from gdm_tpu.data.loader import DataLoader as GDMLoader
    from gdm_tpu.refdata import get as get_refdata

    sv_dir = osp.join(str(tmp_path_factory.mktemp("sv")), "art")
    info = cli.main([
        "export-serving", "--dataset", "lmo", "--data-root", bop_root,
        "--ckpt-root", ckpt_root, "--cls-id", "1", "--batch-size", "2",
        "--knn-chunk", "64", "--out", sv_dir, "--platforms", "cpu",
    ])
    assert info["obj_name"] == "ape" and info["needs_pyramid"]
    art = serve.load_artifact(sv_dir)
    refd = get_refdata("lmo")
    ds = PoseDataset(mini_preset, 1, "test",
                     diameter_m=refd.diameters_mm_by_id[1] / 1000.0,
                     data_root=bop_root)
    raw_keys = set(art.meta["raw_spec"])
    got = []
    for batch, _ in GDMLoader(ds, 2, shuffle=False, drop_last=False,
                              num_workers=2):
        poses = np.asarray(art.run(
            {k: v for k, v in batch.items() if k in raw_keys}))
        got.extend(poses)
    with open(osp.join(out_dir, "gt_lmo-test.csv")) as f:
        csv_rows = f.read().strip().split("\n")[1:]
    assert len(got) == len(csv_rows) == 4
    for pose, row in zip(got, csv_rows):
        parts = row.split(",")
        R_csv = np.fromstring(parts[4], sep=" ").reshape(3, 3)
        t_csv = np.fromstring(parts[5], sep=" ") / 1000.0
        np.testing.assert_allclose(pose[:, :3], R_csv, atol=1e-4)
        np.testing.assert_allclose(pose[:, 3], t_csv, atol=1e-5)


@pytest.fixture(scope="module")
def bop_root_2obj(tmp_path_factory):
    """Mini BOP root with TWO objects (alternating frames)."""
    import json

    from PIL import Image

    from gdm_tpu.data.synthetic import make_object

    root = str(tmp_path_factory.mktemp("mini_bop2"))
    rng = np.random.RandomState(7)
    meshes = {1: test_data.make_object(N_MESH, rng, radius=0.05),
              2: make_object(N_MESH, rng, radius=0.06)}
    import os

    os.makedirs(osp.join(root, "kps"))
    for oid, mesh in meshes.items():
        np.save(osp.join(root, "kps", f"obj_{oid:06d}_fps.npy"), mesh)

    K = np.array([[140.0, 0, IM_W / 2], [0, 140.0, IM_H / 2], [0, 0, 1]],
                 np.float32)
    for subset in ("train_pbr", "test"):
        sdir = osp.join(root, subset, "000000")
        for sub in ("rgb", "depth", "mask_visib"):
            os.makedirs(osp.join(sdir, sub))
        ext = "jpg" if subset == "train_pbr" else "png"
        gt, gt_info, cams, det = {}, {}, {}, {}
        lines = []
        for i in range(4):
            oid = 1 + (i % 2)
            R = np.linalg.qr(rng.randn(3, 3))[0]
            if np.linalg.det(R) < 0:
                R[:, 0] *= -1
            t = np.array([0.0, 0.0, 0.5])
            pose = np.hstack([R, t[:, None]]).astype(np.float32)
            rgb, depth, mask, bbox = test_data._render_frame(
                meshes[oid], pose, K)
            Image.fromarray(rgb).save(
                osp.join(sdir, f"rgb/{i:06d}.{ext}"), quality=95)
            Image.fromarray(depth).save(
                osp.join(sdir, f"depth/{i:06d}.png"))
            Image.fromarray(mask).save(
                osp.join(sdir, f"mask_visib/{i:06d}_000000.png"))
            gt[str(i)] = [{"obj_id": oid, "cam_R_m2c": R.ravel().tolist(),
                           "cam_t_m2c": (t * 1000).tolist()}]
            gt_info[str(i)] = [{"bbox_obj": bbox,
                                "px_count_visib": int((mask > 0).sum())}]
            cams[str(i)] = {"cam_K": K.ravel().tolist(),
                            "depth_scale": 0.1}
            x1, y1, w, h = bbox
            det[f"0/{i}"] = {str(oid): [
                {"score": 0.9, "bbox": [x1, y1, x1 + w, y1 + h]}]}
            lines.append(f"000000/{i:06d}")
        for name, obj in (("scene_gt", gt), ("scene_gt_info", gt_info),
                          ("scene_camera", cams)):
            with open(osp.join(sdir, f"{name}.json"), "w") as f:
                json.dump(obj, f)
        with open(osp.join(root, subset, "train.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
        with open(osp.join(root, subset, "real_det.json"), "w") as f:
            json.dump(det, f)
    return root


def test_build_object_setup_units(mini_preset, bop_root):
    """The CLI mesh-graph path must keep metre scale: build_mesh_graph
    consumes the npy layout (mm) while load_or_build_fps_mesh returns
    metres — mixing them divided xyz by 1000 twice, silently shrinking
    the mesh 1000x on every real-data run (degenerate loss positives,
    biased fitted translations)."""
    from gdm_tpu.cli import _build_object_setup
    from gdm_tpu.refdata import get as get_refdata

    obj, diam, mesh_fps, graph, mesh_arr = _build_object_setup(
        mini_preset, get_refdata("lmo"), 1, bop_root)
    ext = float(np.abs(mesh_fps[:, :3]).max())
    assert 0.01 < ext < 1.0                   # metre-scale object
    np.testing.assert_allclose(np.asarray(graph.xyz), mesh_fps[:, :3],
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(mesh_arr.xyz),
                               mesh_fps[:, :3], rtol=1e-5, atol=1e-7)
    # node features carry the same metre xyz in columns 3:6
    np.testing.assert_allclose(np.asarray(graph.node_x)[:, 3:6],
                               mesh_fps[:, :3], rtol=1e-5, atol=1e-7)


def test_filter_targets_unit(tmp_path):
    """The shared BOP-targets helpers eval/infer/score all route through."""
    import json

    from gdm_tpu.cli import _filter_targets, _load_targets

    class R:
        def __init__(self, fn):
            self.file_name = fn

    annos = [R("000000/000001"), R("000000/000002"), R("000001/000001")]
    t = {(0, 1, 5), (1, 1, 5)}
    out = _filter_targets(annos, t, 5)
    assert [r.file_name for r in out] == ["000000/000001",
                                          "000001/000001"]
    assert _filter_targets(annos, t, 6) == []

    p = tmp_path / "t.json"
    p.write_text(json.dumps(
        [{"scene_id": 0, "im_id": 1, "obj_id": 5, "inst_count": 1}]))
    assert _load_targets(str(p)) == {(0, 1, 5)}
    p.write_text("[]")
    with pytest.raises(SystemExit, match="no targets"):
        _load_targets(str(p))


def test_score_targets(mini_preset, bop_root, tmp_path):
    """--targets restricts offline scoring to a BOP test-targets JSON
    (the eval_pose_results_more.py --targets_filename protocol)."""
    import json

    with open(osp.join(bop_root, "test", "000000", "scene_gt.json")) as f:
        gt = json.load(f)
    rows = ["scene_id,im_id,obj_id,score,R,t,time"]
    for i in sorted(gt, key=int):
        g = gt[i][0]
        t_mm = list(g["cam_t_m2c"])
        t_mm[0] += 1.5 * int(i)       # distinct per-frame ad errors
        rows.append(
            f"0,{i},1,-1,{' '.join(str(x) for x in g['cam_R_m2c'])},"
            f"{' '.join(str(x) for x in t_mm)},0.0")
    csv = tmp_path / "near_perfect.csv"
    csv.write_text("\n".join(rows))

    full = cli.main(["score", "--dataset", "lmo", "--data-root", bop_root,
                     "--csv", str(csv)])
    assert len(full["errors"]["ape"]["ad"]) == 4
    assert full["recalls"]["ape"]["ad_10"] == [1.0] * 4  # <= 4.5 mm offsets

    tjson = tmp_path / "targets.json"
    tjson.write_text(json.dumps([
        {"scene_id": 0, "im_id": 0, "obj_id": 1, "inst_count": 1},
        {"scene_id": 0, "im_id": 2, "obj_id": 1, "inst_count": 1},
    ]))
    part = cli.main(["score", "--dataset", "lmo", "--data-root", bop_root,
                     "--csv", str(csv), "--targets", str(tjson)])
    # only the targeted frames scored, in GT order
    assert part["errors"]["ape"]["ad"] == pytest.approx(
        [full["errors"]["ape"]["ad"][0], full["errors"]["ape"]["ad"][2]])
    assert part["recalls"]["ape"]["ad_10"] == [1.0] * 2

    # targets that match nothing -> explicit failure, not a 0-frame table
    none = tmp_path / "none.json"
    none.write_text(json.dumps(
        [{"scene_id": 9, "im_id": 0, "obj_id": 1, "inst_count": 1}]))
    with pytest.raises(SystemExit, match="no GT frames"):
        cli.main(["score", "--dataset", "lmo", "--data-root", bop_root,
                  "--csv", str(csv), "--targets", str(none)])


def test_eval_two_objects_shares_compile(monkeypatch_module, bop_root_2obj,
                                         tmp_path_factory):
    """Multi-object eval: one init/jit set serves both objects and the
    metric table covers both."""
    import dataclasses

    from gdm_tpu.configs import base as cfg_base

    cfg = test_data._mini_config()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, obj_ids=(1, 2)))
    monkeypatch_module.setitem(cfg_base._PRESETS, "lmo", cfg)

    results = cli.main([
        "eval", "--dataset", "lmo", "--data-root", bop_root_2obj,
        "--ckpt-root", str(tmp_path_factory.mktemp("ck2")),
        "--batch-size", "2", "--devices", "2", "--num-workers", "2", "--knn-chunk", "64",
        "--output-dir", str(tmp_path_factory.mktemp("out2")),
    ])
    assert set(results["recalls"].keys()) == {"ape", "benchvise"}
    assert len(results["errors"]["ape"]["ad"]) == 2
    assert len(results["errors"]["benchvise"]["ad"]) == 2


@pytest.mark.slow
def test_train_all_objects(monkeypatch_module, bop_root_2obj,
                           tmp_path_factory):
    """--cls-id all trains both objects sequentially with one shared
    compiled step, producing a checkpoint per object."""
    import dataclasses

    from gdm_tpu.configs import base as cfg_base

    cfg = test_data._mini_config()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, obj_ids=(1, 2)))
    monkeypatch_module.setitem(cfg_base._PRESETS, "lmo", cfg)

    ckpt_root = str(tmp_path_factory.mktemp("ck_all"))
    cli.main([
        "train", "--dataset", "lmo", "--data-root", bop_root_2obj,
        "--ckpt-root", ckpt_root, "--cls-id", "all", "--epochs", "1",
        "--batch-size", "2", "--devices", "2", "--num-workers", "2", "--knn-chunk", "64",
    ])
    for obj in ("ape", "benchvise"):
        assert osp.exists(
            osp.join(ckpt_root, "checkpoints", obj, "latest")), obj

    # --- stacked multimodel routing (infer --stacked, VERDICT r3
    # weak 1): the SAME trained checkpoints through (a) the default
    # per-object loop and (b) the vmap-stacked mixed-batch path must
    # produce the same prediction set with matching poses.  On the CPU
    # f32 platform the stacked routing is exact (test_multimodel pins
    # zero argmax/seg flips), so poses agree to fp reduction order
    # through the Kabsch fit; compared as max mesh-point displacement.
    def read_csv(path):
        rows = {}
        with open(path) as f:
            for line in f.read().strip().split("\n")[1:]:
                p = line.split(",")
                key = (int(p[0]), int(p[1]), int(p[2]))
                R = np.fromstring(p[4], sep=" ").reshape(3, 3)
                t = np.fromstring(p[5], sep=" ") / 1000.0
                rows[key] = (R, t)
        return rows

    inf_dir = str(tmp_path_factory.mktemp("inf2"))
    common = ["infer", "--dataset", "lmo", "--data-root", bop_root_2obj,
              "--ckpt-root", ckpt_root, "--batch-size", "2",
              "--num-workers", "2", "--knn-chunk", "64"]
    per_csv = osp.join(inf_dir, "per.csv")
    st_csv = osp.join(inf_dir, "stacked.csv")
    cli.main(common + ["--devices", "2", "--output", per_csv])
    cli.main(common + ["--stacked", "--output", st_csv])
    per, st = read_csv(per_csv), read_csv(st_csv)
    assert set(per) == set(st) and len(per) == 4
    assert {k[2] for k in st} == {1, 2}        # genuinely mixed classes
    mesh_pts = {oid: np.load(osp.join(
        bop_root_2obj, "kps", f"obj_{oid:06d}_fps.npy"))[:, :3] / 1000.0
        for oid in (1, 2)}
    for key in per:
        (R1, t1), (R2, t2) = per[key], st[key]
        pts = mesh_pts[key[2]]
        disp = np.linalg.norm(
            (pts @ R1.T + t1) - (pts @ R2.T + t2), axis=1).max()
        assert disp < 1e-3, (key, disp)


@pytest.mark.slow
def test_train_model_shards_dgcnn_matches_dense(monkeypatch_module,
                                                bop_root,  # noqa: F811
                                                tmp_path_factory):
    """`cli train --model-shards 2` on the DGCNN backbone (round 5:
    the r4 exclusion lifted — sp.sharded_matching_loss now carries the
    depth-scaled per-column radius + e0 pad) reproduces the N=1 run's
    first-step metrics.  Same tolerance rationale as the flagship
    variant of this test: match_loss is exact to f32 reduction order;
    seg/total absorb approx-KNN layout drift."""
    import dataclasses
    import json

    from gdm_tpu.configs import base as cfg_base

    cfg = test_data._mini_config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, backbone="dgcnn"))
    monkeypatch_module.setitem(cfg_base._PRESETS, "lmo", cfg)

    def run(shards, root):
        cli.main([
            "train", "--dataset", "lmo", "--data-root", bop_root,
            "--ckpt-root", root, "--cls-id", "1", "--epochs", "1",
            "--batch-size", "2", "--devices", "2", "--num-workers", "2",
            "--model-shards", str(shards),
        ])
        with open(osp.join(root, "metrics", "ape.jsonl")) as f:
            return [json.loads(line) for line in f]

    base = run(1, str(tmp_path_factory.mktemp("dgck_dense")))
    sp = run(2, str(tmp_path_factory.mktemp("dgck_sp")))
    r0b = next(r for r in base if r.get("it") == 0)
    r0s = next(r for r in sp if r.get("it") == 0)
    assert r0s["match_loss"] == pytest.approx(r0b["match_loss"],
                                              rel=1e-3)
    assert r0s["seg_loss"] == pytest.approx(r0b["seg_loss"], rel=2e-2)
    assert r0s["loss"] == pytest.approx(r0b["loss"], rel=2e-2)


def test_train_then_eval_dgcnn(monkeypatch_module, bop_root,
                               tmp_path_factory):  # noqa: F811
    """The DGCNN backbone variant drives through the same CLI."""
    import dataclasses

    from gdm_tpu.configs import base as cfg_base

    cfg = test_data._mini_config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, backbone="dgcnn"))
    monkeypatch_module.setitem(cfg_base._PRESETS, "lmo", cfg)

    ckpt_root = str(tmp_path_factory.mktemp("ckpt_dg"))
    state = cli.main([
        "train", "--dataset", "lmo", "--data-root", bop_root,
        "--ckpt-root", ckpt_root, "--cls-id", "1", "--epochs", "1",
        "--batch-size", "2", "--devices", "2", "--num-workers", "2",
    ])
    assert state is not None
    out_dir = str(tmp_path_factory.mktemp("out_dg"))
    results = cli.main([
        "eval", "--dataset", "lmo", "--data-root", bop_root,
        "--ckpt-root", ckpt_root, "--cls-id", "1", "--batch-size", "2", "--devices", "2",
        "--num-workers", "2",
        "--output-dir", out_dir,
    ])
    assert len(results["errors"]["ape"]["ad"]) == 4

    # --- AOT serving artifact on the DGCNN backbone ------------------
    # Same contract as the flagship artifact test above: replaying the
    # test split's raw batches through the exported program reproduces
    # the poses the eval CSV recorded (no KNN pyramid in this variant —
    # needs_pyramid must export False).
    from gdm_tpu import serve
    from gdm_tpu.data.dataset import PoseDataset
    from gdm_tpu.data.loader import DataLoader as GDMLoader
    from gdm_tpu.refdata import get as get_refdata

    sv_dir = osp.join(str(tmp_path_factory.mktemp("sv_dg")), "art")
    info = cli.main([
        "export-serving", "--dataset", "lmo", "--data-root", bop_root,
        "--ckpt-root", ckpt_root, "--cls-id", "1", "--batch-size", "2",
        "--out", sv_dir, "--platforms", "cpu",
    ])
    assert info["obj_name"] == "ape" and not info["needs_pyramid"]
    art = serve.load_artifact(sv_dir)
    refd = get_refdata("lmo")
    ds = PoseDataset(cfg, 1, "test",
                     diameter_m=refd.diameters_mm_by_id[1] / 1000.0,
                     data_root=bop_root)
    raw_keys = set(art.meta["raw_spec"])
    got = []
    for batch, _ in GDMLoader(ds, 2, shuffle=False, drop_last=False,
                              num_workers=2):
        poses = np.asarray(art.run(
            {k: v for k, v in batch.items() if k in raw_keys}))
        got.extend(poses)
    with open(osp.join(out_dir, "gt_lmo-test.csv")) as f:
        csv_rows = f.read().strip().split("\n")[1:]
    assert len(got) == len(csv_rows) == 4
    for pose, row in zip(got, csv_rows):
        parts = row.split(",")
        R_csv = np.fromstring(parts[4], sep=" ").reshape(3, 3)
        t_csv = np.fromstring(parts[5], sep=" ") / 1000.0
        np.testing.assert_allclose(pose[:, :3], R_csv, atol=1e-4)
        np.testing.assert_allclose(pose[:, 3], t_csv, atol=1e-5)
