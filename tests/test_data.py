"""BOP data-layer tests: index building, dataset __getitem__, loader,
device finalize_batch, PLY IO.

Fabricates a miniature BOP-format dataset on disk (scene_gt/scene_gt_info/
scene_camera JSONs + png frames rendered from a known object at a known
pose) and checks the host pipeline reproduces the reference contract
(SURVEY.md section 2b) end to end.
"""

import json
import os
import os.path as osp

import numpy as np
import pytest
from PIL import Image

import conftest  # noqa: F401  (forces CPU platform)
from gdm_tpu.configs.base import Config, DataConfig, ModelConfig, \
    SolverConfig
from gdm_tpu.data.bop import aug_bbox_dzi, build_index, load_detections
from gdm_tpu.data.dataset import PoseDataset
from gdm_tpu.data.loader import DataLoader, collate
from gdm_tpu.data.pipeline import finalize_batch
from gdm_tpu.data.ply import load_ply, mesh_fps_from_ply, write_ply
from gdm_tpu.data.synthetic import make_object

IM_H, IM_W = 120, 160
N_MESH = 128
N_SAMPLE = 256
IN_SIZE = 64


def _render_frame(mesh_fps, pose, K):
    pts = mesh_fps[:, :3] / 1000.0
    cam = pts @ pose[:, :3].T + pose[:, 3]
    z = cam[:, 2]
    u = np.clip((cam[:, 0] * K[0, 0] / z + K[0, 2]).astype(int), 0, IM_W - 1)
    v = np.clip((cam[:, 1] * K[1, 1] / z + K[1, 2]).astype(int), 0, IM_H - 1)
    depth = np.zeros((IM_H, IM_W), np.uint16)
    rgb = np.full((IM_H, IM_W, 3), 90, np.uint8)
    mask = np.zeros((IM_H, IM_W), np.uint8)
    for du in range(3):
        for dv in range(3):
            uu = np.clip(u + du, 0, IM_W - 1)
            vv = np.clip(v + dv, 0, IM_H - 1)
            depth[vv, uu] = (z * 10000).astype(np.uint16)  # scale 0.1mm
            rgb[vv, uu] = mesh_fps[:, 3:6].astype(np.uint8)
            mask[vv, uu] = 255
    bbox = [int(u.min()), int(v.min()),
            int(u.max() - u.min() + 3), int(v.max() - v.min() + 3)]
    return rgb, depth, mask, bbox


@pytest.fixture(scope="module")
def bop_root(tmp_path_factory):
    return build_mini_bop_root(str(tmp_path_factory.mktemp("mini_bop")))


def build_mini_bop_root(root):
    """Fabricate the miniature single-object BOP tree at `root` (plain
    function so subprocess workers — e.g. the multihost train smoke —
    can build it without pytest fixtures)."""
    rng = np.random.RandomState(3)
    mesh = make_object(N_MESH, rng, radius=0.05)
    os.makedirs(osp.join(root, "kps"))
    np.save(osp.join(root, "kps", "obj_000001_fps.npy"), mesh)

    # models_eval PLY with faces (hull) so the --vsd path has a render
    # mesh (BOP-style, millimetres); also round-trips our write_ply faces
    from scipy.spatial import ConvexHull

    from gdm_tpu.data.ply import write_ply

    hull = ConvexHull(mesh[:, :3])
    os.makedirs(osp.join(root, "models_eval"))
    write_ply(osp.join(root, "models_eval", "obj_000001.ply"),
              mesh[:, :3], faces=hull.simplices)

    K = np.array([[140.0, 0, IM_W / 2], [0, 140.0, IM_H / 2], [0, 0, 1]],
                 np.float32)
    n_frames = 4
    for subset in ("train_pbr", "test"):
        sdir = osp.join(root, subset, "000000")
        for sub in ("rgb", "depth", "mask_visib"):
            os.makedirs(osp.join(sdir, sub))
        gt, gt_info, cams, det = {}, {}, {}, {}
        lines = []
        ext = "jpg" if subset == "train_pbr" else "png"
        for i in range(n_frames):
            R = np.linalg.qr(rng.randn(3, 3))[0]
            if np.linalg.det(R) < 0:
                R[:, 0] *= -1
            t = np.array([0.0, 0.0, 0.45 + 0.05 * i])
            pose = np.hstack([R, t[:, None]]).astype(np.float32)
            rgb, depth, mask, bbox = _render_frame(mesh, pose, K)
            Image.fromarray(rgb).save(
                osp.join(sdir, f"rgb/{i:06d}.{ext}"), quality=95)
            Image.fromarray(depth).save(osp.join(sdir, f"depth/{i:06d}.png"))
            Image.fromarray(mask).save(
                osp.join(sdir, f"mask_visib/{i:06d}_000000.png"))
            gt[str(i)] = [{
                "obj_id": 1,
                "cam_R_m2c": (R.ravel()).tolist(),
                "cam_t_m2c": (t * 1000).tolist(),
            }]
            gt_info[str(i)] = [{
                "bbox_obj": bbox,
                "px_count_visib": int((mask > 0).sum()),
            }]
            cams[str(i)] = {"cam_K": K.ravel().tolist(), "depth_scale": 0.1}
            x1, y1, w, h = bbox
            det[f"0/{i}"] = {"1": [
                {"score": 0.4, "bbox": [0, 0, 5, 5]},
                {"score": 0.9, "bbox": [x1, y1, x1 + w, y1 + h]},
            ]}
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


def _mini_config():
    return Config(
        data=DataConfig(
            name="lmo", obj_ids=(1,), img_hw=(IM_H, IM_W),
            model_pt_num=N_MESH, num_sample_points=N_SAMPLE,
            input_size=IN_SIZE),
        model=ModelConfig(n_mesh_node=N_MESH),
        solver=SolverConfig())


class TestIndex:
    def test_build_index_train(self, bop_root):
        recs, stats = build_index(
            bop_root, "train_pbr", (1,), "train", im_hw=(IM_H, IM_W),
            selected_id=1)
        assert len(recs) == 4
        assert stats.invalid_box == 0
        r = recs[0]
        assert r.pose.shape == (3, 4)
        assert r.depth_factor == pytest.approx(10000.0)
        assert r.bbox[2] > r.bbox[0] and r.bbox[3] > r.bbox[1]

    def test_detections_pick_max_score(self, bop_root):
        dets = load_detections(osp.join(bop_root, "test", "real_det.json"))
        assert dets["0/0"][1] != (0, 0, 5, 5)
        recs, _ = build_index(
            bop_root, "test", (1,), "test", im_hw=(IM_H, IM_W),
            detections=dets)
        assert all(r.bbox_est is not None for r in recs)
        assert recs[0].file_name == "000000/000000"

    def test_dzi_test_mode_deterministic(self):
        rng = np.random.RandomState(0)
        c1, s1 = aug_bbox_dzi((10, 20, 50, 80), rng, test=True)
        c2, s2 = aug_bbox_dzi((10, 20, 50, 80), rng, test=True)
        np.testing.assert_allclose(c1, c2)
        assert s1 == s2 == pytest.approx(60 * 1.5)


class TestDataset:
    def test_train_sample_contract(self, bop_root):
        ds = PoseDataset(_mini_config(), 1, "train", diameter_m=0.1,
                         data_root=bop_root,
                         rng=np.random.RandomState(0))
        s = ds[0]
        assert s["rgb_u8"].shape == (IN_SIZE, IN_SIZE, 3)
        assert s["rgb_u8"].dtype == np.uint8
        assert s["choose"].shape == (N_SAMPLE,)
        assert s["match_idx"].shape == (N_SAMPLE,)
        assert s["visible_flag"].shape == (N_MESH,)
        # compact ship contract (round 5): uint16 depth counts +
        # per-sample scale, narrow GT dtypes, no duplicated dpt_filled
        # when fill is disabled (it was 1/3 of the ship bytes)
        assert s["dpt_u16"].dtype == np.uint16
        assert s["dpt_scale"].dtype == np.float32
        assert s["labels"].dtype == np.uint8
        assert s["origin_labels"].dtype == np.uint8
        assert s["match_idx"].dtype == np.uint16
        assert "dpt_filled" not in s and "dpt_m" not in s
        # some fg point matched to a real vertex (not the pad id)
        fg = s["labels"] > 0
        assert fg.any()
        assert (s["match_idx"][fg] < N_MESH).any()

    def test_gt_matches_are_geometric(self, bop_root):
        """Matched vertex, transformed by GT pose, lies near its point."""
        ds = PoseDataset(_mini_config(), 1, "train", diameter_m=0.1,
                         data_root=bop_root,
                         rng=np.random.RandomState(1))
        s = ds[1]
        RT = s["RT"]
        vv, uu = np.mgrid[:IN_SIZE, :IN_SIZE].astype(np.float32)
        Kc = s["K_crop"]
        dpt_m = s["dpt_u16"].astype(np.float32) / s["dpt_scale"]
        x = (uu - Kc[0, 2]) * dpt_m / Kc[0, 0]
        y = (vv - Kc[1, 2]) * dpt_m / Kc[1, 1]
        cld = np.stack([x, y, dpt_m], -1).reshape(-1, 3)[s["choose"]]
        ok = (s["labels"] > 0) & (s["match_idx"] < N_MESH)
        mesh_cam = ds.mesh_pts[s["match_idx"][ok]] @ RT[:, :3].T + RT[:, 3]
        d = np.linalg.norm(mesh_cam - cld[ok], axis=1)
        assert np.median(d) < 0.02

    def test_test_mode_uses_detection(self, bop_root):
        ds = PoseDataset(_mini_config(), 1, "test", diameter_m=0.1,
                         data_root=bop_root)
        s = ds[0]
        assert s["det"] == 1
        assert s["cls_id"] == 1
        assert s["file_name"] == "000000/000000"

    def test_infer_mode_needs_no_gt(self, bop_root):
        """'infer' builds items from rgb/depth/scene_camera/detections
        only: GT-derived keys are placeholders, and the point sampling
        is identical to test mode (same per-index rng + detector crop),
        so deployment predictions match eval predictions exactly."""
        ds = PoseDataset(_mini_config(), 1, "infer", diameter_m=0.1,
                         data_root=bop_root)
        ds_t = PoseDataset(_mini_config(), 1, "test", diameter_m=0.1,
                           data_root=bop_root)
        assert len(ds) == len(ds_t) == 4
        s, st = ds[0], ds_t[0]
        assert s["file_name"] == st["file_name"]
        assert s["det"] == 1
        # GT placeholders
        assert s["labels"].sum() == 0
        assert (s["match_idx"] == N_MESH).all()
        assert s["visible_flag"].sum() == 0
        assert np.all(s["RT"] == 0)
        # the inference-path inputs are bit-identical to test mode
        np.testing.assert_array_equal(s["rgb_u8"], st["rgb_u8"])
        np.testing.assert_array_equal(s["dpt_u16"], st["dpt_u16"])
        assert s["dpt_scale"] == st["dpt_scale"]
        np.testing.assert_array_equal(s["choose"], st["choose"])
        np.testing.assert_allclose(s["K_crop"], st["K_crop"], rtol=1e-6)


class TestPoseGtInfo:
    def test_lazy_visibility_callable(self):
        """pose_gt_info accepts a zero-arg callable for visible_flag (the
        cache-lookup form) and resolves it only after the empty-foreground
        check, so invalid samples never pay the HPR hull."""
        from gdm_tpu.data.gt_gen import pose_gt_info, pose_visibility

        rng = np.random.RandomState(3)
        mesh_pts = make_object(N_MESH, rng)[:, :3] / 1000.0
        pose = np.hstack([np.eye(3), [[0.0], [0.0], [0.5]]]).astype(
            np.float32)
        cld = mesh_pts @ pose[:, :3].T + pose[:, 3]
        pt_labels = np.ones(len(cld), np.int32)
        flag = pose_visibility(pose, mesh_pts)

        calls = {"n": 0}

        def lookup():
            calls["n"] += 1
            return flag

        # empty foreground: callable must NOT be invoked, flag is zeros
        lab0, mi0, vf0, valid0 = pose_gt_info(
            cld, np.zeros_like(pt_labels), pose, mesh_pts,
            visible_flag=lookup)
        assert calls["n"] == 0 and not valid0
        assert vf0.sum() == 0 and (mi0 == N_MESH).all()

        # callable form == array form, bit-identical
        out_arr = pose_gt_info(cld, pt_labels, pose, mesh_pts,
                               visible_flag=flag)
        out_fn = pose_gt_info(cld, pt_labels, pose, mesh_pts,
                              visible_flag=lookup)
        assert calls["n"] == 1 and out_fn[3] and out_arr[3]
        for a, b in zip(out_arr[:3], out_fn[:3]):
            np.testing.assert_array_equal(a, b)


class TestVisibilityCache:
    def test_bit_identical_and_hull_once_per_anno(self, bop_root,
                                                  monkeypatch):
        """data.cache_visibility pays the HPR hull once per annotation
        (the GT pose never changes across epochs) and is bit-identical
        to the uncached path."""
        import dataclasses

        import gdm_tpu.data.dataset as dsmod

        calls = {"n": 0}
        real = dsmod.pose_visibility

        def counting(pose, mesh_pts, **kw):
            calls["n"] += 1
            return real(pose, mesh_pts, **kw)

        monkeypatch.setattr(dsmod, "pose_visibility", counting)

        cfg = _mini_config()
        ds = PoseDataset(cfg, 1, "test", diameter_m=0.1,
                         data_root=bop_root)
        cfg_off = dataclasses.replace(cfg, data=dataclasses.replace(
            cfg.data, cache_visibility=False))
        ds_off = PoseDataset(cfg_off, 1, "test", diameter_m=0.1,
                             data_root=bop_root)
        assert ds_off._vis_cache is None

        epoch1 = [ds[i] for i in range(len(ds))]
        assert calls["n"] == len(ds)
        epoch2 = [ds[i] for i in range(len(ds))]   # cache hits only
        assert calls["n"] == len(ds)
        off = [ds_off[i] for i in range(len(ds_off))]
        for a, b, c in zip(epoch1, epoch2, off):
            for k in ("labels", "match_idx", "visible_flag", "choose"):
                np.testing.assert_array_equal(a[k], b[k])
                np.testing.assert_array_equal(a[k], c[k])


class TestHprRadiusParam:
    def test_reference_param_reachable_and_differs(self, bop_root):
        """data.hpr_radius_param plumbs through to the HPR hull
        (VERDICT r4 weak 6 checklist item): pi reproduces the
        reference's flip radius (compute_visibility.py:131), whose
        qhull-precision artifacts mark MORE vertices visible than the
        geometrically-correct default 2.0.  GT labels change with it —
        it is part of the training distribution and must be on the
        real-data comparison checklist."""
        import dataclasses

        cfg_pi = dataclasses.replace(
            _mini_config(), data=dataclasses.replace(
                _mini_config().data,
                hpr_radius_param=3.141592653589793))
        ds2 = PoseDataset(_mini_config(), 1, "test", diameter_m=0.1,
                          data_root=bop_root)
        dspi = PoseDataset(cfg_pi, 1, "test", diameter_m=0.1,
                           data_root=bop_root)
        v2 = np.stack([ds2[i]["visible_flag"] for i in range(4)])
        vpi = np.stack([dspi[i]["visible_flag"] for i in range(4)])
        # pi's visible set strictly contains extra (self-occluded)
        # vertices on this closed star-shaped object
        assert vpi.sum() > v2.sum()
        # 2.0's set is (essentially) a subset of pi's
        assert ((v2 == 1) & (vpi == 0)).mean() < 0.02


class TestLoaderAndFinalize:
    def test_loader_shards_and_collates(self, bop_root):
        ds = PoseDataset(_mini_config(), 1, "test", diameter_m=0.1,
                         data_root=bop_root)
        dl = DataLoader(ds, batch_size=2, shuffle=False, drop_last=True,
                        num_workers=2)
        batches = list(dl)
        assert len(batches) == 2
        batch, meta = batches[0]
        assert batch["rgb_u8"].shape == (2, IN_SIZE, IN_SIZE, 3)
        assert meta[0]["file_name"].startswith("000000/")
        # sharded world: two ranks see disjoint halves
        seen = set()
        for rank in range(2):
            d = DataLoader(ds, batch_size=1, shuffle=False, rank=rank,
                           world=2)
            for _, m in d:
                seen.add(m[0]["file_name"])
        assert len(seen) == 4

    def test_process_workers(self, bop_root):
        ds = PoseDataset(_mini_config(), 1, "test", diameter_m=0.1,
                         data_root=bop_root)
        dl = DataLoader(ds, batch_size=2, shuffle=False, drop_last=True,
                        num_workers=2, workers="process")
        batches = list(dl)
        assert len(batches) == 2
        assert batches[0][0]["rgb_u8"].shape == (2, IN_SIZE, IN_SIZE, 3)

    def test_finalize_batch_device(self, bop_root):
        import jax.numpy as jnp

        ds = PoseDataset(_mini_config(), 1, "train", diameter_m=0.1,
                         data_root=bop_root,
                         rng=np.random.RandomState(2))
        batch, _ = collate([ds[0], ds[1]])
        out = finalize_batch(
            {k: jnp.asarray(v) for k, v in batch.items()
             if k != "K"})
        assert out["cld_rgb_nrm"].shape == (2, N_SAMPLE, 9)
        assert out["rgb"].dtype == jnp.float32
        # device cld == host cld used for GT gen
        xyz = np.asarray(out["xyz_img"])
        cld_dev = np.asarray(out["cld_rgb_nrm"][..., :3])
        for b in range(2):
            host_cld = xyz[b].reshape(-1, 3)[batch["choose"][b]]
            np.testing.assert_allclose(cld_dev[b], host_cld, atol=1e-6)
        # normals are unit-ish on valid fg points
        nrm = np.asarray(out["cld_rgb_nrm"][0, :, 6:9])
        lens = np.linalg.norm(nrm, axis=1)
        assert ((lens > 0.99) & (lens < 1.01)).sum() > 10


class TestPly:
    def test_roundtrip_binary(self, tmp_path):
        rng = np.random.RandomState(0)
        pts = rng.randn(50, 3).astype(np.float32)
        colors = rng.randint(0, 255, (50, 3)).astype(np.uint8)
        nrm = rng.randn(50, 3).astype(np.float32)
        p = str(tmp_path / "m.ply")
        write_ply(p, pts, colors, nrm)
        d = load_ply(p)
        np.testing.assert_allclose(d["pts"], pts, atol=1e-6)
        np.testing.assert_array_equal(d["colors"], colors)
        np.testing.assert_allclose(d["normals"], nrm, atol=1e-6)

    def test_ascii(self, tmp_path):
        p = str(tmp_path / "a.ply")
        with open(p, "w") as f:
            f.write("ply\nformat ascii 1.0\nelement vertex 2\n"
                    "property float x\nproperty float y\nproperty float z\n"
                    "end_header\n0 0 0\n1 2 3\n")
        d = load_ply(p)
        np.testing.assert_allclose(d["pts"], [[0, 0, 0], [1, 2, 3]])

    def test_load_or_build_fps_mesh_fallback(self, tmp_path):
        """Without kps/*.npy the loader FPS-samples the BOP model PLY
        (the reference crashes in that case, linemod_pbr.py:89-97)."""
        from gdm_tpu.data.ply import load_or_build_fps_mesh

        rng = np.random.RandomState(1)
        pts_mm = rng.randn(300, 3).astype(np.float32) * 40
        (tmp_path / "models_eval").mkdir()
        write_ply(str(tmp_path / "models_eval" / "obj_000007.ply"), pts_mm)
        fps = load_or_build_fps_mesh(str(tmp_path), 7, 32)
        assert fps.shape == (32, 9)
        # xyz converted mm -> m like load_fps_mesh
        assert np.abs(fps[:, :3]).max() < 1.0
        # kps file wins when present
        (tmp_path / "kps").mkdir()
        np.save(str(tmp_path / "kps" / "obj_000007_fps.npy"),
                np.ones((32, 9), np.float32) * 500.0)
        fps2 = load_or_build_fps_mesh(str(tmp_path), 7, 32)
        np.testing.assert_allclose(fps2[:, :3], 0.5)
        import pytest as _pytest
        with _pytest.raises(FileNotFoundError):
            load_or_build_fps_mesh(str(tmp_path / "nowhere"), 7, 32)

    def test_fps_from_ply(self, tmp_path):
        rng = np.random.RandomState(0)
        pts = rng.randn(500, 3).astype(np.float32) * 30
        p = str(tmp_path / "m.ply")
        write_ply(p, pts)
        fps = mesh_fps_from_ply(p, 64)
        assert fps.shape == (64, 9)
        # fps spreads: min pairwise distance above random-sample level
        from scipy.spatial.distance import pdist
        assert pdist(fps[:, :3]).min() > 1.0


class TestPyramidRestructure:
    """build_pyramid's shared-distance restructuring must be bit-identical
    to the naive one-knn-call-per-level formulation it replaced.

    Scope of the guarantee (verified on the real chip 2026-08-18): every
    EXACT search (all k=1 argmins, and approx_max_k's small-n exact
    degeneration) is bit-identical on every backend.  On TPU the levels
    whose self-KNN runs approx_max_k over a *slice* of the shared
    distance matrix (levels 1-2) pick a different-but-equal-quality
    neighbour set than a standalone call (PartialReduce block selection
    follows physical layout); measured recall vs exact KNN at n=4096
    production shapes: level 1 0.957 restructured vs 0.955 naive,
    level 2 0.978 vs 0.961.  On CPU approx falls back to exact, so this
    test can assert full bitwise equality.
    """

    def test_matches_naive_per_call_pyramid(self):
        import jax.numpy as jnp

        from gdm_tpu.data.pipeline import (N_DS, N_UP, RGB_DS_SR,
                                           RGB_UP_SR, SUB_RATIO, K_NEI,
                                           build_pyramid)
        from gdm_tpu.ops.knn import knn

        rng = np.random.RandomState(3)
        n, s = 512, 64          # exercises k_eff<k padding at level 3
        cld = jnp.asarray(rng.randn(n, 3).astype(np.float32) * 0.1)
        xyz_img = jnp.asarray(rng.randn(s, s, 3).astype(np.float32) * 0.1)

        def naive(cld, xyz_img, chunk, approx, recall_target):
            def grid_xyz(stride):
                return xyz_img[::stride, ::stride, :].reshape(-1, 3)

            out = {}
            cur = cld
            for i in range(N_DS):
                n_sub = cur.shape[0] // SUB_RATIO
                nei = knn(cur, cur, K_NEI, chunk=chunk, approx=approx,
                          recall_target=recall_target)
                sub = cur[:n_sub]
                grid = grid_xyz(RGB_DS_SR[i])
                out[f"cld_xyz{i}"] = cur
                out[f"cld_nei_idx{i}"] = nei
                out[f"cld_sub_idx{i}"] = nei[:n_sub]
                out[f"cld_interp_idx{i}"] = knn(sub, cur, 1, chunk=chunk)
                out[f"r2p_ds_nei_idx{i}"] = knn(
                    grid, sub, K_NEI, chunk=chunk, approx=approx,
                    recall_target=recall_target)
                out[f"p2r_ds_nei_idx{i}"] = knn(sub, grid, 1, chunk=chunk)
                cur = sub
            for i in range(N_UP):
                grid = grid_xyz(RGB_UP_SR[i])
                tgt = out[f"cld_xyz{N_DS - i - 1}"]
                out[f"r2p_up_nei_idx{i}"] = knn(
                    grid, tgt, K_NEI, chunk=chunk, approx=approx,
                    recall_target=recall_target)
                out[f"p2r_up_nei_idx{i}"] = knn(tgt, grid, 1, chunk=chunk)
            return out

        for approx in (False, True):
            got = build_pyramid(cld, xyz_img, knn_chunk=128, approx=approx,
                                recall_target=0.85)
            want = naive(cld, xyz_img, 128, approx, 0.85)
            assert set(got) == set(want)
            for k in want:
                np.testing.assert_array_equal(
                    np.asarray(got[k]), np.asarray(want[k]), err_msg=k)


class TestLoaderRobustness:
    def test_abandoned_iteration_releases_producer(self, bop_root):
        """Breaking out of iteration mid-epoch must unblock the producer
        thread (it used to park forever in a blocking put on the full
        prefetch queue, leaking the worker pool)."""
        import threading
        import time

        ds = PoseDataset(_mini_config(), 1, "test", diameter_m=0.1,
                         data_root=bop_root)
        dl = DataLoader(ds, batch_size=1, shuffle=False, drop_last=False,
                        num_workers=2, prefetch=1)
        before = set(threading.enumerate())
        it = iter(dl)
        next(it)
        it.close()                       # abandon -> finally sets stop
        deadline = time.time() + 10.0
        while time.time() < deadline:
            leaked = [t for t in set(threading.enumerate()) - before
                      if t.is_alive() and "ThreadPoolExecutor" not in
                      (t.name or "")]
            if not leaked:
                break
            time.sleep(0.2)
        assert not leaked, f"producer still alive: {leaked}"

    def test_train_stream_reproducible_across_workers(self, bop_root):
        """Per-(seed, epoch, index) rng: the train stream is identical
        for 1 vs 4 thread workers (a shared RandomState raced), and
        changes when the epoch does."""
        def batches(workers, epoch):
            ds = PoseDataset(_mini_config(), 1, "train", diameter_m=0.1,
                             data_root=bop_root,
                             rng=np.random.RandomState(5))
            dl = DataLoader(ds, batch_size=2, shuffle=True,
                            drop_last=True, num_workers=workers, seed=3)
            dl.set_epoch(epoch)
            return [b for b, _ in dl]

        a = batches(1, epoch=0)
        b = batches(4, epoch=0)
        assert len(a) == len(b) > 0
        for ba, bb in zip(a, b):
            for k in ba:
                np.testing.assert_array_equal(ba[k], bb[k], err_msg=k)
        c = batches(1, epoch=1)
        assert any(not np.array_equal(a[0][k], c[0][k]) for k in a[0])


class TestDevicePrefetcher:
    """Background staging utility (opt-in: bench measure_train_e2e
    prefetch=True A/B path; synchronous stage functions).  The train
    loop stages directly — see the class docstring for the A/B that
    demoted it."""

    def test_order_and_completeness(self):
        from gdm_tpu.data.loader import DevicePrefetcher

        src = list(range(23))
        out = list(DevicePrefetcher(src, lambda x: x * x, depth=3))
        assert out == [x * x for x in src]

    def test_stage_exception_propagates(self):
        from gdm_tpu.data.loader import DevicePrefetcher

        def stage(x):
            if x == 4:
                raise ValueError("boom")
            return x

        got = []
        with pytest.raises(ValueError, match="boom"):
            for v in DevicePrefetcher(range(10), stage, depth=2):
                got.append(v)
        assert got == [0, 1, 2, 3]

    def test_early_break_ends_staging_thread(self):
        import threading
        import time as _t

        from gdm_tpu.data.loader import DevicePrefetcher

        before = set(threading.enumerate())
        it = iter(DevicePrefetcher(range(1000), lambda x: x, depth=1))
        assert next(it) == 0
        it.close()                       # abandon -> finally sets stop
        deadline = _t.time() + 10.0
        while _t.time() < deadline:
            leaked = [t for t in set(threading.enumerate()) - before
                      if t.is_alive()]
            if not leaked:
                break
            _t.sleep(0.1)
        assert not leaked, f"staging thread still alive: {leaked}"


class TestNormalEstimate:
    def test_sphere_normals_radial(self, tmp_path):
        """PLYs without stored normals get true unit surface normals
        (PCA / face-average), not normalize_pts positions."""
        from scipy.spatial import ConvexHull

        from gdm_tpu.data.ply import _estimate_normals

        rng = np.random.RandomState(0)
        v = rng.randn(400, 3)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        v = (v * 30.0).astype(np.float32)            # sphere r=30 mm
        centre_offset = np.array([5.0, -3.0, 8.0], np.float32)
        pts = v + centre_offset                      # off-centre
        radial = v / 30.0

        hull = ConvexHull(pts)
        raw = hull.simplices.astype(np.int64)        # random winding
        tri = pts[raw]
        fn = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
        flip = np.einsum("ij,ij->i", fn, hull.equations[:, :3]) < 0
        wound = raw.copy()
        wound[flip] = wound[flip][:, [0, 2, 1]]      # consistent outward

        # no faces -> PCA; raw hull (inconsistent winding) -> PCA
        # fallback; consistently wound -> exact face averaging
        for faces in (None, raw, wound):
            nrm = _estimate_normals(pts, faces)
            np.testing.assert_allclose(
                np.linalg.norm(nrm, axis=1), 1.0, atol=1e-5)
            cos = np.einsum("ij,ij->i", nrm, radial)
            assert np.mean(cos > 0.9) > 0.95, (
                f"normals not radial (faces "
                f"{'none' if faces is None else len(faces)})")

    def test_fps_fallback_normals_unit(self, tmp_path):
        rng = np.random.RandomState(1)
        v = rng.randn(300, 3)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        pts = (v * 25.0).astype(np.float32)
        p = str(tmp_path / "s.ply")
        write_ply(p, pts)                            # no normals stored
        fps = mesh_fps_from_ply(p, 64)
        lens = np.linalg.norm(fps[:, 6:9], axis=1)
        np.testing.assert_allclose(lens, 1.0, atol=1e-5)


def test_write_synthetic_bop_root_multiobject(tmp_path):
    """The on-disk BOP fabricator (bench e2e + dress rehearsal): one
    scene per object, detections, eval meshes — consumable by
    build_index/load_detections exactly like a real BOP root."""
    from gdm_tpu.data.bop import build_index, load_detections
    from gdm_tpu.data.ply import load_ply
    from gdm_tpu.data.synthetic import make_object, \
        write_synthetic_bop_root

    rng = np.random.RandomState(0)
    meshes = {1: make_object(64, rng, radius=0.05),
              5: make_object(64, rng, radius=0.04)}
    root = str(tmp_path)
    K = np.array([[140.0, 0, 80], [0, 140.0, 60], [0, 0, 1]], np.float32)
    write_synthetic_bop_root(root, meshes, n_frames=2,
                             subsets=("train_pbr", "test"),
                             im_hw=(120, 160), K=K, eval_meshes=True)
    for oid in (1, 5):
        assert osp.exists(osp.join(root, "kps", f"obj_{oid:06d}_fps.npy"))
        ply = load_ply(osp.join(root, "models_eval",
                                f"obj_{oid:06d}.ply"))
        assert len(ply["faces"]) > 0
        assert np.abs(ply["pts"]).max() > 1.0             # mm units
        recs, stats = build_index(
            root, "train_pbr", (oid,), "train", im_hw=(120, 160),
            selected_id=oid)
        assert len(recs) == 2 and stats.invalid_box == 0
        assert all(r.obj_id == oid for r in recs)
    # detections: per-scene keys, max-score box beats the decoy
    dets = load_detections(osp.join(root, "test", "real_det.json"))
    assert set(dets) == {"0/0", "0/1", "1/0", "1/1"}
    for v in dets.values():
        for box in v.values():
            assert box != (0, 0, 6, 6)
    # both scenes listed
    with open(osp.join(root, "test", "train.txt")) as f:
        lines = f.read().split()
    assert len(lines) == 4 and lines[0].startswith("000000/")
    assert lines[2].startswith("000001/")
