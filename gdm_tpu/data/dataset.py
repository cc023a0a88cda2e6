"""BOP pose-estimation datasets (LineMOD / LM-O / LM-full / YCB-V).

Host-side counterpart of reference datasets/lm/linemod_pbr.py:24-670 and
datasets/ycbv/ycbv_pbr.py:28-692, restructured TPU-first:

  * the host does ONLY image decode, DZI affine crop, photometric aug,
    point sampling and GT-correspondence generation (scipy hull + KD-tree,
    inherently data dependent — SURVEY.md section 7);
  * everything the reference computed per-sample on CPU that is dense math
    — depth fill, backprojection, surface normals, colour normalisation,
    the 14-KD-tree KNN/fusion index pyramid (linemod_pbr.py:515-569) —
    moves into the jitted device step (gdm_tpu.data.pipeline), so samples
    ship as uint8 rgb + one float depth plane instead of 25 arrays.

Per-sample output keys (numpy), sized for the tunnel's H2D budget
(round 5: ship BYTES are the binding e2e-train resource, so depth goes
as raw uint16 counts + a per-sample scale and the GT label arrays ship
narrow — data.pipeline.finalize_batch reconstructs metres / widens to
int32 on device):
  rgb_u8 [S,S,3] uint8, dpt_u16 [S,S] uint16 (cropped raw counts),
  dpt_scale f32 scalar (counts-per-metre divisor: dpt_m = dpt_u16 /
  dpt_scale — exact for BOP sources, whose depth PNGs are uint16
  counts), dpt_filled [S,S] f32 (only when data.fill_depth),
  K_crop [3,3] f32, choose [N] i32, labels / origin_labels [N] u8,
  match_idx [N] u16 (i32 when the mesh has >=65535 vertices),
  visible_flag [M] u8, RT [3,4] f32; test adds cls_id/det (i32) and
  file_name (str, via meta).

Behaviour notes mirrored from the reference:
  * depth scaling: /depth_factor for pbr+test frames, /1000 for real
    (linemod_pbr.py:428-431);
  * YCBV samples train items 0.8 real / 0.2 pbr regardless of index
    (ycbv_pbr.py:663-690) and pastes real backgrounds behind 'synt' crops;
  * YCBV choose-mask comes from the FILLED depth while point xyz comes
    from the raw depth (ycbv_pbr.py:477-506);
  * train items with <200 valid pixels or no valid GT matches resample a
    random index (linemod_pbr.py:479,509,662-670);
  * LM's GT match threshold is the hardcoded 0.01 m (linemod_pbr.py:641)
    while YCBV uses nn_dist_th x diameter (ycbv_pbr.py:643) — exposed here
    as gt_match_th_m.
"""

from __future__ import annotations

import os.path as osp

import cv2
import numpy as np

from gdm_tpu.configs.base import Config
from gdm_tpu.data import bop
from gdm_tpu.data.augment import (
    add_real_background,
    fill_depth_fast,
    rgb_add_noise,
)
from gdm_tpu.data.crop import crop_affine_matrix, crop_resize_by_warp_affine
from gdm_tpu.data.gt_gen import pose_gt_info, pose_visibility
from gdm_tpu.data.imio import imread_mask, imread_rgb, imread_u16


class PoseDataset:
    """One-object BOP dataset (the reference trains one model per cls_id).

    Args:
      cfg: preset Config (configs.base).
      cls_id: the selected object id.
      mode: 'train' | 'test' | 'infer'.  'infer' is the GT-less
        deployment path (`cli infer`): frames come from scene_camera +
        a detection file only — no scene_gt, no masks; GT-derived keys
        (labels/match_idx/visible_flag/RT) are placeholders.  The
        reference has no such mode (its test loader reads scene_gt even
        at inference, linemod_pbr.py:145-201).
      diameter_m: object diameter (metres) for the GT match threshold.
      mesh_fps: optional preloaded [M, 9] fps mesh (xyz m | rgb | nrm);
        when omitted, loaded from <data_root>/kps/obj_XXXXXX_fps.npy or
        FPS-sampled from the BOP model PLY (ply.load_or_build_fps_mesh).
      rng: np.random.RandomState (fresh from seed when omitted).
      detections_file: detection JSON override for test/infer (default:
        <subset>/real_det.json).
    """

    def __init__(self, cfg: Config, cls_id: int, mode: str,
                 diameter_m: float | None = None,
                 mesh_fps: np.ndarray | None = None,
                 rng: np.random.RandomState | None = None,
                 data_root: str | None = None,
                 detections_file: str | None = None):
        d = cfg.data
        self.cfg = cfg
        self.cls_id = int(cls_id)
        self.mode = mode
        self.in_size = d.input_size
        self.n_sample = d.num_sample_points
        self.im_hw = tuple(d.img_hw)
        self.rng = rng if rng is not None else np.random.RandomState(0)
        # base for per-sample rng derivation (see __getitem__): drawn
        # from the caller's rng so different processes/seeds diverge
        self._seed_base = int(self.rng.randint(2 ** 31))
        self.epoch = 0
        root = data_root or d.data_root

        if mesh_fps is None:
            from gdm_tpu.data.ply import load_or_build_fps_mesh
            mesh_fps = load_or_build_fps_mesh(root, cls_id, d.model_pt_num)
        self.mesh_fps = mesh_fps
        self.mesh_pts = mesh_fps[:, :3]

        if mode in ("test", "infer"):
            self.gt_match_th_m = 0.02  # evaluator-side labels only
        elif d.name == "ycbv":
            assert diameter_m is not None
            self.gt_match_th_m = d.nn_dist_th * diameter_m
        else:
            self.gt_match_th_m = 0.01   # linemod_pbr.py:641 hardcode
        if mode == "test" and diameter_m is not None and d.name == "ycbv":
            self.gt_match_th_m = d.nn_dist_th * diameter_m

        subsets = d.train_subsets if mode == "train" else d.test_subsets
        self.annos: list[bop.Record] = []
        self.real_annos: list[bop.Record] = []
        self.pbr_annos: list[bop.Record] = []
        for subset in subsets:
            dets = None
            if mode in ("test", "infer"):
                dets = bop.load_detections(
                    detections_file
                    or osp.join(root, subset, "real_det.json"))
            if mode == "infer":
                recs, _ = bop.build_index_infer(
                    root, subset, d.obj_ids, im_hw=self.im_hw,
                    detections=dets, selected_id=cls_id)
            else:
                recs, _ = bop.build_index(
                    root, subset, d.obj_ids, mode, im_hw=self.im_hw,
                    selected_id=cls_id if mode == "train" else None,
                    detections=dets)
            if mode == "test":
                # per-object evaluation: this dataset's GT-gen mesh is
                # cls_id's, so keep only its instances (the reference test
                # set mixes objects and computes garbage GT info for the
                # non-selected ones, train_lm.py:320-323)
                recs = [r for r in recs if r.obj_id == self.cls_id]
            self.annos += recs
            if "pbr" in subset:
                self.pbr_annos += recs
            else:
                self.real_annos += recs
        self.mix_real = (d.real_pbr_mix if mode == "train" else None)
        self.fill_depth = d.fill_depth
        self.add_noise = mode == "train" and d.name == "ycbv"
        # Per-annotation HPR visibility cache (data.cache_visibility):
        # pose_visibility depends only on (rec.pose, mesh_pts), both fixed
        # for an annotation, so the convex hull — the dominant GT-gen host
        # cost — is paid once per annotation per worker instead of every
        # epoch.  Stored bit-packed: n_mesh/8 bytes per annotation
        # (4096-vertex mesh -> 512 B; 100k annotations -> ~50 MB).
        self._vis_cache: dict[int, np.ndarray] | None = (
            {} if d.cache_visibility else None)

    # -- indexing ----------------------------------------------------------

    def __len__(self):
        return len(self.annos)

    def set_epoch(self, epoch: int):
        """Mix the epoch into per-sample rng derivation (the loader
        calls this from its own set_epoch)."""
        self.epoch = epoch

    def _pick_record(self, idx: int, rng=None) -> bop.Record:
        rng = self.rng if rng is None else rng
        if self.mode != "train" or self.mix_real is None \
                or not self.real_annos or not self.pbr_annos:
            return self.annos[idx]
        if rng.rand() < self.mix_real:            # ycbv_pbr.py:682-690
            return self.real_annos[rng.randint(len(self.real_annos))]
        return self.pbr_annos[rng.randint(len(self.pbr_annos))]

    def __getitem__(self, idx: int) -> dict:
        if self.mode == "train":
            # per-(seed, epoch, index) rng: the train stream is
            # reproducible regardless of loader worker mode, count, or
            # thread scheduling (a single shared RandomState raced under
            # the thread pool — irreproducible draws, occasional
            # duplicated augmentations within a batch)
            rng = np.random.RandomState(
                (self._seed_base + 7919 * idx
                 + 104729 * self.epoch) % (2 ** 31))
            data = self.get_item(self._pick_record(idx, rng), rng=rng)
            while data is None:
                data = self.get_item(
                    self._pick_record(rng.randint(len(self)), rng),
                    rng=rng)
            return data
        # test mode: per-index rng so point sampling is deterministic
        # regardless of loader thread scheduling — two eval runs of the
        # same checkpoint produce bit-identical predictions (the
        # reference samples from global np.random and is not
        # reproducible across runs)
        data = self.get_item(
            self.annos[idx],
            rng=np.random.RandomState((7919 * idx + 13) % (2 ** 31)))
        assert data is not None
        return data

    def _visibility(self, rec: bop.Record) -> np.ndarray:
        """Cached pose_visibility for this annotation.

        Keyed by record identity — records live in self.annos for the
        dataset's lifetime, and each loader worker holds its own dataset
        copy (its own cache).  Called lazily by pose_gt_info only after
        its empty-foreground check, so invalid samples never pay the hull.
        """
        rp = self.cfg.data.hpr_radius_param
        if self._vis_cache is None:
            return pose_visibility(rec.pose, self.mesh_pts,
                                   radius_param=rp)
        key = id(rec)
        packed = self._vis_cache.get(key)
        if packed is None:
            flag = pose_visibility(rec.pose, self.mesh_pts,
                                   radius_param=rp)
            self._vis_cache[key] = np.packbits(flag)
            return flag
        return np.unpackbits(packed, count=len(self.mesh_pts))

    # -- the per-sample pipeline -------------------------------------------

    def get_item(self, rec: bop.Record,
                 rng: np.random.RandomState | None = None) -> dict | None:
        rng = self.rng if rng is None else rng
        rgb = imread_rgb(rec.rgb_file)
        dpt_raw = imread_u16(rec.depth_file)        # counts, never metres
        no_gt = not rec.mask_file                   # infer mode records
        if no_gt:
            mask = np.zeros(rgb.shape[:2], np.uint8)
        else:
            mask = imread_mask(rec.mask_file)
        # counts-per-metre divisor (linemod_pbr.py:428-431): dpt_m =
        # dpt_raw / divisor.  Depth stays uint16 through the crop —
        # INTER_NEAREST picks source pixels, so warp(raw)/divisor ==
        # warp(raw/divisor) bit-exactly, at half the ship bytes.
        divisor = float(rec.depth_factor) \
            if rec.img_type in ("pbr", "test") else 1000.0
        K = rec.cam_K

        det = 1
        if self.mode in ("test", "infer"):
            if rec.bbox_est is not None and rec.bbox_est[2] != 0:
                bbox = rec.bbox_est
            else:
                det = 0
                bbox = rec.bbox
        else:
            bbox = rec.bbox

        dcfg = self.cfg.data
        center, scale = bop.aug_bbox_dzi(
            bbox, rng, dcfg.dzi_scale_ratio, dcfg.dzi_shift_ratio,
            dcfg.dzi_pad_ratio, self.im_hw, test=self.mode != "train")

        S = self.in_size
        rgb_c = crop_resize_by_warp_affine(
            rgb, center, scale, S, interpolation=cv2.INTER_LINEAR)
        mask_c = crop_resize_by_warp_affine(
            mask, center, scale, S, interpolation=cv2.INTER_NEAREST)
        dptc_u16 = crop_resize_by_warp_affine(
            dpt_raw, center, scale, S, interpolation=cv2.INTER_NEAREST)
        A = crop_affine_matrix(center, scale, S)
        K_crop = (A @ K).astype(np.float32)

        if self.add_noise and rec.img_type == "synt":
            rgb_c = rgb_add_noise(rgb_c, rng)
            if self.real_annos:
                dpt_c = dptc_u16.astype(np.float32) / divisor
                rgb_c, dpt_c = add_real_background(
                    rgb_c, mask_c, dpt_c, (dptc_u16 > 0).astype(np.uint8),
                    self.real_annos, rng, S, self.im_hw)
                # back to counts: exact for unmodified pixels (an
                # integer round-trips f32 division/multiplication) and
                # for pasted real depth when the divisors share a
                # factor of 10 (the BOP norm); otherwise quantised to
                # the nearest half-count (<= 0.05 mm at the usual
                # depth_scale 0.1 — below the source PNG's own
                # quantisation)
                dptc_u16 = np.clip(np.round(dpt_c * divisor), 0,
                                   65535).astype(np.uint16)
            if rng.rand() > 0.8:
                rgb_c = rgb_add_noise(rgb_c, rng)

        if self.fill_depth:
            dpt_filled = fill_depth_fast(
                dptc_u16.astype(np.float32) / divisor)
            valid_px = dpt_filled > 1e-6
        else:
            dpt_filled = None
            valid_px = dptc_u16 > 0           # counts >= 1 <=> > 1e-6 m

        choose = np.nonzero(valid_px.ravel())[0]
        if len(choose) < 200 and self.mode == "train":
            return None
        if len(choose) == 0:
            choose = np.array([0])
        if len(choose) > self.n_sample:           # linemod_pbr.py:485-496
            keep = np.zeros(len(choose), int)
            keep[:self.n_sample] = 1
            rng.shuffle(keep)
            choose = choose[keep.nonzero()[0]]
        else:
            choose = np.pad(choose, (0, self.n_sample - len(choose)),
                            "wrap")
        rng.shuffle(choose)
        choose = choose.astype(np.int32)

        # host backprojection of the raw crop depth, CHOSEN PIXELS ONLY
        # (GT gen needs cld; the device recomputes the full xyz image
        # from the uint16 counts at step time).  Element-wise f32 math
        # identical to backprojecting the full [S,S] grid and gathering
        # — at 1/16th the host work (no np.mgrid, no full-image temps).
        z = dptc_u16.ravel()[choose].astype(np.float32) / divisor
        uu = (choose % S).astype(np.float32)
        vv = (choose // S).astype(np.float32)
        x = (uu - K_crop[0, 2]) * z / K_crop[0, 0]
        y = (vv - K_crop[1, 2]) * z / K_crop[1, 1]
        cld = np.stack([x, y, z], -1)
        cld = np.nan_to_num(cld, posinf=0.0, neginf=0.0)

        labels_pt = mask_c.ravel()[choose]
        labels_pt[labels_pt == 255] = 1

        if no_gt:
            # deployment inference: no GT pose/mask exists — labels and
            # correspondences are placeholders (the model's seg head and
            # similarity argmax drive the pose fit; these keys are only
            # consumed by losses/metrics)
            labels = np.zeros(self.n_sample, np.uint8)
            match_idx = np.full(self.n_sample, len(self.mesh_pts),
                                np.int32)
            visible_flag = np.zeros(len(self.mesh_pts), np.uint8)
        else:
            labels, match_idx, visible_flag, valid = pose_gt_info(
                cld, labels_pt, rec.pose, self.mesh_pts,
                nn_dist_th=self.gt_match_th_m,
                visible_flag=lambda: self._visibility(rec))
            if self.mode == "train" and not valid:
                return None

        # narrow ship dtypes (finalize_batch widens on device): the
        # no-match sentinel is m == len(mesh_pts), so u16 needs m+1
        # representable values
        midx_dtype = np.uint16 if len(self.mesh_pts) < 65535 else np.int32
        item = {
            "rgb_u8": rgb_c.astype(np.uint8, copy=False),
            "dpt_u16": dptc_u16,
            "dpt_scale": np.float32(divisor),
            "K_crop": K_crop,
            "choose": choose,
            "labels": labels.astype(np.uint8, copy=False),
            "origin_labels": labels_pt.astype(np.uint8, copy=False),
            "match_idx": match_idx.astype(midx_dtype, copy=False),
            "visible_flag": visible_flag,
            "RT": rec.pose.astype(np.float32),
            "K": K.astype(np.float32),
        }
        if dpt_filled is not None:
            item["dpt_filled"] = dpt_filled.astype(np.float32, copy=False)
        if self.mode in ("test", "infer"):
            item["cls_id"] = np.int32(rec.obj_id)
            item["det"] = np.int32(det)
            item["file_name"] = rec.file_name
        return item
