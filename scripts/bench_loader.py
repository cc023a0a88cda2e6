"""Host data-loader benchmark: ms per train sample per core.

Fabricates a production-shaped BOP tree (480x640 frames, 256^2 crop,
4096 scene points, 4096-vertex mesh — the lmo/ycbv operating point) in a
temp dir and times PoseDataset.get_item for:

  * epoch 1 with the per-annotation visibility cache cold,
  * epoch 2 with it warm (the steady state of a real training run —
    pose_visibility depends only on the annotation's fixed GT pose),
  * the cache disabled (`data.cache_visibility=false`), which is what the
    reference pays every epoch (plus its 14-KD-tree index pyramid that
    this framework moved on-device).

Source of the "host feeding budget" numbers in docs/SCALING.md.
Pure host measurement — never touches a TPU.  Usage:
    python scripts/bench_loader.py [n_annos] [epochs]
"""

import json
import os
import os.path as osp
import sys
import tempfile
import time

import numpy as np
from PIL import Image

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

IM_H, IM_W = 480, 640
N_MESH = 4096
N_SAMPLE = 4096
IN_SIZE = 256


def make_tree(root, n_frames, rng):
    from gdm_tpu.data.synthetic import make_object

    mesh = make_object(N_MESH, rng, radius=0.06)
    os.makedirs(osp.join(root, "kps"))
    np.save(osp.join(root, "kps", "obj_000001_fps.npy"), mesh)
    K = np.array([[572.4, 0, IM_W / 2], [0, 573.6, IM_H / 2], [0, 0, 1]],
                 np.float32)
    sdir = osp.join(root, "train_pbr", "000000")
    for sub in ("rgb", "depth", "mask_visib"):
        os.makedirs(osp.join(sdir, sub))
    gt, gt_info, cams, lines = {}, {}, {}, []
    pts = mesh[:, :3] / 1000.0
    for i in range(n_frames):
        R = np.linalg.qr(rng.randn(3, 3))[0]
        if np.linalg.det(R) < 0:
            R[:, 0] *= -1
        t = np.array([0.0, 0.0, 0.7 + 0.02 * i])
        cam = pts @ R.T + t
        u = np.clip((cam[:, 0] * K[0, 0] / cam[:, 2] + K[0, 2]).astype(int),
                    0, IM_W - 1)
        v = np.clip((cam[:, 1] * K[1, 1] / cam[:, 2] + K[1, 2]).astype(int),
                    0, IM_H - 1)
        depth = np.zeros((IM_H, IM_W), np.uint16)
        rgb = np.full((IM_H, IM_W, 3), 90, np.uint8)
        mask = np.zeros((IM_H, IM_W), np.uint8)
        for du in range(4):
            for dv in range(4):
                uu = np.clip(u + du, 0, IM_W - 1)
                vv = np.clip(v + dv, 0, IM_H - 1)
                depth[vv, uu] = (cam[:, 2] * 10000).astype(np.uint16)
                rgb[vv, uu] = mesh[:, 3:6].astype(np.uint8)
                mask[vv, uu] = 255
        Image.fromarray(rgb).save(osp.join(sdir, f"rgb/{i:06d}.jpg"),
                                  quality=95)
        Image.fromarray(depth).save(osp.join(sdir, f"depth/{i:06d}.png"))
        Image.fromarray(mask).save(
            osp.join(sdir, f"mask_visib/{i:06d}_000000.png"))
        gt[str(i)] = [{"obj_id": 1, "cam_R_m2c": R.ravel().tolist(),
                       "cam_t_m2c": (t * 1000).tolist()}]
        bbox = [int(u.min()), int(v.min()),
                int(u.max() - u.min() + 4), int(v.max() - v.min() + 4)]
        gt_info[str(i)] = [{"bbox_obj": bbox,
                            "px_count_visib": int((mask > 0).sum())}]
        cams[str(i)] = {"cam_K": K.ravel().tolist(), "depth_scale": 0.1}
        lines.append(f"000000/{i:06d}")
    for name, obj in (("scene_gt", gt), ("scene_gt_info", gt_info),
                      ("scene_camera", cams)):
        with open(osp.join(sdir, f"{name}.json"), "w") as f:
            json.dump(obj, f)
    with open(osp.join(root, "train_pbr", "train.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")


def time_epochs(ds, n, epochs):
    out = []
    for _ in range(epochs):
        t0 = time.perf_counter()
        for i in range(n):
            ds[i]
        out.append((time.perf_counter() - t0) / n * 1e3)
    return out


def main():
    import dataclasses

    from gdm_tpu.configs.base import get_config
    from gdm_tpu.data.dataset import PoseDataset

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    rng = np.random.RandomState(0)
    with tempfile.TemporaryDirectory() as root:
        make_tree(root, n, rng)
        cfg = get_config("lmo")
        cfg = dataclasses.replace(cfg, data=dataclasses.replace(
            cfg.data, obj_ids=(1,)))
        ds = PoseDataset(cfg, 1, "train", diameter_m=0.12, data_root=root,
                         rng=np.random.RandomState(1))
        cached = time_epochs(ds, n, epochs)
        cfg_off = dataclasses.replace(cfg, data=dataclasses.replace(
            cfg.data, cache_visibility=False))
        ds_off = PoseDataset(cfg_off, 1, "train", diameter_m=0.12,
                             data_root=root, rng=np.random.RandomState(1))
        uncached = time_epochs(ds_off, n, epochs)
    print(json.dumps({
        "n_annos": n,
        "ms_per_sample_epoch1_cached": round(cached[0], 2),
        "ms_per_sample_warm_cached": round(min(cached[1:]) if epochs > 1
                                           else cached[0], 2),
        "ms_per_sample_uncached": round(min(uncached), 2),
    }))


if __name__ == "__main__":
    main()
