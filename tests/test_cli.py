"""CLI driver end-to-end: train one epoch on the fabricated mini BOP
dataset, checkpoint, then evaluate the checkpoint through the full eval
path (detections, pose fit on device, metric table)."""

import os.path as osp

import numpy as np
import pytest

import conftest  # noqa: F401
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


def test_train_then_eval(mini_preset, bop_root, tmp_path_factory):  # noqa: F811
    ckpt_root = str(tmp_path_factory.mktemp("ckpt"))
    out_dir = str(tmp_path_factory.mktemp("out"))

    state = cli.main([
        "train", "--dataset", "lmo", "--data-root", bop_root,
        "--ckpt-root", ckpt_root, "--cls-id", "1", "--epochs", "1",
        "--batch-size", "2", "--num-workers", "2", "--knn-chunk", "64",
    ])
    assert state is not None
    ckpt_dir = osp.join(ckpt_root, "checkpoints", "ape")
    assert osp.exists(osp.join(ckpt_dir, "latest"))

    results = cli.main([
        "eval", "--dataset", "lmo", "--data-root", bop_root,
        "--ckpt-root", ckpt_root, "--cls-id", "1", "--batch-size", "2",
        "--num-workers", "2", "--knn-chunk", "64",
        "--output-dir", out_dir,
    ])
    assert "ape" in results["recalls"]
    # all 4 test frames got a prediction row
    assert len(results["errors"]["ape"]["ad"]) == 4
    # artifacts written
    assert osp.exists(osp.join(out_dir, "_lmo_tab.txt"))
    assert osp.exists(osp.join(out_dir, "gt_lmo-test.csv"))
    with open(osp.join(out_dir, "gt_lmo-test.csv")) as f:
        lines = f.read().strip().split("\n")
    assert len(lines) == 5  # header + 4 frames


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
        "--batch-size", "2", "--num-workers", "2",
    ])
    assert state is not None
    results = cli.main([
        "eval", "--dataset", "lmo", "--data-root", bop_root,
        "--ckpt-root", ckpt_root, "--cls-id", "1", "--batch-size", "2",
        "--num-workers", "2",
        "--output-dir", str(tmp_path_factory.mktemp("out_dg")),
    ])
    assert len(results["errors"]["ape"]["ad"]) == 4
