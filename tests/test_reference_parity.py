"""Run the ACTUAL reference loss code (models/geoMatch.py matching loss +
models/loss.py CircleLoss) against our fixed-shape masked reformulation.

The reference dynamically slices foreground rows and builds the positive
mask with index_put/index_select (geoMatch.py:55-157); we recompute all
rows at fixed shape and mask.  These tests prove the two give the same
value — the "correctness under padding" hard part of SURVEY.md section 7.

Skipped when /root/reference is absent (the shipped suite never needs it).
"""

import os.path as osp
import sys
import types

import numpy as np
import pytest

import conftest  # noqa: F401

pytestmark = pytest.mark.skipif(
    not osp.isdir("/root/reference"), reason="reference tree not available")


from reference_stubs import reference_imports


@pytest.fixture(scope="module")
def ref_geomatch_cls():
    """Import the reference GeoMatch class (no construction); stubs and
    the .cuda() no-op stay active while the module's tests run."""
    with reference_imports():
        from models.geoMatch import GeoMatch
        from models.loss import CircleLoss

        yield GeoMatch, CircleLoss


def _random_problem(rng, B=2, N=120, M=48, C=32, fg_counts=(60, 40)):
    rgbd = rng.randn(B, N, C).astype(np.float32)
    mesh_feats = rng.randn(M, C).astype(np.float32)
    mesh_xyz = rng.randn(M, 3).astype(np.float32) * 0.05
    labels = np.zeros((B, N), np.int32)
    for b, n_fg in enumerate(fg_counts):
        labels[b, rng.permutation(N)[:n_fg]] = 1
    match_idx = rng.randint(0, M + 1, (B, N)).astype(np.int32)  # M = none
    vis = (rng.rand(B, M) > 0.3).astype(np.int32)
    RT = np.tile(np.eye(3, 4, dtype=np.float32), (B, 1, 1))
    RT[:, 2, 3] = 0.6
    return rgbd, mesh_feats, mesh_xyz, labels, match_idx, vis, RT


@pytest.fixture(scope="module")
def ref_dgcnn_cls():
    """Import the reference DGCNN GeoMatch (models/geoMatch_DGCNN.py) —
    pure torch once the shared stubs/patches are active (they stay so
    for the module's tests: the forward builds cuda arange indices)."""
    with reference_imports():
        from models.geoMatch_DGCNN import GeoMatch

        yield GeoMatch


class TestDGCNNForwardParity:
    def test_forward_and_import_match_reference(self, ref_dgcnn_cls):
        import jax
        import jax.numpy as jnp
        import torch

        from gdm_tpu.models.geomatch_dgcnn import GeoMatchDGCNN
        from gdm_tpu.models.spline_mesh import IMAGENET_MEAN, IMAGENET_STD
        from gdm_tpu.train.import_torch import import_state_dict

        N, M = 256, 128
        rng = np.random.RandomState(0)
        mesh_raw = np.zeros((M, 9), np.float32)
        mesh_raw[:, :3] = rng.randn(M, 3) * 40            # mm
        mesh_raw[:, 3:6] = rng.randint(0, 255, (M, 3))
        nrm = rng.randn(M, 3)
        mesh_raw[:, 6:9] = nrm / np.linalg.norm(nrm, axis=1, keepdims=True)

        had_float = hasattr(np, "float")
        if not had_float:                                 # numpy>=2
            np.float = float                              # noqa: NPY001
        orig_load = np.load
        np.load = lambda *a, **k: mesh_raw
        try:
            torch.manual_seed(0)
            ref = ref_dgcnn_cls(
                {"feat_dim": 128, "n_mesh_node": M, "model_pth": "x"}, 1)
        finally:
            np.load = orig_load
            if not had_float:
                del np.float
        ref.eval()
        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

        cld = rng.randn(1, N, 9).astype(np.float32) * 0.1

        # our mesh input: the same normalisation load_mesh applies
        pts = mesh_raw[:, :3] / 1000.0
        rgb_n = (mesh_raw[:, 3:6] / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        mesh_x = jnp.asarray(np.concatenate(
            [pts, rgb_n, mesh_raw[:, 6:9]], axis=1).astype(np.float32))

        model = GeoMatchDGCNN()
        gt = {
            "cld_rgb_nrm": jnp.asarray(cld),
            "labels": jnp.ones((1, N), jnp.int32),
            "origin_labels": jnp.ones((1, N), jnp.int32),
            "match_idx": jnp.zeros((1, N), jnp.int32),
            "visible_flag": jnp.ones((1, M), jnp.int32),
            "RT": jnp.tile(jnp.eye(3, 4), (1, 1, 1)),
        }
        r = jax.random.PRNGKey(0)
        v = model.init({"params": r, "dropout": jax.random.fold_in(r, 1)},
                       gt, mesh_x, train=True)
        newp, news, report = import_state_dict(
            v["params"], v["batch_stats"], sd)
        assert not report["missing"], report["missing"][:4]
        assert not report["unused"], report["unused"][:4]

        out_ours = model.apply(
            {"params": newp, "batch_stats": news},
            {"cld_rgb_nrm": jnp.asarray(cld)}, mesh_x, train=False)

        with torch.no_grad():
            out_ref = ref({"cld_rgb_nrm": torch.tensor(
                np.transpose(cld, (0, 2, 1)))})

        for key, ours in (("rgbd", np.asarray(out_ours["rgbd"])),
                          ("seg", np.asarray(out_ours["seg"])),
                          ("mesh", np.asarray(out_ours["mesh"])[None])):
            rf = np.transpose(out_ref[key].numpy(), (0, 2, 1))
            rel = np.linalg.norm(ours - rf) / np.linalg.norm(rf)
            assert rel < 1e-5, (key, rel)


class TestMatchingLossParity:
    def _reference_value(self, ref_geomatch_cls, prob, positive_r):
        import torch

        GeoMatch, CircleLoss = ref_geomatch_cls
        rgbd, mesh_feats, mesh_xyz, labels, match_idx, vis, RT = prob
        # .cuda() is already no-op'd by the module fixture
        shim = types.SimpleNamespace(
            positive_r=positive_r,
            feat_dim=rgbd.shape[2],
            circle_loss=CircleLoss(16),
            model_emb=types.SimpleNamespace(
                sys_corr_idx=None,
                _buffers={"xyz": torch.tensor(mesh_xyz)}),
        )
        shim.matching_loss = (
            lambda *a: GeoMatch.matching_loss(shim, *a))
        x = {
            "labels": torch.tensor(labels, dtype=torch.int64),
            "match_idx": torch.tensor(match_idx, dtype=torch.int64),
            "RT": torch.tensor(RT),
            "visible_flag": torch.tensor(vis, dtype=torch.int64),
        }
        loss = GeoMatch.pointwise_feature_matching(
            shim,
            torch.tensor(np.transpose(rgbd, (0, 2, 1))),
            torch.tensor(mesh_feats.T[None]),
            x)
        return float(loss)

    def _our_value(self, prob, positive_r):
        import jax.numpy as jnp

        from gdm_tpu.losses.matching import pointwise_matching_loss

        rgbd, mesh_feats, mesh_xyz, labels, match_idx, vis, RT = prob
        return float(pointwise_matching_loss(
            jnp.asarray(rgbd), jnp.asarray(mesh_feats),
            jnp.asarray(mesh_xyz), jnp.asarray(labels),
            jnp.asarray(match_idx), jnp.asarray(vis),
            positive_r=positive_r))

    def test_value_matches_reference(self, ref_geomatch_cls):
        rng = np.random.RandomState(0)
        prob = _random_problem(rng)
        r = 0.04
        ref = self._reference_value(ref_geomatch_cls, prob, r)
        ours = self._our_value(prob, r)
        assert ours == pytest.approx(ref, rel=2e-5), (ours, ref)

    def test_skips_elements_with_few_foreground(self, ref_geomatch_cls):
        rng = np.random.RandomState(1)
        # second element has only 2 fg points -> reference `continue`s it
        prob = _random_problem(rng, fg_counts=(50, 2))
        r = 0.03
        ref = self._reference_value(ref_geomatch_cls, prob, r)
        ours = self._our_value(prob, r)
        assert ours == pytest.approx(ref, rel=2e-5), (ours, ref)

    def test_all_unmatched_points(self, ref_geomatch_cls):
        rng = np.random.RandomState(2)
        prob = list(_random_problem(rng, B=1, fg_counts=(30,)))
        prob[4] = np.full_like(prob[4], prob[1].shape[0])  # all -> pad col
        r = 0.05
        ref = self._reference_value(ref_geomatch_cls, tuple(prob), r)
        ours = self._our_value(tuple(prob), r)
        assert ours == pytest.approx(ref, rel=2e-5), (ours, ref)
