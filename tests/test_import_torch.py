"""Torch-checkpoint import round trip.

Builds the flax GeoMatch trees, exports them to a reference-named torch
state dict (export_state_dict), perturbs the values, re-imports, and
checks every leaf is restored bit-exactly — validating the name map
covers the whole tree and every layout conversion is self-consistent.
"""

import numpy as np
import pytest

import conftest  # noqa: F401
from gdm_tpu.train.import_torch import (
    export_state_dict,
    flax_to_torch_keymap,
    import_state_dict,
)


@pytest.fixture(scope="module")
def trees():
    import jax
    import jax.numpy as jnp

    from gdm_tpu.data.pipeline import assemble_inputs
    from gdm_tpu.data.synthetic import make_batch, make_object
    from gdm_tpu.models import GeoMatch
    from gdm_tpu.models.geomatch import MeshArrays
    from gdm_tpu.models.spline_mesh import build_mesh_graph

    im, n_mesh, n_sample = 64, 64, 256
    K = np.array([[280.0, 0, im / 2], [0, 280.0, im / 2], [0, 0, 1]],
                 np.float32)
    rng = np.random.RandomState(0)
    mesh_fps = make_object(n_mesh, rng)
    mesh = MeshArrays.from_graph(build_mesh_graph(mesh_fps, n_mesh))
    data, _ = make_batch(mesh_fps, 1, K, im_size=im, n_sample=n_sample)
    b = {k: jnp.array(v) for k, v in data.items()}
    inputs = assemble_inputs(b["rgb"], b["cld_rgb_nrm"], b["choose"],
                             b["xyz_img"], labels=b["labels"],
                             match_idx=b["match_idx"],
                             visible_flag=b["visible_flag"], RT=b["RT"],
                             knn_chunk=64)
    model = GeoMatch(positive_r=0.01)
    v = jax.jit(lambda r: model.init(
        {"params": r, "dropout": jax.random.fold_in(r, 1)},
        inputs, mesh, train=True))(jax.random.PRNGKey(0))
    return v["params"], v["batch_stats"]


class TestKeymap:
    def test_covers_every_leaf(self, trees):
        params, stats = trees
        keymap = flax_to_torch_keymap(params, stats)
        from flax.traverse_util import flatten_dict

        n_leaves = len(flatten_dict(params)) + len(flatten_dict(stats))
        assert len(keymap) == n_leaves

    def test_torch_names_look_like_reference(self, trees):
        keymap = flax_to_torch_keymap(*trees)
        names = {t for t, _ in keymap.values()}
        # spot checks against the reference module tree
        assert "awl.params" in names
        assert "seg_layer.0.conv.weight" in names
        assert "seg_layer.3.conv.bias" in names
        assert "feature_encoding_layer.2.normlayer.bn.running_mean" in names
        assert "model_emb.mesh_convs.0.weight" in names
        assert "model_emb.mesh_final.weight" in names
        assert "pcd_emb.cnn_pre_stages.0.weight" in names
        assert "pcd_emb.cnn_ds_stages.2.1.1.conv2.weight" in names  # layer4
        assert "pcd_emb.cnn_ds_stages.3.0.bottleneck.bias" in names
        assert "pcd_emb.cnn_up_stages.0.0.conv.1.weight" in names
        assert "pcd_emb.cnn_up_stages.2.0.0.weight" in names        # final
        assert "pcd_emb.rndla_pre_stages.conv.weight" in names
        assert ("pcd_emb.rndla_ds_stages.0.lfa.att_pooling_1.fc.weight"
                in names)
        # RandLA side uses models/RandLA/pytorch_utils (BN attr `bn`),
        # not models/pytorch_utils (`normlayer`)
        assert "pcd_emb.rndla_up_stages.3.bn.bn.weight" in names
        assert "pcd_emb.rndla_ds_stages.0.mlp1.bn.bn.running_mean" in names
        assert "pcd_emb.ds_fuse_r2p_pre_layers.0.conv.weight" in names
        assert "pcd_emb.up_fuse_p2r_fuse_layers.2.conv.weight" in names

    def test_no_duplicate_torch_keys(self, trees):
        keymap = flax_to_torch_keymap(*trees)
        names = [t for t, _ in keymap.values()]
        assert len(names) == len(set(names))


@pytest.mark.skipif(not __import__("os.path", fromlist=["isdir"]).isdir(
    "/root/reference"), reason="reference tree not available")
class TestReferenceKeyParity:
    """Diff our exporter's pcd_emb names against the ACTUAL reference
    FFB6DEmb().state_dict() keys (models/ffb6d.py) — catches name-map
    drift a synthetic round trip can't (it found the RandLA `bn.bn` vs
    `normlayer.bn` split and the shared-cnn.final duplicate names)."""

    @staticmethod
    def _reference_pcd_emb_keys():
        import sys
        import types

        import torch
        import torch.utils.model_zoo as mz

        stubs = [
            "cpp_wrappers", "cpp_wrappers.cpp_subsampling",
            "cpp_wrappers.cpp_subsampling.grid_subsampling",
            "nearest_neighbors", "nearest_neighbors.lib",
            "nearest_neighbors.lib.python",
            "nearest_neighbors.lib.python.nearest_neighbors",
            "torch_geometric", "torch_geometric.data",
        ]
        added_mods = []
        for name in stubs:
            if name not in sys.modules:
                mod = types.ModuleType(name)
                if name == "torch_geometric.data":
                    mod.Data = object
                sys.modules[name] = mod
                added_mods.append(name)
        orig_load_url = mz.load_url
        orig_lsd = torch.nn.Module.load_state_dict
        mz.load_url = lambda *a, **k: {}
        torch.nn.Module.load_state_dict = lambda self, sd, *a, **k: None
        paths = ["/root/reference/models/RandLA", "/root/reference"]
        before = set(sys.modules)
        sys.path[:0] = paths
        try:
            from config.lmo_cfg import ConfigRandLA
            from models.ffb6d import FFB6DEmb

            return set(FFB6DEmb(ConfigRandLA()).state_dict().keys())
        finally:
            mz.load_url = orig_load_url
            torch.nn.Module.load_state_dict = orig_lsd
            for p in paths:
                sys.path.remove(p)
            # drop reference modules + stubs so nothing leaks into other
            # tests (the reference uses generic top-level names: models,
            # config, utils, helper_tool, ...)
            for name in (set(sys.modules) - before) | set(added_mods):
                sys.modules.pop(name, None)

    def test_pcd_emb_names_match_reference_model(self, trees):
        ref = {k for k in self._reference_pcd_emb_keys()
               if not k.endswith("num_batches_tracked")}
        sd = export_state_dict(*trees)
        ours = {k[len("pcd_emb."):] for k in sd
                if k.startswith("pcd_emb.")}
        assert sorted(ours - ref) == []    # we emit nothing fictional
        assert sorted(ref - ours) == []    # and cover every real tensor


class TestRoundTrip:
    def test_export_import_identity(self, trees):
        params, stats = trees
        rng = np.random.RandomState(1)
        # perturb so the test can't pass by keeping init values
        import jax

        noisy_p = jax.tree_util.tree_map(
            lambda x: np.asarray(x) + rng.randn(*np.shape(x)).astype(
                np.asarray(x).dtype), params)
        noisy_s = jax.tree_util.tree_map(
            lambda x: np.asarray(x) + rng.randn(*np.shape(x)).astype(
                np.asarray(x).dtype), stats)
        sd = export_state_dict(noisy_p, noisy_s)
        # torch checkpoints carry 'module.' prefixes from DDP
        sd = {"module." + k: v for k, v in sd.items()}
        got_p, got_s, report = import_state_dict(params, stats, sd)
        assert not report["missing"]
        assert not report["unused"]

        from flax.traverse_util import flatten_dict

        for a, b in ((noisy_p, got_p), (noisy_s, got_s)):
            fa, fb = flatten_dict(a), flatten_dict(b)
            assert set(fa) == set(fb)
            for k in fa:
                np.testing.assert_array_equal(
                    np.asarray(fa[k]), np.asarray(fb[k]),
                    err_msg="/".join(map(str, k)))

    def test_torch_conv_orientation(self, trees):
        """A torch conv2d tensor lands in flax HWIO order."""
        params, stats = trees
        sd = export_state_dict(params, stats)
        w = sd["pcd_emb.cnn_pre_stages.0.weight"]
        assert w.shape == (64, 3, 7, 7)                    # torch OIHW
        got_p, _, _ = import_state_dict(params, stats, sd)
        assert np.shape(
            got_p["pcd_emb"]["cnn"]["feats"]["conv1"]["kernel"]) \
            == (7, 7, 3, 64)

    def test_spline_root_lin_fallback(self, trees):
        params, stats = trees
        sd = export_state_dict(params, stats)
        root = sd.pop("model_emb.mesh_convs.0.root")
        sd["model_emb.mesh_convs.0.lin.weight"] = root.T
        got_p, _, report = import_state_dict(params, stats, sd)
        np.testing.assert_array_equal(
            np.asarray(got_p["model_emb"]["conv_0"]["root"]), root)
