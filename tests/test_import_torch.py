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


def _reference_ffb6d_state_dict():
    """Instantiate the ACTUAL reference FFB6DEmb (models/ffb6d.py, pure
    torch) with its compiled extensions stubbed (tests/reference_stubs),
    and return it with a numpy state dict of a seeded random init.
    load_state_dict is no-op'd only during construction (the reference's
    ResNet builder strict-loads downloaded weights; no egress here), so
    the returned module supports real strict loads and forwards."""
    import torch

    from reference_stubs import reference_imports

    with reference_imports(patch_load_state_dict=True):
        from config.lmo_cfg import ConfigRandLA
        from models.ffb6d import FFB6DEmb

        torch.manual_seed(0)
        m = FFB6DEmb(ConfigRandLA())
    m.eval()
    return m, {k: v.detach().numpy() for k, v in m.state_dict().items()}


@pytest.mark.skipif(not __import__("os.path", fromlist=["isdir"]).isdir(
    "/root/reference"), reason="reference tree not available")
class TestReferenceParity:
    """Validate against the ACTUAL reference model, not just round trips.
    The key diff caught the RandLA `bn.bn` vs `normlayer.bn` split and
    the shared-cnn.final duplicate names; the forward diff caught torch
    pad-1 vs XLA SAME padding on stride-2 ResNet convs."""

    @pytest.fixture(scope="class")
    def ref_model(self):
        return _reference_ffb6d_state_dict()

    def test_pcd_emb_names_match_reference_model(self, trees, ref_model):
        _, sd_ref = ref_model
        ref = set(sd_ref)                  # incl. num_batches_tracked
        sd = export_state_dict(*trees)
        ours = {k[len("pcd_emb."):] for k in sd
                if k.startswith("pcd_emb.")}
        assert sorted(ours - ref) == []    # we emit nothing fictional
        assert sorted(ref - ours) == []    # and cover every real tensor

    def test_export_strict_loads_into_reference(self, trees, ref_model):
        """Trained-TPU-weights -> reference .pth flow: the export (with
        a shape template) must satisfy torch's strict load."""
        import torch

        ref, sd_ref = ref_model
        sd = export_state_dict(
            *trees, like={"pcd_emb." + k: v for k, v in sd_ref.items()})
        sub = {k[len("pcd_emb."):]: torch.tensor(np.ascontiguousarray(v))
               for k, v in sd.items() if k.startswith("pcd_emb.")}
        try:
            ref.load_state_dict(sub, strict=True)  # raises on mismatch
        finally:
            # the fixture is class-scoped; later tests compare against
            # the original weights
            ref.load_state_dict(
                {k: torch.tensor(v) for k, v in sd_ref.items()},
                strict=True)

    def test_forward_matches_reference_model(self, ref_model):
        """Import the reference's random-init weights and compare the
        full FFB6D forward on one synthetic frame (eval mode, f32)."""
        import jax
        import jax.numpy as jnp
        import torch

        from gdm_tpu.data.pipeline import assemble_inputs
        from gdm_tpu.data.synthetic import make_batch, make_object
        from gdm_tpu.models.ffb6d import FFB6DEmb as OurFFB6D

        ref, sd = ref_model
        im, n = 64, 1024
        K = np.array([[280.0, 0, im / 2], [0, 280.0, im / 2], [0, 0, 1]],
                     np.float32)
        rng = np.random.RandomState(0)
        mesh_fps = make_object(256, rng, radius=0.06)
        data, _ = make_batch(mesh_fps, 1, K, im_size=im, n_sample=n,
                             seed=3)
        inp = assemble_inputs(
            jnp.asarray(data["rgb"]), jnp.asarray(data["cld_rgb_nrm"]),
            jnp.asarray(data["choose"]), jnp.asarray(data["xyz_img"]),
            knn_chunk=256, approx=False)
        inp = jax.device_get(inp)
        inp_j = {k: jnp.asarray(v) for k, v in inp.items()}

        model = OurFFB6D()
        v = model.init(jax.random.PRNGKey(0), inp_j, train=False)
        newp, news, report = import_state_dict(
            {"pcd_emb": v["params"]}, {"pcd_emb": v["batch_stats"]},
            {"pcd_emb." + k: vv for k, vv in sd.items()})
        assert not report["missing"] and not report["unused"]
        out_ours = np.asarray(model.apply(
            {"params": newp["pcd_emb"], "batch_stats": news["pcd_emb"]},
            inp_j, train=False))                          # [1, N, 128]

        def t(x, dt=torch.float32):
            return torch.from_numpy(np.ascontiguousarray(x)).to(dt)

        tin = {
            "rgb": t(np.transpose(data["rgb"], (0, 3, 1, 2))),
            "cld_rgb_nrm": t(np.transpose(data["cld_rgb_nrm"],
                                          (0, 2, 1))),
            "choose": t(data["choose"][:, None, :], torch.int64),
        }

        def idx3(a):
            a = np.asarray(a)
            return a[..., None] if a.ndim == 2 else a

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
        with torch.no_grad():
            out_ref = ref(tin).numpy()                    # [1, 128, N]
        out_ref = np.transpose(out_ref, (0, 2, 1))

        rel = (np.linalg.norm(out_ours - out_ref)
               / np.linalg.norm(out_ref))
        assert rel < 1e-5, rel
        assert np.abs(out_ours - out_ref).max() < 1e-3


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


class TestTorchvisionBackbone:
    """ImageNet backbone init (import_torchvision_resnet): the
    reference's pretrained=True (models/cnn/pspnet.py:50-53), loaded by
    NAME instead of extractors.py:25-29's positional zip (which
    misaligns on num_batches_tracked buffers)."""

    def _tv_state(self, params, stats, rng):
        """Synthesize a torchvision-style resnet state_dict whose shapes
        match the fixture's backbone, plus the extras a real ImageNet
        file carries (fc head, BN step counters)."""
        from flax.traverse_util import flatten_dict

        from gdm_tpu.train.import_torch import _tv_resnet_key

        sd = {}
        for col, tree in (("params", params), ("batch_stats", stats)):
            flat = flatten_dict(tree["pcd_emb"]["cnn"]["feats"])
            for path, leaf in flat.items():
                tkey, conv = _tv_resnet_key(
                    tuple(str(x) for x in path), col)
                if tkey in sd:
                    continue
                shape = np.shape(leaf)
                if conv.__name__ == "_conv2d_fwd":     # HWIO -> OIHW
                    shape = (shape[3], shape[2], shape[0], shape[1])
                sd[tkey] = rng.randn(*shape).astype(np.float32)
        sd["fc.weight"] = rng.randn(1000, 512).astype(np.float32)
        sd["fc.bias"] = rng.randn(1000).astype(np.float32)
        sd["bn1.num_batches_tracked"] = np.int64(7)
        return sd

    def test_import_replaces_backbone_only(self, trees):
        from flax.traverse_util import flatten_dict

        from gdm_tpu.train.import_torch import import_torchvision_resnet

        params, stats = trees
        sd = self._tv_state(params, stats, np.random.RandomState(3))
        new_p, new_s, report = import_torchvision_resnet(params, stats, sd)
        assert report["unused"] == []
        # conv layout: OIHW -> HWIO
        np.testing.assert_array_equal(
            np.asarray(new_p["pcd_emb"]["cnn"]["feats"]["conv1"]["kernel"]),
            np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
        # BN affine + running stats by name
        feats_s = new_s["pcd_emb"]["cnn"]["feats"]
        np.testing.assert_array_equal(
            np.asarray(feats_s["bn1"]["mean"]), sd["bn1.running_mean"])
        np.testing.assert_array_equal(
            np.asarray(new_p["pcd_emb"]["cnn"]["feats"]["layer2_0"]
                       ["downsample_bn"]["scale"]),
            sd["layer2.0.downsample.1.weight"])
        # every backbone leaf replaced, nothing outside it touched
        for col, old, new in (("params", params, new_p),
                              ("batch_stats", stats, new_s)):
            fo, fn = flatten_dict(old), flatten_dict(new)
            assert set(fo) == set(fn)
            for k in fo:
                inside = k[:3] == ("pcd_emb", "cnn", "feats")
                same = np.array_equal(np.asarray(fo[k]), np.asarray(fn[k]))
                if not inside:
                    assert same, "/".join(map(str, k))

    def test_shape_mismatch_raises(self, trees):
        from gdm_tpu.train.import_torch import import_torchvision_resnet

        params, stats = trees
        sd = self._tv_state(params, stats, np.random.RandomState(4))
        sd["layer1.0.conv1.weight"] = np.zeros((65, 64, 3, 3), np.float32)
        with pytest.raises(ValueError, match="shape mismatch"):
            import_torchvision_resnet(params, stats, sd)

    def test_missing_key_raises(self, trees):
        from gdm_tpu.train.import_torch import import_torchvision_resnet

        params, stats = trees
        sd = self._tv_state(params, stats, np.random.RandomState(5))
        del sd["conv1.weight"]
        with pytest.raises(KeyError, match="conv1.weight"):
            import_torchvision_resnet(params, stats, sd)

    def test_load_pretrained_backbone_npz_and_pth(self, trees, tmp_path):
        from gdm_tpu.train.import_torch import load_pretrained_backbone

        params, stats = trees
        sd = self._tv_state(params, stats, np.random.RandomState(6))

        class S:
            def __init__(self, p, s):
                self.params, self.batch_stats = p, s

            def replace(self, **kw):
                return S(kw.get("params", self.params),
                         kw.get("batch_stats", self.batch_stats))

        npz = tmp_path / "resnet.npz"
        np.savez(npz, **sd)
        got = load_pretrained_backbone(S(params, stats), str(npz))
        np.testing.assert_array_equal(
            np.asarray(got.params["pcd_emb"]["cnn"]["feats"]["conv1"]
                       ["kernel"]),
            np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))

        torch = pytest.importorskip("torch")
        pth = tmp_path / "resnet18.pth"
        torch.save({k: torch.from_numpy(np.asarray(v).copy())
                    for k, v in sd.items()}, str(pth))
        got2 = load_pretrained_backbone(S(params, stats), str(pth))
        np.testing.assert_array_equal(
            np.asarray(got2.batch_stats["pcd_emb"]["cnn"]["feats"]["bn1"]
                       ["var"]),
            sd["bn1.running_var"])
