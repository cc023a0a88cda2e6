"""Import reference PyTorch checkpoints (.pth.tar) into flax trees.

The reference saves {'model_state': state_dict, 'optimizer_state', 'epoch'}
per object (train_lm.py:102-117).  This module maps every tensor of the
reference GeoMatch state dict onto the gdm_tpu GeoMatch parameter /
batch-stats pytrees, with the layout conversions:

  torch Conv2d  [out, in, kh, kw] -> flax nn.Conv kernel [kh, kw, in, out]
  torch Conv1d/Conv2d 1x1 (point MLPs) -> flax Dense kernel [in, out]
  torch Linear  [out, in]         -> flax Dense kernel [in, out]
  torch BN weight/bias/running_*  -> flax scale/bias + batch_stats mean/var
  PyG SplineConv weight [K, in, out] / root [in, out] / bias -> unchanged
  torch PReLU weight [1]          -> flax PReLU alpha

Name correspondence is derived from both module trees:
reference models/geoMatch.py:29-52 (heads), models/ffb6d.py:22-122 (stage
ModuleLists), models/RandLA/RandLANet.py:12-39,674-754 (fc0 / dilated
blocks / decoders), models/pytorch_utils.py:70-124 (_ConvBase children
`conv` + `normlayer.bn`), models/cnn/pspnet.py (PSPModule.stages/bottleneck,
PSPUpsample.conv Sequential, Modified_PSPNet.final), models/SplineCNN.py
(mesh_convs / mesh_final).

Two reference quirks the map reproduces (validated by diffing against the
actual ``FFB6DEmb().state_dict()`` keys, tests/test_import_torch.py):
  * the RandLA-side blocks are built from models/RandLA/pytorch_utils.py,
    whose BN wrapper attr is ``bn`` (-> keys ``...bn.bn.*``), while the
    CNN/fusion side uses models/pytorch_utils.py's ``normlayer``
    (-> ``...normlayer.bn.*``);
  * ``cnn.final`` is ONE module registered under two cnn_up_stages slots
    (ffb6d.py:76-81), so torch state dicts carry the same tensors under
    both ``cnn_up_stages.2.0.0.*`` and ``cnn_up_stages.3.1.0.*``.
"""

from __future__ import annotations

import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict

# torch BN suffix per flax leaf name (params vs batch_stats collection)
_BN_PARAM = {"scale": "weight", "bias": "bias"}
_BN_STATS = {"mean": "running_mean", "var": "running_var"}

_PSP_SIZE_TO_IDX = {"1": 0, "2": 1, "3": 2, "6": 3}
# shared cnn.final module -> duplicate state-dict names (ffb6d.py:76-81)
_ALIASES = {
    "pcd_emb.cnn_up_stages.2.0.0.weight":
        "pcd_emb.cnn_up_stages.3.1.0.weight",
    "pcd_emb.cnn_up_stages.2.0.0.bias":
        "pcd_emb.cnn_up_stages.3.1.0.bias",
}
# DGCNN variant: bn1..bn8 are registered both as attributes and inside
# the conv Sequentials (dgcnn.py:67-100) -> duplicate names convN.1.*
for _root in ("pcd_emb", "model_emb"):
    for _n in range(1, 9):
        for _leaf in ("weight", "bias", "running_mean", "running_var"):
            _ALIASES[f"{_root}.bn{_n}.{_leaf}"] = \
                f"{_root}.conv{_n}.1.{_leaf}"

# torch buffers the reference registers but that are model INPUTS here
# (mesh geometry/graph constants) — expected in checkpoints, not a gap
_IGNORED_BUFFERS = (
    "model_emb.mesh", "model_emb.xyz", "model_emb.mesh_graph_x",
    "model_emb.mesh_graph_edge_index", "model_emb.mesh_graph_edge_attr",
    "model_emb.const_one", "model_emb.sys_idx",
)
_UP_TO_STAGE = {"up_1": "0.0", "up_2": "1.0", "up_3": "3.0"}
_FUSE = {
    "ds_r2p_pre": "ds_fuse_r2p_pre_layers",
    "ds_r2p_fuse": "ds_fuse_r2p_fuse_layers",
    "ds_p2r_pre": "ds_fuse_p2r_pre_layers",
    "ds_p2r_fuse": "ds_fuse_p2r_fuse_layers",
    "up_r2p_pre": "up_fuse_r2p_pre_layers",
    "up_r2p_fuse": "up_fuse_r2p_fuse_layers",
    "up_p2r_pre": "up_fuse_p2r_pre_layers",
    "up_p2r_fuse": "up_fuse_p2r_fuse_layers",
}


def _conv2d_fwd(w):
    return np.transpose(w, (2, 3, 1, 0))


def _conv2d_inv(k):
    return np.transpose(k, (3, 2, 0, 1))


def _dense_fwd(w):
    # [out, in] or [out, in, 1] or [out, in, 1, 1] -> [in, out]
    return np.asarray(w).reshape(w.shape[0], w.shape[1]).T


def _identity(w):
    return np.asarray(w)


def _map_bn(torch_prefix, leaf, collection):
    table = _BN_PARAM if collection == "params" else _BN_STATS
    return f"{torch_prefix}.{table[leaf]}", _identity


def _resnet_block_prefix(stage: int, block: int) -> str:
    """flax feats/layer{L}_{b} -> torch cnn_ds_stages index path.

    cnn_ds_stages = [layer1, layer2, Seq(layer3, layer4), Seq(psp, drop)]
    (ffb6d.py:31-37)."""
    if stage == 1:
        return f"cnn_ds_stages.0.{block}"
    if stage == 2:
        return f"cnn_ds_stages.1.{block}"
    if stage == 3:
        return f"cnn_ds_stages.2.0.{block}"
    return f"cnn_ds_stages.2.1.{block}"


def _map_leaf(collection: str, path: tuple[str, ...]):
    """Return (torch_key, convert_fn(torch_tensor) -> np.ndarray).

    path is the flattened flax path, e.g.
    ('pcd_emb', 'cnn', 'feats', 'layer1_0', 'bn1', 'scale').
    """
    leaf = path[-1]
    p = "/".join(path)

    # ---------- heads (geoMatch.py:29-52) ----------
    if path[0] == "awl":
        return "awl.params", _identity
    if path[0] in ("seg_layer", "feature_encoding_layer"):
        i = int(path[1].split("_")[-1])
        base = f"{path[0]}.{i}"
        if path[2] == "Dense_0":
            return (f"{base}.conv.weight" if leaf == "kernel"
                    else f"{base}.conv.bias"), (
                _dense_fwd if leaf == "kernel" else _identity)
        return _map_bn(f"{base}.normlayer.bn", leaf, collection)
    if path[0] == "normalize_feature_layer":
        if path[1] == "Dense_0":
            return "normalize_feature_layer.conv.weight", _dense_fwd
        return _map_bn("normalize_feature_layer.normlayer.bn", leaf,
                       collection)

    # ---------- mesh branch (SplineCNN.py mesh_convs/mesh_final) ----------
    if path[0] == "model_emb":
        if path[1] == "trunk":                 # DGCNN variant (dgcnn.py)
            return _map_dgcnn_trunk("model_emb", path, leaf, collection)
        if path[1].startswith("conv_"):
            i = int(path[1].split("_")[-1])
            return f"model_emb.mesh_convs.{i}.{leaf}", _identity
        if path[1] == "mesh_final":
            return (f"model_emb.mesh_final.weight", _dense_fwd) \
                if leaf == "kernel" else (
                    "model_emb.mesh_final.bias", _identity)

    # ---------- FFB6D scene branch ----------
    if path[0] == "pcd_emb":
        tkey, conv = _map_pcd_emb(path, leaf, collection)
        return "pcd_emb." + tkey, conv

    raise KeyError(f"no torch mapping for flax leaf {collection}:{p}")


def _map_dgcnn_trunk(root, path, leaf, collection):
    """DgcnnPcdEmb / DgcnnMeshEmb trunk (dgcnn.py:58-236): conv1..conv8
    are Sequential(Conv, bnN-shared, LeakyReLU); conv9 a bare Conv1d.

    root: torch prefix ('' when the caller prepends one, _map_pcd_emb)."""
    pre = root + "." if root else ""
    conv = path[2]                              # 'conv1'..'conv9' / 'dp1'
    if conv == "conv9":                         # bare conv, no BN
        return f"{pre}conv9.weight", _dense_fwd
    n = int(conv[4:])
    if path[3] == "Dense_0":
        return f"{pre}{conv}.0.weight", _dense_fwd
    return _map_bn(f"{pre}bn{n}", leaf, collection)


def _map_pcd_emb(path, leaf, collection):
    sub = path[1]
    if sub == "trunk":                          # DGCNN variant
        return _map_dgcnn_trunk("", path, leaf, collection)

    # fusion 1x1 conv2d blocks (ffb6d.py:44-122)
    for flax_name, torch_list in _FUSE.items():
        if sub.startswith(flax_name + "_") and sub[len(flax_name) + 1:
                                                   ].isdigit():
            i = int(sub.split("_")[-1])
            base = f"{torch_list}.{i}"
            if path[2] == "Dense_0":
                return f"{base}.conv.weight", _dense_fwd
            return _map_bn(f"{base}.normlayer.bn", leaf, collection)

    if sub == "cnn":
        node = path[2]
        if node == "feats":
            feat = path[3]
            if feat == "conv1":
                return "cnn_pre_stages.0.weight", _conv2d_fwd
            if feat == "bn1":
                return _map_bn("cnn_pre_stages.1", leaf, collection)
            stage, block = feat[5:].split("_")
            base = _resnet_block_prefix(int(stage), int(block))
            child = path[4]
            if child in ("conv1", "conv2"):
                return f"{base}.{child}.weight", _conv2d_fwd
            if child == "downsample_conv":
                return f"{base}.downsample.0.weight", _conv2d_fwd
            if child == "downsample_bn":
                return _map_bn(f"{base}.downsample.1", leaf, collection)
            return _map_bn(f"{base}.{child}", leaf, collection)
        if node == "psp":
            if path[3].startswith("stage_"):
                idx = _PSP_SIZE_TO_IDX[path[3].split("_")[-1]]
                return (f"cnn_ds_stages.3.0.stages.{idx}.1.weight",
                        _conv2d_fwd)
            # bottleneck
            return (f"cnn_ds_stages.3.0.bottleneck.{leaf.replace('kernel', 'weight')}",
                    _conv2d_fwd if leaf == "kernel" else _identity)
        if node in _UP_TO_STAGE:
            base = f"cnn_up_stages.{_UP_TO_STAGE[node]}.conv"
            child = path[3]
            if child == "conv":
                return (f"{base}.1.weight", _conv2d_fwd) \
                    if leaf == "kernel" else (f"{base}.1.bias",
                                              _identity)
            if child == "bn":
                return _map_bn(f"{base}.2", leaf, collection)
            if child == "prelu":
                return f"{base}.3.weight", _identity
        if node == "final_conv":
            return (f"cnn_up_stages.2.0.0.{leaf.replace('kernel', 'weight')}",
                    _conv2d_fwd if leaf == "kernel" else _identity)

    if sub == "rndla":
        node = path[2]
        # NOTE: RandLA modules use models/RandLA/pytorch_utils.py whose BN
        # wrapper attr is `bn` (state-dict `...bn.bn.*`), unlike the
        # CNN/fusion side's `normlayer`
        if node == "fc0":
            if path[3] == "Dense_0":
                return "rndla_pre_stages.conv.weight", _dense_fwd
            return _map_bn("rndla_pre_stages.bn.bn", leaf, collection)
        if node.startswith("up_"):
            j = int(node.split("_")[-1])
            base = f"rndla_up_stages.{j}"
            if path[3] == "Dense_0":
                return f"{base}.conv.weight", _dense_fwd
            return _map_bn(f"{base}.bn.bn", leaf, collection)
        if node.startswith("ds_"):
            i = int(node.split("_")[-1])
            base = f"rndla_ds_stages.{i}"
            rest = path[3:]
            if rest[0] == "lfa":
                base += ".lfa"
                rest = rest[1:]
            if rest[0].startswith("att_pooling"):
                base += f".{rest[0]}"
                if rest[1] == "fc":
                    return f"{base}.fc.weight", _dense_fwd
                base += ".mlp"
                rest = rest[2:]
            else:
                base += f".{rest[0]}"
                rest = rest[1:]
            if rest[0] == "Dense_0":
                return f"{base}.conv.weight", _dense_fwd
            return _map_bn(f"{base}.bn.bn", leaf, collection)

    raise KeyError(
        f"no torch mapping for flax leaf {collection}:pcd_emb/"
        + "/".join(path[1:]))


def flax_to_torch_keymap(params, batch_stats):
    """{(collection, flax_path): (torch_key, convert_fn)} for every leaf."""
    out = {}
    for col, tree in (("params", params), ("batch_stats", batch_stats)):
        for path in flatten_dict(tree, sep=None):
            out[(col, path)] = _map_leaf(col, tuple(str(x) for x in path))
    return out


def import_state_dict(params, batch_stats, torch_state: dict,
                      strict: bool = True):
    """Map a reference torch state dict onto (params, batch_stats).

    Args:
      params/batch_stats: flax trees to use as the shape/structure spec.
      torch_state: {name: array-like} — pass tensors or numpy arrays.
      strict: raise when a flax leaf has no tensor in torch_state.

    Returns (new_params, new_batch_stats, report) where report lists
    unused torch keys and missing flax leaves.
    """
    torch_np = {k[len("module."):] if k.startswith("module.") else k:
                np.asarray(v) for k, v in torch_state.items()}
    keymap = flax_to_torch_keymap(params, batch_stats)
    new = {"params": {}, "batch_stats": {}}
    used, missing = set(), []
    flat = {"params": flatten_dict(params),
            "batch_stats": flatten_dict(batch_stats)}
    out_flat = {"params": {}, "batch_stats": {}}
    for (col, path), (tkey, conv) in keymap.items():
        if tkey not in torch_np and _ALIASES.get(tkey) in torch_np:
            tkey = _ALIASES[tkey]           # shared-module duplicate name
        if tkey not in torch_np:
            # PyG SplineConv fallback: `root` stored as `lin.weight` [out,in]
            alt = tkey.replace(".root", ".lin.weight")
            if alt in torch_np and tkey.endswith(".root"):
                val = np.asarray(torch_np[alt]).T
                used.add(alt)
            else:
                missing.append((col, path, tkey))
                out_flat[col][path] = flat[col][path]
                continue
        else:
            val = conv(torch_np[tkey])
            used.add(tkey)
        want = np.shape(flat[col][path])
        if tuple(val.shape) != tuple(want):
            raise ValueError(
                f"shape mismatch at {col}:{'/'.join(map(str, path))} <- "
                f"{tkey}: torch {val.shape} vs flax {want}")
        out_flat[col][path] = val.astype(np.asarray(flat[col][path]).dtype)
    if strict and missing:
        names = ", ".join(t for _, _, t in missing[:10])
        raise KeyError(
            f"{len(missing)} flax leaves missing from torch checkpoint "
            f"(first: {names})")
    # duplicates of consumed tensors and torch BN step counters are
    # expected in real checkpoints — not a mapping gap
    for a, b in _ALIASES.items():
        if a in used or b in used:
            used.update((a, b))
    report = {
        "missing": missing,
        "unused": sorted(
            k for k in set(torch_np) - used
            if not k.endswith("num_batches_tracked")
            and k not in _IGNORED_BUFFERS),
    }
    new["params"] = unflatten_dict(out_flat["params"])
    new["batch_stats"] = unflatten_dict(out_flat["batch_stats"])
    return new["params"], new["batch_stats"], report


def export_state_dict(params, batch_stats, like: dict | None = None) -> dict:
    """Inverse of import_state_dict: flax trees -> reference-named torch
    state dict (numpy values).  Used for round-trip testing and for
    exporting trained TPU weights back to the reference format.

    like: optional {name: array-or-shape} template (e.g. an existing
    reference state dict); matching keys are reshaped to its ranks so the
    result loads with ``strict=True`` (torch stores 1x1 point convs as
    rank-3/4 tensors where this module's canonical form is [out, in])."""
    keymap = flax_to_torch_keymap(params, batch_stats)
    flat = {"params": flatten_dict(params),
            "batch_stats": flatten_dict(batch_stats)}
    out = {}
    for (col, path), (tkey, conv) in keymap.items():
        val = np.asarray(flat[col][path])
        if conv is _conv2d_fwd:
            out[tkey] = _conv2d_inv(val)
        elif conv is _dense_fwd:
            # restore [out, in]; 1x1 conv variants reload fine from 2-D
            # because import reshapes via _dense_fwd
            out[tkey] = val.T
        else:
            out[tkey] = val
    for a, b in _ALIASES.items():         # mirror shared-module names
        if a in out:
            out[b] = out[a]
    # torch BN modules also serialize a step counter; emit zeros so the
    # export loads into the reference with strict=True
    for k in list(out):
        if k.endswith(".running_mean"):
            out[k[:-len("running_mean")] + "num_batches_tracked"] = \
                np.zeros((), np.int64)
    if like:
        for k, v in out.items():
            t = like.get(k)
            if t is None:
                continue
            shape = tuple(t if isinstance(t, (tuple, list))
                          else np.shape(t))
            if shape != v.shape and int(np.prod(shape)) == v.size:
                out[k] = v.reshape(shape)
    return out


def _tv_resnet_key(path: tuple[str, ...], collection: str):
    """flax ResNetFeats leaf path -> torchvision resnet state_dict key.

    Torchvision naming: conv1/bn1 stem, ``layer{L}.{b}.conv{1,2}``,
    ``layer{L}.{b}.bn{1,2}``, ``layer{L}.{b}.downsample.{0,1}``; the
    classifier head ``fc.*`` has no counterpart here (ResNetFeats stops
    at layer4, extractors.py:200)."""
    leaf, node = path[-1], path[0]
    if node == "conv1":
        return "conv1.weight", _conv2d_fwd
    if node == "bn1":
        return _map_bn("bn1", leaf, collection)
    stage, block = node[len("layer"):].split("_")
    base = f"layer{stage}.{block}"
    child = path[1]
    if child in ("conv1", "conv2"):
        return f"{base}.{child}.weight", _conv2d_fwd
    if child == "downsample_conv":
        return f"{base}.downsample.0.weight", _conv2d_fwd
    if child == "downsample_bn":
        return _map_bn(f"{base}.downsample.1", leaf, collection)
    return _map_bn(f"{base}.{child}", leaf, collection)


def import_torchvision_resnet(params, batch_stats, torch_state: dict,
                              subtree=("pcd_emb", "cnn", "feats")):
    """Initialise the ResNet backbone from a torchvision ImageNet
    checkpoint (resnet18-5c106cde.pth / resnet34-333f7ec4.pth).

    The reference trains its CNN branch from these weights
    (models/cnn/pspnet.py:50-53 ``pretrained=True`` ->
    extractors.py:203-211 model_zoo download) but loads them
    POSITIONALLY — ``load_weights_sequential`` (extractors.py:25-29)
    zips two state dicts by order, which misaligns as soon as the
    target has ``num_batches_tracked`` buffers the source file predates
    (every torch >= 0.4).  Deliberate deviation: load by NAME.

    Args:
      params/batch_stats: full GeoMatch variable trees (shape spec).
      torch_state: torchvision state_dict ({name: tensor/ndarray}).
      subtree: path of the ResNetFeats module inside `params`.

    Returns (new_params, new_batch_stats, report); raises if any
    backbone leaf is missing or a shape mismatches (e.g. resnet34
    weights into a resnet18 ``model.backend_layers`` config).
    """
    torch_np = {k: np.asarray(v) for k, v in torch_state.items()}
    new = {"params": params, "batch_stats": batch_stats}
    used = set()

    def _set(t, ks, v):
        """Replace the subtree immutably (trees may be FrozenDict-like)."""
        if not ks:
            return v
        d = dict(t)
        d[ks[0]] = _set(d[ks[0]], ks[1:], v)
        return d

    for col in ("params", "batch_stats"):
        tree = new[col]
        node = tree
        for name in subtree:
            if name not in node:
                raise KeyError(
                    f"{col} has no {'/'.join(subtree)} backbone subtree "
                    f"(is model.backbone a CNN-branch architecture?)")
            node = node[name]
        flat = flatten_dict(node)
        out_flat = {}
        for path in flat:
            tkey, conv = _tv_resnet_key(tuple(str(x) for x in path), col)
            if tkey not in torch_np:
                raise KeyError(f"torchvision checkpoint is missing {tkey}")
            val = conv(torch_np[tkey])
            used.add(tkey)
            want = np.shape(flat[path])
            if tuple(val.shape) != tuple(want):
                raise ValueError(
                    f"shape mismatch at {col}:{'/'.join(map(str, path))} "
                    f"<- {tkey}: torch {val.shape} vs flax {want} (wrong "
                    f"resnet depth for model.backend_layers?)")
            out_flat[path] = val.astype(np.asarray(flat[path]).dtype)
        new[col] = _set(new[col], list(subtree), unflatten_dict(out_flat))
    report = {"unused": sorted(
        k for k in set(torch_np) - used
        if not k.startswith("fc.")
        and not k.endswith("num_batches_tracked"))}
    return new["params"], new["batch_stats"], report


def read_torchvision_state(path: str) -> dict:
    """{name: ndarray} from a torchvision resnet checkpoint: a ``.pth``
    torch pickle (loaded ``weights_only`` — a state_dict needs no
    pickled code) or an ``.npz`` of the same tensors (torch-free)."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=True)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def load_pretrained_backbone(state, weights):
    """TrainState with the CNN backbone initialised from a torchvision
    resnet checkpoint (the reference's ``pretrained=True`` ImageNet
    init).  `weights` is a path (see :func:`read_torchvision_state`) or
    an already-read {name: ndarray} dict (pass the dict when loading
    the same file for many objects, e.g. ``--cls-id all``)."""
    sd = (weights if isinstance(weights, dict)
          else read_torchvision_state(weights))
    params, stats, report = import_torchvision_resnet(
        state.params, state.batch_stats, sd)
    if report["unused"]:
        import warnings

        warnings.warn("torchvision import: unused tensors "
                      f"{report['unused'][:5]}...")
    return state.replace(params=params, batch_stats=stats)


def load_torch_reference_checkpoint(state, ckpt_dir_or_file: str):
    """Load `<dir>/geomatch.pth.tar` (test_lm path, train_lm.py:331-340)
    into a TrainState.  Requires torch (cpu) to unpickle."""
    import os.path as osp

    import torch

    path = ckpt_dir_or_file
    if osp.isdir(path):
        path = osp.join(path, "geomatch.pth.tar")
    blob = torch.load(path, map_location="cpu")
    sd = blob.get("model_state", blob)
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in sd.items()}
    params, stats, report = import_state_dict(
        state.params, state.batch_stats, sd, strict=False)
    if report["missing"]:
        import warnings

        warnings.warn(
            f"torch import: {len(report['missing'])} leaves kept from "
            f"init (missing in checkpoint)")
    return state.replace(params=params, batch_stats=stats)
