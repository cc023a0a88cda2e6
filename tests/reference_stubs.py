"""Import helpers for tests that run the ACTUAL reference torch modules.

The reference (/root/reference) imports compiled extensions and heavy
deps that are absent here (nanoflann KNN, grid subsampling,
torch_geometric, normalSpeed, plyfile, mmcv) and hardcodes .cuda()/cuda
tensors. This context manager stubs those modules, patches torch's cuda
touchpoints to CPU no-ops, puts the reference on sys.path, and cleans
everything up afterwards (the reference uses generic top-level module
names — models, config, utils, ref, helper_tool — that must not leak
into other tests).
"""

import contextlib
import sys
import types

_STUBS = {
    "normalSpeed": {},
    "plyfile": {"PlyData": object},
    "mmcv": {},
    "torch_geometric": {},
    "torch_geometric.data": {"Data": object},
    "torch_geometric.nn": {"SplineConv": object},
    "torch_geometric.transforms": {},
    "cpp_wrappers": {},
    "cpp_wrappers.cpp_subsampling": {},
    "cpp_wrappers.cpp_subsampling.grid_subsampling": {},
    "nearest_neighbors": {},
    "nearest_neighbors.lib": {},
    "nearest_neighbors.lib.python": {},
    "nearest_neighbors.lib.python.nearest_neighbors": {},
}

_PATHS = ["/root/reference/models/RandLA", "/root/reference"]


@contextlib.contextmanager
def reference_imports(patch_load_state_dict=False):
    """Yield with /root/reference importable and its missing deps stubbed.

    patch_load_state_dict: no-op torch load_state_dict during the yield
    (the reference's ResNet builder strict-loads downloaded weights at
    construction time; this environment has no egress).
    """
    import torch
    import torch.utils.model_zoo as mz

    added = []
    for name, attrs in _STUBS.items():
        if name not in sys.modules:
            mod = types.ModuleType(name)
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
            added.append(name)
    before = set(sys.modules)
    sys.path[:0] = _PATHS

    orig_load_url = mz.load_url
    orig_lsd = torch.nn.Module.load_state_dict
    orig_cuda = torch.Tensor.cuda
    orig_arange = torch.arange
    mz.load_url = lambda *a, **k: {}
    if patch_load_state_dict:
        torch.nn.Module.load_state_dict = lambda self, sd, *a, **k: None
    torch.Tensor.cuda = lambda self, *a, **k: self

    def arange(*a, **k):
        if (k.get("device") is not None
                and str(k["device"]).startswith("cuda")
                and not torch.cuda.is_available()):
            k["device"] = "cpu"
        return orig_arange(*a, **k)

    torch.arange = arange
    try:
        yield
    finally:
        mz.load_url = orig_load_url
        torch.nn.Module.load_state_dict = orig_lsd
        torch.Tensor.cuda = orig_cuda
        torch.arange = orig_arange
        for p in _PATHS:
            sys.path.remove(p)
        for name in (set(sys.modules) - before) | set(added):
            sys.modules.pop(name, None)
