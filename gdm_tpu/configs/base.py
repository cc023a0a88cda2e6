"""Config dataclasses + the three dataset presets."""

from __future__ import annotations

import dataclasses
from typing import Sequence


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """DATASETS block (config/lmo_cfg.py:61-103)."""

    name: str                       # refdata registry key
    data_root: str = "datasets"
    train_subsets: Sequence[str] = ("train_pbr",)
    test_subsets: Sequence[str] = ("test",)
    obj_ids: Sequence[int] = ()
    img_hw: tuple = (480, 640)
    dzi_scale_ratio: float = 0.25
    dzi_shift_ratio: float = 0.25
    dzi_pad_ratio: float = 1.5
    model_pt_num: int = 4096        # mesh vertices used
    num_sample_points: int = 4096   # scene points sampled
    nn_dist_th: float = 0.05        # x diameter: GT match outlier cutoff
    input_size: int = 256
    sym_objs: Sequence[str] = ()
    real_pbr_mix: float | None = None   # ycbv: p(real)=0.8 (ycbv_pbr.py:684)
    fill_depth: bool = False            # ycbv: ip_basic on the crop
    cache_visibility: bool = True       # cache per-anno HPR hull (exact;
    #   the pose never changes for an annotation — ~n_mesh/8 B per anno)
    hpr_radius_param: float = 2.0   # HPR flip-radius exponent for GT
    #   visibility (ops/visibility.visible_points).  The reference uses
    #   pi (compute_visibility.py:131), where qhull's fixed precision
    #   marks much of the self-occluded backside visible; 2.0 gives the
    #   geometrically correct visible set.  It changes the GT
    #   correspondence LABELS, i.e. the training distribution — for a
    #   strict reference-distribution replication run
    #   `--opt data.hpr_radius_param=3.141592653589793`.  Convergence
    #   A/B on synthetic data: docs/CONVERGENCE.md (round 5).


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """MODEL block (config/lmo_cfg.py:123-133)."""

    feat_dim: int = 128
    n_mesh_node: int = 4096
    neighbor_dis_th: float = 0.02   # x diameter: circle-loss positive radius
    backbone: str = "randla_spline"  # or "dgcnn"
    compute_dtype: str = "float32"   # 'bfloat16' halves encoder bandwidth
    # (heads/losses/mesh branch stay f32; BN statistics always f32)
    gather_bwd_dtype: str = "float32"  # 'bfloat16': ~2x faster RandLA
    # backward one-hot contraction, ~0.4% gradient noise (randla.py)
    pretrained_backbone: str = ""    # torchvision resnet .pth/.npz path:
    # ImageNet init for the CNN branch, the reference's pretrained=True
    # (models/cnn/pspnet.py:50-53); empty = random init
    randla_d_out: Sequence[int] = (32, 64, 128, 256)
    randla_k: int = 16
    mesh_knn_k: int = 4
    spline_kernel: int = 5
    dgcnn_exact_knn: bool = False   # exact top_k edge-conv graphs for the
    # dgcnn backbone (parity mode); default approx — the forward is
    # otherwise exact-top_k-bound (221 -> 18.7 ms/batch at b=8).
    # `cli eval/infer/export --exact-knn` also forces exact.


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """SOLVER/DATALOADER blocks + what train_lm.py actually runs."""

    total_epochs: int = 50
    train_batch_size: int = 24
    val_batch_size: int = 128
    base_lr: float = 1e-6           # CyclicLR (train_lm.py:441-447)
    max_lr: float = 1e-3
    clr_div: int = 6                # step_size = epochs*len/bs/div
    weight_decay: float = 0.0
    bn_momentum: float = 0.9        # torch convention (train_lm.py:53-57)
    bn_decay: float = 0.5
    bn_decay_step: float = 2e5
    bn_momentum_clip: float = 0.01
    checkpoint_every_epochs: int = 10
    num_workers: int = 4
    # non-finite-update guard (optax.apply_if_finite): an update whose
    # gradients contain NaN/inf is SKIPPED (params/opt state untouched)
    # up to this many consecutive times, then passed through so the NaN
    # surfaces instead of silently stalling.  0 disables the guard.
    # NOTE: the guard wraps the optimizer state, so this field changes
    # the checkpoint opt_state layout — train and eval read it from the
    # same config, keeping restore targets consistent.
    skip_nonfinite: int = 5


@dataclasses.dataclass(frozen=True)
class Config:
    data: DataConfig
    model: ModelConfig
    solver: SolverConfig
    checkpoints_dir: str = "train_log/checkpoints"


LMO = Config(
    data=DataConfig(
        name="lmo",
        train_subsets=("train_pbr",),
        obj_ids=(1, 5, 6, 8, 9, 10, 11, 12),
        nn_dist_th=0.05,
        sym_objs=("eggbox",),
    ),
    model=ModelConfig(neighbor_dis_th=0.02),
    solver=SolverConfig(total_epochs=50, train_batch_size=24,
                        val_batch_size=128),
)

LMFULL = Config(
    data=DataConfig(
        name="lm_full",
        train_subsets=("real", "fuse", "renders"),
        obj_ids=tuple(range(1, 16)),
        num_sample_points=480 * 640 // 24,   # 12800 (lmfull_cfg.py:76)
        nn_dist_th=0.01,
        input_size=128,
        sym_objs=("eggbox",),
    ),
    model=ModelConfig(neighbor_dis_th=0.02),
    solver=SolverConfig(total_epochs=50, train_batch_size=6,
                        val_batch_size=8),
)

YCBV = Config(
    data=DataConfig(
        name="ycbv",
        train_subsets=("train_real", "train_pbr"),
        obj_ids=tuple(range(1, 22)),
        nn_dist_th=0.05,
        sym_objs=("024_bowl", "052_extra_large_clamp", "061_foam_brick"),
        real_pbr_mix=0.8,
        fill_depth=True,
    ),
    model=ModelConfig(neighbor_dis_th=0.06),
    solver=SolverConfig(total_epochs=30, train_batch_size=8,
                        val_batch_size=128),
)

_PRESETS = {"lmo": LMO, "lmfull": LMFULL, "lm_full": LMFULL, "ycbv": YCBV}


def get_config(name: str, opts: Sequence[str] = ()) -> Config:
    """Fetch a preset, optionally overriding fields.

    opts: 'section.field=value' strings (cli --opt), e.g.
    'model.gather_bwd_dtype=bfloat16' or 'solver.train_batch_size=16'.
    Values are parsed with the existing field's type (the reference
    mutates its config modules at runtime, train_lm.py:395; here
    overrides are explicit and type-checked).
    """
    def _parse_scalar(raw: str):
        """Best-effort typing for overrides of None-valued (Optional)
        fields: int, then float, then bool/None literals, else string
        (storing '0.7' as a string into e.g. data.real_pbr_mix would
        TypeError deep in the loader)."""
        for cast in (int, float):
            try:
                return cast(raw)
            except ValueError:
                pass
        low = raw.lower()
        if low in ("true", "yes"):
            return True
        if low in ("false", "no"):
            return False
        if low in ("none", "null"):
            return None
        return raw

    cfg = _PRESETS[name]
    for opt in opts:
        path, _, raw = opt.partition("=")
        if not _:
            raise ValueError(f"--opt needs key=value, got {opt!r}")
        section, _, field = path.partition(".")
        if not field:
            raise ValueError(f"--opt key must be section.field: {opt!r}")
        sub = getattr(cfg, section)
        old = getattr(sub, field)  # raises AttributeError on typos
        if isinstance(old, bool):
            low = raw.lower()
            if low in ("1", "true", "yes"):
                val = True
            elif low in ("0", "false", "no"):
                val = False
            else:       # reject typos loudly, like the int/float casts
                raise ValueError(
                    f"--opt {path}: {raw!r} is not a boolean "
                    "(use true/false/1/0/yes/no)")
        elif isinstance(old, (int, float)):
            val = type(old)(raw)
        elif isinstance(old, (tuple, list)):
            # cast each element with the existing element type so e.g.
            # model.randla_d_out=16,32 yields ints, not strings
            el = type(old[0]) if len(old) else str
            val = type(old)(el(x) for x in raw.split(",")) if raw \
                else type(old)()
        elif old is None:
            # Optional field: infer number/bool/None, else keep a string
            val = _parse_scalar(raw)
        else:
            val = raw
        cfg = dataclasses.replace(
            cfg, **{section: dataclasses.replace(sub, **{field: val})})
    return cfg
