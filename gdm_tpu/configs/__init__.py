"""Typed configs mirroring the reference knob values.

Reference: config/lmo_cfg.py, config/ycbv_cfg.py, config/lmfull_cfg.py —
plain dict modules there; honest dataclasses here (every field is
consumed; the reference carries fields its code ignores, e.g. the Ranger
optimizer and flat_and_anneal scheduler names at lmo_cfg.py:50-54 while
Adam+CyclicLR actually run, train_lm.py:414,441-447 — we name what runs).
"""

from gdm_tpu.configs.base import (
    Config,
    DataConfig,
    ModelConfig,
    SolverConfig,
    get_config,
)
