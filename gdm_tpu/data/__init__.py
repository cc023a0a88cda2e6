"""Data layer: BOP readers, host-side GT generation, device-side
preprocessing (crop, sampling, KNN pyramids inside jit)."""

from gdm_tpu.data.pipeline import build_pyramid, assemble_inputs
