"""Data layer: BOP readers, host-side GT generation, device-side
preprocessing (depth fill, normals, crop gather, KNN pyramids inside jit)."""

from gdm_tpu.data.bop import Record, aug_bbox_dzi, build_index, \
    load_detections
from gdm_tpu.data.dataset import PoseDataset
from gdm_tpu.data.loader import DataLoader, collate
from gdm_tpu.data.pipeline import assemble_inputs, build_pyramid, \
    finalize_batch
