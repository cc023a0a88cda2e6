"""Flax model layer.

Modules mirror the reference model zoo (SURVEY.md section 2a) with
TPU-idiomatic layout: images are NHWC, point features are [B, N, C]
(channels-last), and every dynamic-shape construct of the torch originals is
replaced by a fixed-shape masked formulation.
"""

from gdm_tpu.models.geomatch import GeoMatch
from gdm_tpu.models.geomatch_dgcnn import GeoMatchDGCNN
from gdm_tpu.models.ffb6d import FFB6DEmb
from gdm_tpu.models.spline_mesh import SplineMeshEncoder, MeshGraph
from gdm_tpu.models.randla import RandLAEncoder
from gdm_tpu.models.pspnet import PSPNetFeats
from gdm_tpu.models.dgcnn import DgcnnPointEmb, DgcnnMeshEmb
