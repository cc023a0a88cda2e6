"""Device kernels: pure jittable functions (no module state).

TPU-native replacements for every native component on the reference's main
path (SURVEY.md section 2c):

  knn            <- models/RandLA/utils/nearest_neighbors (nanoflann KD-tree)
  backproject    <- datasets/lm/linemod_pbr.py:398-411 (numpy loops)
  normals        <- external `normalSpeed.depth_normal` C++ op
  depth_fill     <- utils/ip_basic (OpenCV morphology)
  kabsch/ransac  <- utils/pvn3d_eval_utils_kpls.py:43-124 (numpy SVD, host)
  meanshift      <- utils/meanshift_pytorch.py
  pointops       <- lib/pointops CUDA extension (fps/gather/group/interpolate)
  spline_basis   <- external torch_spline_conv CUDA kernels
  subsample      <- models/RandLA/utils/cpp_wrappers/cpp_subsampling
  render_depth   <- external bop_renderer / glumpy GL depth renderers
"""

from gdm_tpu.ops.knn import knn, pairwise_sqdist
from gdm_tpu.ops.backproject import depth_to_xyz
from gdm_tpu.ops.normals import depth_normals
from gdm_tpu.ops.depth_fill import fill_in_fast, fill_in_multiscale
from gdm_tpu.ops.kabsch import kabsch, weighted_kabsch
from gdm_tpu.ops.ransac import ransac_kabsch
from gdm_tpu.ops.meanshift import mean_shift
from gdm_tpu.ops.render_depth import render_depth_window, subdivide_max_edge
from gdm_tpu.ops.pointops import (
    farthest_point_sample,
    gather_points,
    group_points,
    three_nn_interpolate,
    ball_query,
    labelstat_ballrange,
    labelstat_idx,
    labelstat_and_ballquery,
    feature_distribute,
    feature_gather,
)
from gdm_tpu.ops.spline_basis import (
    spline_basis,
    spline_conv_dense,
    cartesian_pseudo,
)
from gdm_tpu.ops.subsample import voxel_grid_subsample_np
