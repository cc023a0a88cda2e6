"""Voxel-grid (barycentre) point-cloud subsampling.

Capability-parity port target: the reference's C++ extension
``models/RandLA/utils/cpp_wrappers/cpp_subsampling`` (grid_subsampling.cpp),
exposed as ``DP.grid_sub_sampling`` (helper_tool.py:199-219).  It is host-side
data preparation (not on the geoMatch hot path), so this lives as a numpy
implementation used by the data layer; a C++ version with identical
semantics is provided in gdm_tpu/native for throughput.
"""

from __future__ import annotations

import numpy as np


def voxel_grid_subsample_np(
    points: np.ndarray,
    sample_dl: float,
    features: np.ndarray | None = None,
):
    """Barycentre subsampling on a regular voxel grid.

    Args:
      points: [n, 3] float array.
      sample_dl: voxel edge length.
      features: optional [n, c] to average per voxel.

    Returns:
      sub_points [m, 3] (and sub_features [m, c] if features given), one
      barycentre per occupied voxel, ordered by first occurrence (matching
      the C++ implementation's map iteration stability is NOT guaranteed by
      the reference either; callers must not rely on ordering).
    """
    mins = points.min(axis=0)
    cells = np.floor((points - mins) / sample_dl).astype(np.int64)
    key = (cells[:, 0] << 42) ^ (cells[:, 1] << 21) ^ cells[:, 2]
    uniq, inv, counts = np.unique(key, return_inverse=True, return_counts=True)
    m = uniq.shape[0]
    sums = np.zeros((m, 3), np.float64)
    np.add.at(sums, inv, points)
    sub_points = (sums / counts[:, None]).astype(points.dtype)
    if features is None:
        return sub_points
    fsum = np.zeros((m, features.shape[1]), np.float64)
    np.add.at(fsum, inv, features)
    return sub_points, (fsum / counts[:, None]).astype(features.dtype)
