"""SplineCNN mesh encoder (flax) over a static KNN-4 object-mesh graph.

Mirrors reference ``models/SplineCNN.py`` (SplineCNN_Mesh :101-251):
3 SplineConv layers (dim 3, kernel 5, degree 1) with ReLU, concat-skip of
[input, h1, h2, h3], dropout 0.1, final Linear -> 128, over a
T.KNNGraph(k=4) + T.Cartesian graph of the object's FPS-sampled vertices.

TPU re-design: the graph is static per object, so the B-spline basis and
kernel-slot indices are precomputed once on the host (MeshGraph) and the
conv becomes the dense slot-projection matmul + gather of
gdm_tpu.ops.spline_basis.spline_conv_dense.  Node features follow
utils/ply.py:519-537 read_ply_to_data: [imagenet-normalised rgb, xyz_m,
normal] (9-d, in that order).

The reference's symmetric-object branch crashes (models/SplineCNN.py:13
comments out the `misc` import its :155-161 needs); here symmetry
correspondence indices are a working, optional field.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gdm_tpu.ops.spline_basis import (
    cartesian_pseudo,
    spline_basis_np,
    spline_conv_dense,
)

from gdm_tpu.constants import IMAGENET_MEAN, IMAGENET_STD  # noqa: F401
# (re-exported: several modules import these from here)


@dataclasses.dataclass(frozen=True)
class MeshGraph:
    """Static per-object mesh graph, device-resident constants."""

    xyz: np.ndarray          # [n, 3] metres
    node_x: np.ndarray       # [n, 9] rgb_norm | xyz | normal
    neigh_idx: np.ndarray    # [n, k] KNN-4 sources
    basis: np.ndarray        # [n, k, 8]
    slot: np.ndarray         # [n, k, 8]
    sym_idx: np.ndarray | None = None   # [n] symmetry correspondence

    @property
    def n_nodes(self) -> int:
        return self.xyz.shape[0]


def build_mesh_graph(
    fps_data: np.ndarray,
    n_nodes: int,
    kernel_size: int = 5,
    k: int = 4,
    sym_transform: tuple[np.ndarray, np.ndarray] | None = None,
) -> MeshGraph:
    """Build the static graph from an ``obj_XXXXXX_fps.npy`` array.

    Args:
      fps_data: [m, 9] — xyz in mm, rgb 0..255, normals (the reference's
        keypoint file layout, SplineCNN.py:180-193).
      n_nodes: vertices to keep (cfg n_mesh_node).
      sym_transform: optional (R [3,3], t_mm [3]) discrete symmetry; builds
        the sys_corr_idx table (SplineCNN.py:163-169).
    """
    pts = fps_data[:n_nodes, :3].astype(np.float32) / 1000.0
    rgb = fps_data[:n_nodes, 3:6].astype(np.float32)
    nrm = fps_data[:n_nodes, 6:9].astype(np.float32)
    rgb_n = (rgb / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    node_x = np.concatenate([rgb_n, pts, nrm], axis=1).astype(np.float32)

    # host-side KNN (C++ KD-tree, gdm_tpu.native): graph construction
    # happens once per object at setup; keep it off the accelerator
    from gdm_tpu import native

    neigh = native.knn(pts, pts, k + 1)[:, 1:].astype(np.int32)
    pseudo = cartesian_pseudo(pts, neigh)
    basis, slot = spline_basis_np(pseudo, kernel_size=kernel_size)

    sym_idx = None
    if sym_transform is not None:
        R, t_mm = sym_transform
        sym_pts = pts @ np.asarray(R).T + np.asarray(t_mm).reshape(1, 3) / 1000.0
        sym_idx = native.knn(pts, sym_pts, 1)[:, 0].astype(np.int32)

    return MeshGraph(
        xyz=pts, node_x=node_x, neigh_idx=np.asarray(neigh),
        basis=np.asarray(basis), slot=np.asarray(slot), sym_idx=sym_idx)


class SplineConvLayer(nn.Module):
    features: int
    kernel_size: int = 5
    dim: int = 3

    @nn.compact
    def __call__(self, x, neigh_idx, basis, slot):
        n_slots = self.kernel_size ** self.dim
        c_in = x.shape[-1]
        w = self.param(
            "weight",
            nn.initializers.variance_scaling(1.0, "fan_in",
                                             "truncated_normal"),
            (n_slots, c_in, self.features))
        wr = self.param(
            "root",
            nn.initializers.variance_scaling(1.0, "fan_in",
                                             "truncated_normal"),
            (c_in, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return spline_conv_dense(x, neigh_idx, basis, slot, w, wr, b)


class SplineMeshEncoder(nn.Module):
    """3-layer SplineCNN + concat skip + Linear head -> [n, feat_dim].

    Called with the MeshGraph constants; runs once per step (the mesh is
    batch-independent), and its output can be cached across eval steps.
    """

    feat_dim: int = 128
    num_layers: int = 3
    dropout: float = 0.1

    @nn.compact
    def __call__(self, graph_x, neigh_idx, basis, slot,
                 train: bool = False):
        feats = [graph_x]
        x = graph_x
        for i in range(self.num_layers):
            x = nn.relu(SplineConvLayer(self.feat_dim,
                                        name=f"conv_{i}")(
                x, neigh_idx, basis, slot))
            feats.append(x)
        x = jnp.concatenate(feats, axis=-1)
        x = nn.Dropout(self.dropout, deterministic=not train,
                       name="drop")(x)
        return nn.Dense(self.feat_dim, name="mesh_final")(x)
