"""GeoMatch: top-level dense-matching pose network (flax).

Reference: models/geoMatch.py (GeoMatch.forward :159-200 and heads :32-52).
Scene branch FFB6D + mesh branch SplineCNN + seg / feature-encoding heads;
training adds the circle matching loss, focal seg loss and uncertainty
weighting (:188-195).

The static per-object mesh graph is passed as a pytree of arrays
(`MeshArrays`, from gdm_tpu.models.spline_mesh.MeshGraph) instead of being
baked into module buffers — one compiled graph serves every object, and
vmap over stacked MeshArrays gives multi-object batched inference (the
reference loops models per batch element, train_lm.py:298-314).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gdm_tpu.losses import (
    AutomaticWeightedLoss,
    focal_loss,
    pointwise_matching_loss,
)
from gdm_tpu.models.ffb6d import FFB6DEmb
from gdm_tpu.models.layers import DenseBNAct, MLPHead
from gdm_tpu.models.spline_mesh import MeshGraph, SplineMeshEncoder


class MeshArrays(NamedTuple):
    """Device-side constants of one object's mesh graph."""

    xyz: jax.Array        # [m, 3]
    node_x: jax.Array     # [m, 9]
    neigh_idx: jax.Array  # [m, k]
    basis: jax.Array      # [m, k, 8]
    slot: jax.Array       # [m, k, 8]
    sym_idx: jax.Array | None = None

    @classmethod
    def from_graph(cls, g: MeshGraph) -> "MeshArrays":
        return cls(
            xyz=jnp.asarray(g.xyz),
            node_x=jnp.asarray(g.node_x),
            neigh_idx=jnp.asarray(g.neigh_idx),
            basis=jnp.asarray(g.basis),
            slot=jnp.asarray(g.slot),
            sym_idx=None if g.sym_idx is None else jnp.asarray(g.sym_idx),
        )


class GeoMatch(nn.Module):
    """RandLA+SplineCNN variant (the flagship model)."""

    feat_dim: int = 128
    positive_r: float = 0.002   # neighbor_dis_th * diameter_m
    circle_gamma: float = 16.0
    circle_m: float = 0.2
    compute_dtype: object = jnp.float32   # bf16 halves encoder bandwidth;
    # heads / losses / mesh branch stay f32
    matching_loss_fn: object = None   # optional override for the train
    # matching loss, signature (rgbd_features, mesh_features, mesh_xyz,
    # labels, match_idx, visible_flag, positive_r, sym_idx) -> scalar.
    # Used by `cli train --model-shards N` to route the loss through
    # parallel.sp.sharded_matching_loss (mesh columns sharded over the
    # 'model' axis — the [B*N, M] similarity matrix never materialises
    # whole on one chip); numerically equal to the default
    # pointwise_matching_loss up to f32 reduction order (test_sp.py).

    def setup(self):
        self.pcd_emb = FFB6DEmb(name="pcd_emb", dtype=self.compute_dtype)
        self.model_emb = SplineMeshEncoder(self.feat_dim, name="model_emb")
        self.awl = AutomaticWeightedLoss(2, name="awl")
        self.feature_encoding_layer = MLPHead(
            (128, 128, 128, self.feat_dim), final_bias=False,
            name="feature_encoding_layer")
        self.normalize_feature_layer = DenseBNAct(
            self.feat_dim, name="normalize_feature_layer")
        self.seg_layer = MLPHead((128, 128, 128, 2), name="seg_layer")

    def encode_mesh(self, mesh: MeshArrays, train: bool = False):
        """Mesh branch alone — batch-independent, so eval pipelines call
        this once per object and reuse the features across every batch
        (the reference recomputes 3 SplineConvs per step,
        geoMatch.py:179)."""
        return self.model_emb(
            mesh.node_x, mesh.neigh_idx, mesh.basis, mesh.slot,
            train=train)

    def __call__(self, inputs, mesh: MeshArrays, train: bool = False,
                 momentum=0.1, mesh_features=None):
        rgbd_emb = self.pcd_emb(
            inputs, train, momentum).astype(jnp.float32)          # [B,N,128]
        if mesh_features is None:
            mesh_features = self.encode_mesh(mesh, train)         # [M,128]
        rgbd_features = self.feature_encoding_layer(
            rgbd_emb, train, momentum)
        rgbd_emb = rgbd_emb + self.normalize_feature_layer(
            rgbd_features, train, momentum)
        seg = self.seg_layer(rgbd_emb, train, momentum)           # [B,N,2]

        end_points = {
            "seg": seg,
            "mesh": mesh_features,
            "rgbd": rgbd_features,
        }
        if train:
            # positive_r may arrive as a runtime input so one compiled
            # step serves every object (it differs per object diameter)
            positive_r = inputs.get("positive_r", self.positive_r)
            if self.matching_loss_fn is not None:
                match_loss = self.matching_loss_fn(
                    rgbd_features, mesh_features, mesh.xyz,
                    inputs["labels"], inputs["match_idx"],
                    inputs["visible_flag"], positive_r, mesh.sym_idx)
            else:
                match_loss = pointwise_matching_loss(
                    rgbd_features, mesh_features, mesh.xyz,
                    inputs["labels"], inputs["match_idx"],
                    inputs["visible_flag"], positive_r,
                    sym_idx=mesh.sym_idx, m=self.circle_m,
                    gamma=self.circle_gamma)
            seg_loss = focal_loss(seg, inputs["labels"], gamma=2.0)
            end_points["loss"] = self.awl(seg_loss, match_loss)
            end_points["seg_loss"] = seg_loss
            end_points["match_loss"] = match_loss
        return end_points
