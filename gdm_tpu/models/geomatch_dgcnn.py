"""GeoMatch DGCNN variant (backbone swap, config 5 in BASELINE.json).

Reference: models/geoMatch_DGCNN.py — same I/O contract as GeoMatch but
both branches are DGCNN edge-conv stacks; differences preserved:
  * positive radius is depth-scaled 3mm (geoMatch_DGCNN.py:22,62-65),
  * the padding column is one-hot e0, not -1s (:95-98),
  * scene features are normalised *before* the heads' loss selection and
    row validity uses `origin_labels` (:92,101),
  * mesh node features for the loss come from the mesh xyz (:121).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from gdm_tpu.losses import (
    AutomaticWeightedLoss,
    focal_loss,
    pointwise_matching_loss,
)
from gdm_tpu.models.dgcnn import DgcnnMeshEmb, DgcnnPointEmb
from gdm_tpu.models.layers import DenseBNAct, MLPHead


class GeoMatchDGCNN(nn.Module):
    feat_dim: int = 128
    k_scene: int = 16
    k_mesh: int = 20
    positive_r_mm: float = 3.0
    circle_gamma: float = 16.0
    circle_m: float = 0.2
    # approx edge-conv graphs (lax.approx_max_k, recall 0.85) — the same
    # aggregation-vs-metric policy as the RandLA KNN pyramid.  False here
    # (parity tests instantiate the bare module); the CLI pipeline
    # defaults it ON via ModelConfig.dgcnn_exact_knn=False.
    approx_knn: bool = False
    compute_dtype: object = jnp.float32   # edge-conv trunk activation
    # dtype (flagship pattern, geomatch.py): KNN coordinates, heads and
    # losses stay f32; params stay f32 so checkpoints are dtype-agnostic
    matching_loss_fn: object = None   # optional override for the train
    # matching loss (the GeoMatch.matching_loss_fn pattern), signature
    # (rgbd_features, mesh_features, mesh_xyz, origin_labels, match_idx,
    # visible_flag, rt, positive_r_mm) -> scalar.  `cli train
    # --model-shards N` routes it through sp.sharded_matching_loss with
    # pad_onehot + the depth-scaled per-column radius (round 5 — lifts
    # the dgcnn exclusion, VERDICT r4 item 4).

    def setup(self):
        self.pcd_emb = DgcnnPointEmb(self.k_scene, feat_dim=self.feat_dim,
                                     approx_knn=self.approx_knn,
                                     dtype=self.compute_dtype,
                                     name="pcd_emb")
        self.model_emb = DgcnnMeshEmb(self.k_mesh, feat_dim=self.feat_dim,
                                      approx_knn=self.approx_knn,
                                      dtype=self.compute_dtype,
                                      name="model_emb")
        self.awl = AutomaticWeightedLoss(2, name="awl")
        self.feature_encoding_layer = MLPHead(
            (128, 128, 128, self.feat_dim), final_bias=False,
            name="feature_encoding_layer")
        self.normalize_feature_layer = DenseBNAct(
            self.feat_dim, name="normalize_feature_layer")
        self.seg_layer = MLPHead((128, 128, 128, 2), name="seg_layer")

    def encode_mesh(self, mesh_x, train: bool = False, momentum=0.1):
        """Mesh branch alone (batch independent; eval caches it)."""
        return self.model_emb(mesh_x, train, momentum).astype(jnp.float32)

    def __call__(self, inputs, mesh_x, train: bool = False, momentum=0.1,
                 mesh_features=None):
        """mesh_x: [M, 9] mesh node features (xyz_m | rgb_norm | normal)."""
        rgbd_emb = self.pcd_emb(
            inputs["cld_rgb_nrm"], train, momentum).astype(jnp.float32)
        if mesh_features is None:
            mesh_features = self.encode_mesh(mesh_x, train, momentum)
        rgbd_features = self.feature_encoding_layer(
            rgbd_emb, train, momentum)
        rgbd_emb = rgbd_emb + self.normalize_feature_layer(
            rgbd_features, train, momentum)
        seg = self.seg_layer(rgbd_emb, train, momentum)

        end_points = {
            "seg": seg,
            "mesh": mesh_features,
            "rgbd": rgbd_features,
        }
        if train:
            if self.matching_loss_fn is not None:
                match_loss = self.matching_loss_fn(
                    rgbd_features, mesh_features, mesh_x[:, :3],
                    inputs["origin_labels"], inputs["match_idx"],
                    inputs["visible_flag"], inputs["RT"],
                    self.positive_r_mm)
            else:
                match_loss = pointwise_matching_loss(
                    rgbd_features, mesh_features, mesh_x[:, :3],
                    inputs["origin_labels"], inputs["match_idx"],
                    inputs["visible_flag"], positive_r=0.0,
                    m=self.circle_m, gamma=self.circle_gamma,
                    pad_onehot=True,
                    rt=inputs["RT"], depth_scaled_r_mm=self.positive_r_mm)
            seg_loss = focal_loss(seg, inputs["labels"], gamma=2.0)
            end_points["loss"] = self.awl(seg_loss, match_loss)
            end_points["seg_loss"] = seg_loss
            end_points["match_loss"] = match_loss
        return end_points
