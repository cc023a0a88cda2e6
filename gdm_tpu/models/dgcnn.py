"""DGCNN edge-conv encoders (flax, channels-last).

Mirrors reference ``models/dgcnn.py``: on-the-fly KNN graphs via dense
pairwise distance + top-k (dgcnn.py:21-27 — already the TPU-native
formulation, amusingly), edge features [x_j - x_i, x_i] (:29-56), the
5-conv EdgeConv stack with global max embedding, and the 1216-d fused head
(:103-137).  DgcnnPointEmb is the scene branch (graph over xyz only for the
first layer, dim9=True), DgcnnMeshEmb the mesh branch over the static
object mesh (:139-236).

All tensors are batched [B, N, ..., C]; batch norm reduces over
batch+points+neighbours exactly like the torch BatchNorm2d originals.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from gdm_tpu.models.layers import BatchNorm, leaky_relu02
from gdm_tpu.ops.knn import knn


def graph_feature_b(x: jax.Array, k: int, pos: jax.Array | None = None,
                    approx: bool = False):
    """Batched edge features: [B,n,k,2c] = [x_j - x_i, x_i].

    `pos` selects the KNN coordinate space (dim9=True uses xyz only,
    dgcnn.py:36-38); defaults to x itself.

    The reference's topk keeps the point ITSELF as neighbour 0 (distance
    0 tops the negated-distance topk, dgcnn.py:21-27), so its k edges are
    [self, nn1..nn_{k-1}] — the self edge contributes (0, x_i).  Matched
    here for checkpoint parity.

    `approx` switches the graph build to ``lax.approx_max_k`` — the
    edge-conv graph is a neighbour-AGGREGATION consumer (max-pooled conv
    features), the same category the RandLA pyramid runs approx for, so
    the 0.85-recall partial reduction is fine.  Exact top_k is ~75 ms on
    [8,4096,4096] vs ~5 ms approx (the whole exact-mode forward was
    top_k-bound: 221 ms/batch, of which ~3x75 was the three graphs).

    KNN coordinates are always widened to f32: bf16 distances into the
    top-k reduction are measured NOT faster and lose recall (the
    reduction is shape-bound — CLAUDE.md negative, 2026-08-18), so under
    compute_dtype=bfloat16 only the conv/gather activations narrow.
    """
    coords = (x if pos is None else pos).astype(jnp.float32)

    def one(c):
        return knn(c, c, k, chunk=1024, approx=approx, recall_target=0.85)

    idx = jax.vmap(one)(coords)                            # [B, n, k]
    from gdm_tpu.models.randla import gather_neighbours_b

    xj = gather_neighbours_b(x, idx)   # custom VJP: fast fwd/bwd on TPU
    xi = jnp.broadcast_to(x[:, :, None, :], xj.shape)
    return jnp.concatenate([xj - xi, xi], axis=-1)


class _ConvBNLRelu(nn.Module):
    features: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, momentum=0.1):
        x = nn.Dense(self.features, use_bias=False, dtype=self.dtype)(x)
        x = BatchNorm(dtype=self.dtype)(x, train, momentum)
        return leaky_relu02(x)


class DgcnnTrunk(nn.Module):
    """Shared EdgeConv trunk of both DGCNN variants (dgcnn.py:103-137)."""

    k: int = 16
    embed_dim: int = 1024
    feat_dim: int = 128
    dropout: float = 0.1
    approx_knn: bool = False   # approx graph build (see graph_feature_b)
    dtype: object = jnp.float32   # activation compute dtype; params and
    # KNN coordinates stay f32 (graph_feature_b), output cast by caller

    @nn.compact
    def __call__(self, cloud, train: bool = False, momentum=0.1):
        # cloud: [B, n, 9] xyz | rgb | normal
        n = cloud.shape[1]
        ax = self.approx_knn

        e = graph_feature_b(cloud.astype(self.dtype), self.k,
                            pos=cloud[..., :3],
                            approx=ax)                    # [B,n,k,18]
        e = _ConvBNLRelu(64, dtype=self.dtype, name="conv1")(e, train, momentum)
        e = _ConvBNLRelu(64, dtype=self.dtype, name="conv2")(e, train, momentum)
        x1 = jnp.max(e, axis=2)

        e = graph_feature_b(x1, self.k, approx=ax)
        e = _ConvBNLRelu(64, dtype=self.dtype, name="conv3")(e, train, momentum)
        e = _ConvBNLRelu(64, dtype=self.dtype, name="conv4")(e, train, momentum)
        x2 = jnp.max(e, axis=2)

        e = graph_feature_b(x2, self.k, approx=ax)
        e = _ConvBNLRelu(64, dtype=self.dtype, name="conv5")(e, train, momentum)
        x3 = jnp.max(e, axis=2)

        cat = jnp.concatenate([x1, x2, x3], axis=-1)      # [B, n, 192]
        g = _ConvBNLRelu(self.embed_dim, dtype=self.dtype, name="conv6")(cat, train, momentum)
        g = jnp.max(g, axis=1, keepdims=True)             # global embed
        g = jnp.broadcast_to(g, (cat.shape[0], n, self.embed_dim))

        h = jnp.concatenate([g, x1, x2, x3], axis=-1)     # [B, n, 1216]
        h = _ConvBNLRelu(512, dtype=self.dtype, name="conv7")(h, train, momentum)
        h = _ConvBNLRelu(256, dtype=self.dtype, name="conv8")(h, train, momentum)
        h = nn.Dropout(self.dropout, deterministic=not train,
                       name="dp1")(h)
        return nn.Dense(self.feat_dim, use_bias=False,
                        dtype=self.dtype, name="conv9")(h)


class DgcnnPointEmb(nn.Module):
    """Scene branch (DgcnnPcdEmb parity): [B, n, 9] -> [B, n, feat_dim]."""

    k: int = 16
    embed_dim: int = 1024
    feat_dim: int = 128
    dropout: float = 0.1
    approx_knn: bool = False
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, cld_rgb_nrm, train: bool = False, momentum=0.1):
        return DgcnnTrunk(self.k, self.embed_dim, self.feat_dim,
                          self.dropout, self.approx_knn, self.dtype,
                          name="trunk")(cld_rgb_nrm, train, momentum)


class DgcnnMeshEmb(nn.Module):
    """Mesh branch (DgcnnMeshEmb parity): [n, 9] -> [n, feat_dim].

    Mesh node features are passed in (xyz_m | imagenet-normalised rgb |
    normal, dgcnn.py:195-207) rather than buffered, so one module handles
    every object.
    """

    k: int = 20
    embed_dim: int = 1024
    feat_dim: int = 128
    dropout: float = 0.1
    approx_knn: bool = False
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, mesh_x, train: bool = False, momentum=0.1):
        out = DgcnnTrunk(self.k, self.embed_dim, self.feat_dim,
                         self.dropout, self.approx_knn, self.dtype,
                         name="trunk")(mesh_x[None], train, momentum)
        return out[0]
