"""Point-cloud primitive ops (pointops parity).

TPU-native equivalents of the reference's CUDA extension surface
(lib/pointops/functions/pointops.py:38-675 — furthest point sampling,
gathering, knn/ball query, grouping, 3-NN interpolation).  The reference
ships these as hand-written CUDA kernels; on TPU each one is a dense
gather/top-k/segment computation XLA maps onto the VPU/MXU directly.

All functions are single-cloud ([n, ...]); ``jax.vmap`` over a leading batch
axis replaces the CUDA kernels' blockIdx batching.

The full reference op surface is covered, including the ops that are
dead code there (nothing outside lib/pointops imports the package and
its CUDA src/ is absent from the tree): labelstat_ballrange /
labelstat_idx / labelstat_and_ballquery (pointops.py:287-373,
semantic-seg label histograms) and feature_distribute / feature_gather
(pointops.py:228-285, a nearest-anchor feature-assignment pair).  Their
semantics are reconstructed from the wrapper shapes/docstrings (the
kernels they call don't exist anywhere); golden tests pin them against
numpy re-derivations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gdm_tpu.ops.knn import knn, pairwise_sqdist


@functools.partial(jax.jit, static_argnames=("m",))
def farthest_point_sample(xyz: jax.Array, m: int) -> jax.Array:
    """Iterative farthest-point sampling (pointops FurthestSampling parity).

    Args:
      xyz: [n, 3] points.
      m: number of samples.

    Returns:
      [m] int32 indices. Starts from index 0 like the CUDA kernel.
    """
    n = xyz.shape[0]
    mind = jnp.full((n,), jnp.inf, jnp.float32)

    def body(carry, _):
        mind, last = carry
        d = jnp.sum(jnp.square(xyz - xyz[last]), axis=-1)
        mind = jnp.minimum(mind, d)
        nxt = jnp.argmax(mind).astype(jnp.int32)
        return (mind, nxt), last

    (_, _), idx = jax.lax.scan(
        body, (mind, jnp.int32(0)), None, length=m)
    return idx.astype(jnp.int32)


def gather_points(feats: jax.Array, idx: jax.Array) -> jax.Array:
    """[n, c] features gathered at [m] indices -> [m, c] (Gathering parity)."""
    return jnp.take(feats, idx, axis=0)


def group_points(feats: jax.Array, idx: jax.Array) -> jax.Array:
    """[n, c] features grouped by [m, k] neighbour indices -> [m, k, c]."""
    return jnp.take(feats, idx, axis=0)


@functools.partial(jax.jit, static_argnames=("k",))
def ball_query(
    xyz: jax.Array, centers: jax.Array, radius: float, k: int
) -> jax.Array:
    """Indices of up to k points within `radius` of each centre.

    Matches pointops BallQuery semantics: slots beyond the in-radius count
    repeat the first in-radius index (so grouped features are padded with a
    valid point, and max-pooling is unaffected).
    """
    d2 = pairwise_sqdist(centers, xyz)                    # [m, n]
    in_ball = d2 <= radius * radius
    # rank points: in-ball points keep their distance, others pushed to inf
    ranked = jnp.where(in_ball, d2, jnp.inf)
    _, idx = jax.lax.top_k(-ranked, k)                    # [m, k] nearest-first
    valid = jnp.take_along_axis(in_ball, idx, axis=1)
    first = idx[:, :1]
    return jnp.where(valid, idx, first).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=())
def three_nn_interpolate(
    src_xyz: jax.Array, src_feats: jax.Array, dst_xyz: jax.Array
) -> jax.Array:
    """Inverse-distance weighted 3-NN feature propagation.

    pointops Interpolation parity: weights = (1/d) / sum(1/d) over the three
    nearest source points of each destination point.

    Args:
      src_xyz:  [n, 3], src_feats: [n, c], dst_xyz: [m, 3]
    Returns:
      [m, c]
    """
    from gdm_tpu.ops.knn import knn_with_dist

    idx, dist = knn_with_dist(src_xyz, dst_xyz, 3)
    w = 1.0 / jnp.maximum(dist, 1e-8)
    w = w / jnp.sum(w, axis=1, keepdims=True)
    neigh = jnp.take(src_feats, idx, axis=0)              # [m, 3, c]
    return jnp.sum(neigh * w[..., None], axis=1)


def knn_query(xyz: jax.Array, centers: jax.Array, k: int) -> jax.Array:
    """pointops KNNQuery parity — see :func:`gdm_tpu.ops.knn.knn`."""
    return knn(xyz, centers, k)


@jax.jit
def labelstat_ballrange(
    xyz: jax.Array, centers: jax.Array, label_stat: jax.Array,
    radius: float,
) -> jax.Array:
    """Per-centre class histogram over ALL points within `radius`.

    pointops LabelStatBallRange parity (pointops.py:287-314; its CUDA
    kernel src is absent from the reference tree — semantics from the
    wrapper shapes: sum label_stat rows of every in-ball point, no
    sample cap).  The in-ball mask contracts against the histogram on
    the MXU instead of a per-centre loop.

    Args:
      xyz: [n, 3] points, centers: [m, 3], label_stat: [n, nclass]
        per-point class counts (one-hot labels or accumulated counts).
    Returns: [m, nclass] int32.
    """
    d2 = pairwise_sqdist(centers, xyz)                    # [m, n]
    in_ball = (d2 <= radius * radius).astype(jnp.float32)
    # HIGHEST: TPU matmuls default to bf16 multiply, which cannot
    # represent counts > 256 exactly — histogram totals must be exact
    out = jax.lax.dot_general(
        in_ball, label_stat.astype(jnp.float32),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    return jnp.round(out).astype(jnp.int32)


def labelstat_idx(label_stat: jax.Array, idx: jax.Array) -> jax.Array:
    """Class histogram over given neighbour indices.

    pointops LabelStatIdx parity (pointops.py:316-341): sum the
    [n, nclass] per-point stats over each centre's [m, k] neighbour
    list.
    """
    return jnp.sum(jnp.take(label_stat.astype(jnp.int32), idx, axis=0),
                   axis=1)


@functools.partial(jax.jit, static_argnames=("k",))
def labelstat_and_ballquery(
    xyz: jax.Array, centers: jax.Array, label_stat: jax.Array,
    radius: float, k: int,
) -> tuple[jax.Array, jax.Array]:
    """Fused ball query + full-ball class histogram.

    pointops LabelStatAndBallQuery parity (pointops.py:343-373): the
    idx is the capped-at-k ball query (:func:`ball_query` semantics),
    the histogram counts EVERY in-ball point like
    :func:`labelstat_ballrange` (the two outputs of the fused CUDA
    kernel have independent ranges).

    Returns: (new_label_stat [m, nclass] int32, idx [m, k] int32).
    """
    return (labelstat_ballrange(xyz, centers, label_stat, radius),
            ball_query(xyz, centers, radius, k))


@jax.jit
def feature_distribute(max_xyz: jax.Array, xyz: jax.Array) -> jax.Array:
    """Index of the nearest `max_xyz` point for each `xyz` point.

    pointops FeatureDistribute parity (pointops.py:228-249): assigns
    every point of a dense cloud [m, 3] to its nearest anchor in
    [n, 3].  One argmin over the pairwise-distance matrix.
    """
    return jnp.argmin(pairwise_sqdist(xyz, max_xyz),
                      axis=1).astype(jnp.int32)


def feature_gather(max_feature: jax.Array, distribute_idx: jax.Array
                   ) -> jax.Array:
    """Features gathered at distribute indices, differentiably.

    pointops FeatureGather parity (pointops.py:252-285): forward is a
    row gather [n, c] -> [m, c]; the reference's hand-written backward
    (scatter-add of cotangents into the anchor rows) is exactly the VJP
    XLA derives for ``take``, so no custom rule is needed.
    """
    return jnp.take(max_feature, distribute_idx, axis=0)
