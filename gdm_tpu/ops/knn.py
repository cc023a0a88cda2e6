"""Exact k-nearest-neighbour search on device.

TPU-native replacement for the reference's nanoflann KD-tree extension
(reference: models/RandLA/utils/nearest_neighbors/knn_.cxx, exposed as
``DP.knn_search(support, query, k)`` in models/RandLA/helper_tool.py:161-171).

A KD-tree is a pointer-chasing structure — the wrong shape for a TPU.  For
the point counts this framework sees (<= 16k) an exact brute-force search is
a dense distance computation that maps straight onto the MXU, fused with a
running top-k.  Queries are processed in chunks under ``lax.map`` so peak
memory is O(chunk * n_support), never O(n_query * n_support).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def pairwise_sqdist(a: jax.Array, b: jax.Array) -> jax.Array:
    """Squared euclidean distances between two point sets.

    Args:
      a: [n, d]
      b: [m, d]
    Returns:
      [n, m] squared distances, computed as |a|^2 - 2ab + |b|^2 (one matmul —
      MXU-friendly), clamped at zero against cancellation.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)           # [n, 1]
    b2 = jnp.sum(b * b, axis=-1, keepdims=True).T          # [1, m]
    # HIGHEST precision: TPU matmuls default to bf16 inputs, whose ~8-bit
    # mantissa misranks near-ties; neighbour ordering must be exact.
    ab = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.maximum(a2 - 2.0 * ab + b2, 0.0)


@functools.partial(jax.jit,
                   static_argnames=("k", "chunk", "approx",
                                    "recall_target"))
def knn(support: jax.Array, query: jax.Array, k: int, chunk: int = 512,
        approx: bool = False, recall_target: float = 0.95):
    """Indices (into `support`) of the k nearest support points per query.

    Matches the contract of the reference ``DP.knn_search`` (sorted by
    ascending distance; ties broken by lower index, which nanoflann also
    does in practice for exact search).

    Args:
      support: [n, 3] points to search.
      query:   [m, 3] query points.
      k:       number of neighbours.
      chunk:   query chunk size bounding peak memory at chunk*n floats.
      approx:  use ``lax.approx_max_k`` (the TPU-native partial-reduction
        top-k, ~7x faster than exact top-k at n=4096).  Right for
        neighbour *aggregation* consumers (RandLA pooling, fusion
        gathers) where a 17th-nearest standing in for the 16th is
        immaterial; keep exact for metric paths.  k == 1 is always exact
        (argmin — cheaper than any top-k).
      recall_target: approx-mode recall lower bound (sets the kernel's
        reduction shape).  Measured on the v5e at [8,4096,4096] k=16:
        0.95 -> 6.6 ms (0.99 actual recall), 0.85 -> 4.7 ms (0.95
        actual); exact top_k is 75 ms on the same shape.

    Returns:
      idx: [m, k] int32 indices into support.
    """
    m = query.shape[0]
    n = support.shape[0]
    k_eff = min(k, n)
    chunk = min(chunk, m)
    pad = (-m) % chunk
    q = jnp.pad(query, ((0, pad), (0, 0)))
    q = q.reshape(-1, chunk, query.shape[-1])

    def one_chunk(qc):
        d = pairwise_sqdist(qc, support)                  # [chunk, n]
        if k_eff == 1:
            idx = jnp.argmin(d, axis=-1)[:, None]
        elif approx:
            _, idx = jax.lax.approx_max_k(-d, k_eff,
                                          recall_target=recall_target)
        else:
            _, idx = jax.lax.top_k(-d, k_eff)             # ascending dist
        return idx.astype(jnp.int32)

    idx = jax.lax.map(one_chunk, q).reshape(-1, k_eff)[:m]
    if k_eff < k:
        # fewer support points than neighbours requested: repeat the last
        # (duplicates are harmless for max-pool/attention consumers)
        idx = jnp.concatenate(
            [idx, jnp.tile(idx[:, -1:], (1, k - k_eff))], axis=1)
    return idx


@functools.partial(jax.jit, static_argnames=("prefixes", "chunk"))
def argmin_prefixes(support: jax.Array, query: jax.Array,
                    prefixes: tuple[int, ...], chunk: int = 1024):
    """Nearest-support index per query, for several support PREFIXES at once.

    Equivalent to ``tuple(knn(support[:p], query, 1) for p in prefixes)``
    but computes the [chunk, n] distance block once and reduces it per
    prefix — the FFB6D index pyramid's p2r searches at different levels
    share one support set whose levels are index prefixes (subsampling
    keeps the first n/4 points, linemod_pbr.py:538), so the per-level
    searches are column-prefix argmins of a single distance matrix.

    Args:
      support: [n, 3]; every prefix p must satisfy 0 < p <= n.
      query:   [m, 3].
      prefixes: static tuple of prefix lengths, any order.
    Returns:
      tuple of [m, 1] int32 arrays, one per prefix, bit-identical to the
      separate exact-argmin searches (ties -> lowest index, like knn).
    """
    m = query.shape[0]
    chunk = min(chunk, m)
    pad = (-m) % chunk
    q = jnp.pad(query, ((0, pad), (0, 0)))
    q = q.reshape(-1, chunk, query.shape[-1])

    def one_chunk(qc):
        d = pairwise_sqdist(qc, support)                  # [chunk, n]
        return tuple(jnp.argmin(d[:, :p], axis=-1).astype(jnp.int32)
                     for p in prefixes)

    outs = jax.lax.map(one_chunk, q)
    return tuple(o.reshape(-1)[:m, None] for o in outs)


def topk_block(sqd: jax.Array, k: int, approx: bool = False,
               recall_target: float = 0.95) -> jax.Array:
    """k smallest-distance indices per row of a precomputed [m, n] block.

    The reduction half of :func:`knn` (same approx/exact/k==1 branches and
    k > n padding), for callers that already hold the distance matrix —
    e.g. nested-prefix sub-blocks of one shared matrix.
    """
    n = sqd.shape[-1]
    k_eff = min(k, n)
    if k_eff == 1:
        idx = jnp.argmin(sqd, axis=-1)[:, None]
    elif approx:
        _, idx = jax.lax.approx_max_k(-sqd, k_eff,
                                      recall_target=recall_target)
    else:
        _, idx = jax.lax.top_k(-sqd, k_eff)
    idx = idx.astype(jnp.int32)
    if k_eff < k:
        idx = jnp.concatenate(
            [idx, jnp.tile(idx[:, -1:], (1, k - k_eff))], axis=1)
    return idx


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def knn_with_dist(support: jax.Array, query: jax.Array, k: int,
                  chunk: int = 512):
    """Like :func:`knn` but also returns euclidean distances [m, k].

    Shares knn's k > n_support contract: the last neighbour (and its
    distance) is repeated instead of crashing in ``top_k``."""
    m = query.shape[0]
    n = support.shape[0]
    k_eff = min(k, n)
    chunk = min(chunk, m)
    pad = (-m) % chunk
    q = jnp.pad(query, ((0, pad), (0, 0)))
    q = q.reshape(-1, chunk, query.shape[-1])

    def one_chunk(qc):
        d = pairwise_sqdist(qc, support)
        neg, idx = jax.lax.top_k(-d, k_eff)
        return idx.astype(jnp.int32), jnp.sqrt(-neg)

    idx, dist = jax.lax.map(one_chunk, q)
    idx = idx.reshape(-1, k_eff)[:m]
    dist = dist.reshape(-1, k_eff)[:m]
    if k_eff < k:
        idx = jnp.concatenate(
            [idx, jnp.tile(idx[:, -1:], (1, k - k_eff))], axis=1)
        dist = jnp.concatenate(
            [dist, jnp.tile(dist[:, -1:], (1, k - k_eff))], axis=1)
    return idx, dist
