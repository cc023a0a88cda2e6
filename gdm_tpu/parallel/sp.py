"""Model-axis (mesh-column) sharding: the framework's sequence-parallel
story, distributed across chips.

The reference has no SP/TP to mirror (SURVEY.md §2d) — its scaling axis is
point count: N scene points against M mesh columns in the similarity
matrix (geoMatch.py:136, evaluator.py:89-93).  Within one chip that axis
is handled by chunking and the Pallas streaming kernel (ops/pallas/).
This module extends the same idea ACROSS chips for meshes too large for
one device: shard the mesh columns over a `model` mesh axis and combine
per-row results with XLA collectives over ICI —

  * correspondence search: each shard takes a local argmax over its
    columns, then a `pmax` of scores + `pmin` of tying winners
    reproduces the global argmax exactly (first-max-wins, like
    jnp.argmax);
  * matching loss: the circle loss is two masked log-sum-exps per row
    (losses/circle.py); each shard contributes a (running max, shifted
    sum-of-exp) pair and the pair merges associatively with one `pmax` +
    one `psum` per LSE — a flash-attention-style distributed softmax.
    The padding column (geoMatch.py:117-119) is folded in once after the
    collective merge, so no shard double-counts it.

Both functions are `shard_map`s over a 2-D (data, model) mesh and compose
with the existing data parallelism: batch rows stay sharded on `data`
while mesh columns shard on `model`.  HBM per chip is O(N·M/D_model) and
the only cross-chip traffic is O(N) scalars per row-reduction — the
similarity matrix itself never crosses ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gdm_tpu.losses.circle import masked_logsumexp  # noqa: F401 (parity)

_I32_MAX = jnp.iinfo(jnp.int32).max


def make_mesh_2d(devices=None, data: int | None = None,
                 model: int = 1) -> Mesh:
    """(data, model) mesh; `data` defaults to n_devices // model.

    Like make_mesh, the default device list honours a
    ``jax_default_device`` pin (default_devices) so CPU-pinned tests and
    dryruns never land on the tunneled TPU chip."""
    import numpy as np

    from gdm_tpu.parallel.mesh import default_devices

    devices = default_devices() if devices is None else list(devices)
    if data is None:
        data = len(devices) // model
    assert data * model == len(devices), (data, model, len(devices))
    return Mesh(np.array(devices).reshape(data, model), ("data", "model"))


def _l2norm(x, axis=-1):
    return x / jnp.maximum(
        jnp.linalg.norm(x, axis=axis, keepdims=True), 1e-12)


def sharded_cosine_argmax(scene_f: jax.Array, mesh_f: jax.Array,
                          mesh: Mesh):
    """Global per-row argmax over mesh columns sharded across `model`.

    Args:
      scene_f: [B, N, C] scene features, batch sharded on `data`
        (un-normalised; normalised internally like pose_fit).
      mesh_f:  [M, C] mesh features, rows sharded on `model`.
      mesh:    2-D ('data', 'model') device mesh.

    Returns:
      (idx [B, N] int32 global vertex ids, score [B, N] f32), sharded on
      `data`.  Exactly jnp.argmax semantics: ties break to the lowest
      global column index.
    """
    m_total = mesh_f.shape[0]
    n_model = mesh.shape["model"]
    assert m_total % n_model == 0, (m_total, n_model)
    m_loc = m_total // n_model

    def local(sf, mf):
        f = _l2norm(sf)
        g = _l2norm(mf)
        sim = jax.lax.dot_general(
            f, g, (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # [B_loc, N, M_loc]
        best = jnp.max(sim, axis=-1)
        arg = (jnp.argmax(sim, axis=-1).astype(jnp.int32)
               + jax.lax.axis_index("model") * m_loc)
        gbest = jax.lax.pmax(best, "model")
        cand = jnp.where(best == gbest, arg, _I32_MAX)
        gidx = jax.lax.pmin(cand, "model")
        return gidx, gbest

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("data"), P("model")),
        out_specs=(P("data"), P("data")))
    return fn(scene_f, mesh_f)


def _lse_pair(logits, mask):
    """Local (max, shifted sum-of-exp) of a masked LSE along the last axis.

    The pair represents sum(exp(logits[mask])) = se * exp(mx_safe); pairs
    merge associatively (see _merge_*).  Empty mask -> (-inf, 0).

    Every max/shift is stop-gradiented: the analytic LSE gradient is the
    softmax weights exp(l - M)/sum, which the shifted `se` sums carry —
    a differentiable shift would only add terms that cancel, and pmax
    lacks a clean transpose under shard_map.
    """
    neg_inf = jnp.asarray(-jnp.inf, logits.dtype)
    mx = jax.lax.stop_gradient(
        jnp.max(jnp.where(mask, logits, neg_inf), axis=-1))
    mx_safe = jnp.where(jnp.isfinite(mx), mx, 0.0)
    se = jnp.sum(jnp.where(mask, jnp.exp(logits - mx_safe[..., None]), 0.0),
                 axis=-1)
    return mx, se


def _merge_axis(mx, se, axis_name):
    """Merge (mx, se) pairs across a mesh axis: pmax + rescaled psum.

    `mx` is already stop-gradiented (_lse_pair), so only `se` carries
    gradient through the psum.
    """
    gmx = jax.lax.pmax(mx, axis_name)
    gmx_safe = jnp.where(jnp.isfinite(gmx), gmx, 0.0)
    mx_safe = jnp.where(jnp.isfinite(mx), mx, gmx_safe)
    se = jax.lax.psum(se * jnp.exp(mx_safe - gmx_safe), axis_name)
    return gmx, se


def _merge_scalar(mx, se, logit, mask):
    """Fold one extra (replicated) column into a merged (mx, se) pair."""
    lmx = jax.lax.stop_gradient(jnp.where(mask, logit, -jnp.inf))
    gmx = jnp.maximum(mx, lmx)
    gmx_safe = jnp.where(jnp.isfinite(gmx), gmx, 0.0)
    mx_safe = jnp.where(jnp.isfinite(mx), mx, gmx_safe)
    se = se * jnp.exp(mx_safe - gmx_safe) \
        + jnp.where(mask, jnp.exp(logit - gmx_safe), 0.0)
    return gmx, se


def _finish_lse(mx, se):
    """masked_logsumexp-compatible finish: mx_safe + log(max(se, 1e-30))."""
    mx_safe = jnp.where(jnp.isfinite(mx), mx, 0.0)
    return mx_safe + jnp.log(jnp.maximum(se, 1e-30))


def sharded_matching_loss(
    rgbd_features: jax.Array,
    mesh_features: jax.Array,
    mesh_xyz: jax.Array,
    labels: jax.Array,
    match_idx: jax.Array,
    visible_flag: jax.Array,
    positive_r: float | jax.Array,
    mesh: Mesh,
    m: float = 0.2,
    gamma: float = 16.0,
    sym_idx: jax.Array | None = None,
    pad_onehot: bool = False,
    rt: jax.Array | None = None,
    depth_scaled_r_mm: float | None = None,
) -> jax.Array:
    """pointwise_matching_loss (flagship RandLA path) with mesh columns
    sharded over the `model` axis.

    Numerically equal to losses/matching.pointwise_matching_loss
    (pad column of -1s, circle loss, >=3-foreground element weighting —
    geoMatch.py:102-157) up to f32 reduction order; verified in
    tests/test_sp.py.  Peak per-chip memory is O(B_loc * N * M/D_model)
    instead of O(B * N * M).

    Args:
      rgbd_features: [B, N, C] sharded on `data`.
      mesh_features: [M, C] sharded on `model`.
      mesh_xyz:      [M, 3] REPLICATED (needed whole for the GT gather;
        tiny — 12 B/vertex).
      labels, match_idx: [B, N] sharded on `data`.
      visible_flag:  [B, M] sharded on ('data', 'model').
      positive_r:    scalar radius (neighbor_dis_th * diameter).
      mesh:          2-D ('data', 'model') device mesh.
      sym_idx:       optional [M] symmetry table, REPLICATED — switches
        to the symmetric-positive mask (losses/matching.
        matching_positive_mask_sym: positives at match_idx[i] and at
        sym_idx[match_idx[i]]; radius/visibility unused).
      pad_onehot:    pad column is e0 instead of -1s — the DGCNN
        variant's convention (geoMatch_DGCNN.py:95-98); with a unit
        row the pad similarity is simply f[:, 0].
      rt, depth_scaled_r_mm: the DGCNN variant's depth-proportional
        positive radius (geoMatch_DGCNN.py:23,62-65): radius for mesh
        column j is (r_mm/1000) * z_j with z_j the camera-frame depth
        of vertex j under the element's GT pose.  rt: [B, 3, 4]
        sharded on `data`; overrides positive_r when set (round 5:
        lifts the dgcnn exclusion from `train --model-shards`,
        VERDICT r4 item 4).

    Returns:
      scalar loss (replicated).
    """
    from gdm_tpu.ops.knn import pairwise_sqdist

    m_total = mesh_features.shape[0]
    n_model = mesh.shape["model"]
    assert m_total % n_model == 0, (m_total, n_model)
    m_loc = m_total // n_model
    c = mesh_features.shape[-1]
    # the pad column is a C-vector of -1s, column-normalised
    # (geoMatch.py:117-119) -> sim with unit f is -sum(f) / sqrt(C)
    inv_sqrt_c = 1.0 / jnp.sqrt(jnp.asarray(c, jnp.float32))

    use_sym = sym_idx is not None
    sym_arr = (jnp.zeros((m_total,), jnp.int32) if sym_idx is None
               else sym_idx)
    use_depth_r = depth_scaled_r_mm is not None
    rt_arr = (jnp.zeros((rgbd_features.shape[0], 3, 4), jnp.float32)
              if rt is None else rt)

    def local(feats, mf, mxyz, lab, midx, vis, pr, sym, pose):
        k = jax.lax.axis_index("model")
        cols = jax.lax.dynamic_slice_in_dim(mxyz, k * m_loc, m_loc, 0)
        g = _l2norm(mf)                                   # [M_loc, C]
        gcols = k * m_loc + jnp.arange(m_loc)             # global col ids

        def one_element(f_e, lab_e, midx_e, vis_e, pose_e):
            f = _l2norm(f_e)                              # [N, C]
            sim = jax.lax.dot_general(
                f, g, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # [N, M_loc]
            if pad_onehot:                # unit row -> sim with e0
                sim_pad = f[:, 0]                         # [N]
            else:
                sim_pad = -jnp.sum(f, axis=-1) * inv_sqrt_c

            in_mesh = midx_e != m_total
            safe = jnp.clip(midx_e, 0, m_total - 1)
            if use_sym:
                # matching_positive_mask_sym on this shard's columns:
                # positives where the global column id is the match or
                # its symmetric counterpart
                sidx = jnp.take(sym, safe)                # [N]
                pos = ((gcols[None, :] == safe[:, None])
                       | (gcols[None, :] == sidx[:, None])) \
                    & in_mesh[:, None]
            else:
                gt_pt = jnp.take(mxyz, safe, axis=0)      # [N, 3]
                d2 = pairwise_sqdist(gt_pt, cols)         # [N, M_loc]
                if use_depth_r:
                    # per-COLUMN radius r_mm/1000 * z_j on the local
                    # columns; dot order matches the dense
                    # matching_positive_mask_depth_scaled bit-exactly
                    z = cols @ pose_e[2, :3] + pose_e[2, 3]
                    r_cols = (depth_scaled_r_mm / 1000.0) * z
                    near = d2 < jnp.square(r_cols)[None, :]
                else:
                    near = d2 < jnp.square(pr)
                pos = near & (vis_e > 0)[None, :] \
                    & in_mesh[:, None]
            pos_pad = ~in_mesh                            # [N]

            ap = jax.lax.stop_gradient(jnp.maximum(1.0 + m - sim, 0.0))
            an = jax.lax.stop_gradient(jnp.maximum(sim + m, 0.0))
            lp = -ap * (sim - (1.0 - m)) * gamma
            ln = an * (sim - m) * gamma
            app = jax.lax.stop_gradient(
                jnp.maximum(1.0 + m - sim_pad, 0.0))
            anp = jax.lax.stop_gradient(jnp.maximum(sim_pad + m, 0.0))
            lpp = -app * (sim_pad - (1.0 - m)) * gamma
            lnp = anp * (sim_pad - m) * gamma

            mx_p, se_p = _lse_pair(lp, pos)
            mx_n, se_n = _lse_pair(ln, ~pos)
            mx_p, se_p = _merge_axis(mx_p, se_p, "model")
            mx_n, se_n = _merge_axis(mx_n, se_n, "model")
            mx_p, se_p = _merge_scalar(mx_p, se_p, lpp, pos_pad)
            mx_n, se_n = _merge_scalar(mx_n, se_n, lnp, ~pos_pad)
            per_row = jax.nn.softplus(
                _finish_lse(mx_p, se_p) + _finish_lse(mx_n, se_n))

            row_valid = (lab_e == 1)
            n_fg = jnp.sum(row_valid)
            elem = jnp.sum(per_row * row_valid) / jnp.maximum(n_fg, 1)
            return elem, (n_fg >= 3).astype(jnp.float32)

        losses, ws = jax.vmap(one_element)(feats, lab, midx, vis, pose)
        # per-element values are identical on every model-axis shard
        num = jax.lax.psum(jnp.sum(losses * ws), "data")
        den = jax.lax.psum(jnp.sum(ws), "data")
        return num / jnp.maximum(den, 1.0)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("data"), P("model"), P(), P("data"), P("data"),
                  P("data", "model"), P(), P(), P("data")),
        out_specs=P())
    return fn(rgbd_features, mesh_features, mesh_xyz, labels, match_idx,
              visible_flag, jnp.asarray(positive_r, jnp.float32),
              sym_arr, rt_arr)
