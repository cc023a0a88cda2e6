"""Multi-object batched inference: one jit serving every object's model.

The reference keeps a python dict of per-object models and runs each batch
element through its object's network one bs=1 forward at a time
(cal_result_multimodel, train_lm.py:298-314) — a dispatch-bound host loop.

TPU-native re-design: all per-object parameter pytrees are stacked along a
leading object axis (they share one architecture, so every leaf stacks),
mesh constants likewise, and a vmap over the batch gathers each element's
parameter slice by its detected class id.  One compiled program serves a
mixed-object batch; XLA turns the per-element parameter selection into
dynamic-slices over the stacked weights.

Memory: 21 YCB-V objects x ~33 M params x f32 ≈ 2.8 GB resident — fine in
16 GB HBM; for more objects shard the object axis or fall back to the
per-object bucketing the CLI evaluator uses (gdm_tpu/cli.py evaluate()).

Numerics: identical to the per-object loop in f32 (tested exactly on the
CPU platform; measured on the TPU chip 2026-08-17 at production shapes —
21 stacked objects, 256² crops, 4096 pts/4096-vertex meshes — outputs
agree to ~1.6e-6 relative with ZERO argmax-correspondence or seg-mask
flips under jax.default_matmul_precision('float32')).  At the default
bf16 matmul precision the two routing paths differ by ~1% in raw
features, flipping ~0-1 of 4096 correspondences and ~0-2 seg points per
frame even on untrained random features (the near-tie worst case) —
immaterial for trained (peaked) features; wrap in
jax.default_matmul_precision('float32') if bit-stability across routing
paths matters.  Do NOT compare routing paths by fitted pose with random
weights: random features give a near-isotropic Kabsch covariance whose
SVD amplifies 1e-6 noise into arbitrary rotations.

Throughput (measured, same chip): each element runs a b=1 forward
against its own dynamic-sliced weights, so this path trades throughput
for single-dispatch mixed batches; when frames can be grouped by object,
the CLI evaluator's per-object bucketing (one shared compile, b=8) is
still several times faster.  Precomputing the batch-independent mesh
features once per object (encode_stacked_mesh_feats -> the infer fn's
``mesh_feats`` kwarg, round 5) instead of re-running the SplineCNN mesh
encoder inside every per-element forward measured 2.0x on chip at the
bench workload (57.3 -> 115.7 fps, b=16 mixed over 4 objects,
scripts/bench_stacked_ab.py 2026-08-21); the CLI stacked path always
passes it.  Chip note: features encoded in a separate jit differ from
features encoded inside the infer jit by XLA fusion-order ulps, which on
RANDOM near-isotropic features flips a few % of near-tie correspondence
argmaxes (49/2048 at a 256-vertex toy; seg argmax and Kabsch weights
bit-identical) — same class of noise as the bf16 note above, immaterial
for trained (peaked) features, and the per-object production path
precomputes its mesh features from a separate jit the same way.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stack_trees(trees):
    """Stack a list of identically-shaped pytrees along a new leading axis."""
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *trees)


def select_tree(stacked, index):
    """Dynamic-slice one element from a stacked pytree (jit friendly)."""
    return jax.tree_util.tree_map(
        lambda leaf: jax.lax.dynamic_index_in_dim(
            leaf, index, axis=0, keepdims=False), stacked)


def encode_stacked_mesh_feats(model, all_vars, meshes):
    """Precompute every object's mesh features once -> [n_objects, M, F].

    The per-object eval pipeline caches `encode_mesh` per object because
    the mesh branch is batch-independent (geomatch.py encode_mesh); the
    stacked path gets the same treatment here: one shared jit encodes
    each object's mesh once at setup, and `infer(..., mesh_feats=...)`
    gathers the features per element instead of re-running the SplineCNN
    mesh encoder inside every per-element forward (the round-4 design
    re-encoded the mesh B times per batch).
    """
    import jax.numpy as jnp

    enc = jax.jit(lambda v, m: model.apply(v, m, train=False,
                                           method="encode_mesh"))
    return jnp.stack([enc(v, m) for v, m in zip(all_vars, meshes)])


def make_multi_model_infer(model, fit_fn=None, group: int = 16,
                           refine: str | None = None,
                           icp_iters: int = 10):
    """Build infer(stacked_vars, stacked_mesh, inputs, obj_idx) -> poses.

    Args:
      model: the (shared-architecture) flax module, e.g. GeoMatch.
      fit_fn: optional (cld, end_points, mesh_xyz, det) -> pose for one
        element; defaults to the standard masked-Kabsch fit.
      group: elements vmapped together per lax.scan step.  The vmapped
        per-element weight gathers materialise [group x params]
        temporaries — a plain vmap over the whole batch scales them as
        batch x params, which crashed the XLA remote compile with 17 GB
        of gathered weights at b=128 / 33 M params (2026-08-20).
        Scanning groups of 16 (the chip-validated operating point)
        bounds compile memory while keeping any batch size: b=128 runs
        as 8 reused-buffer chunks (round 5, VERDICT r4 item 3).

    The returned callable expects:
      stacked_vars: {'params': ..., 'batch_stats': ...} with every leaf
        stacked [n_objects, ...] (stack_trees over per-object variables).
      stacked_mesh: MeshArrays with every field stacked [n_objects, ...].
      inputs: the per-element model input dict, batched [B, ...]
        (pyramid included — build with data.pipeline.assemble_inputs).
      cld: [B, N, 3]; obj_idx: [B] int32 position in the stacked object
        axis (NOT the dataset cls_id); det: [B] 0/1.
      icp_reject (call arg): [n_objects] f32 per-object ICP gate in
        metres (nn_dist_th x diameter convention) — per ELEMENT via its
        obj_idx, so mixed batches refine with each object's own gate.
        Pass None (default) when refine is None.
      B must be a multiple of min(group, B).
      refine: None | 'ransac' | 'icp' | 'meanshift' — the same
        per-element refinement fit_poses_from_outputs applies
        (eval/pose_fit.apply_refine), added round 5 so `infer
        --stacked --refine icp` matches the per-object loop.
      mesh_feats (call kwarg): optional [n_objects, M, F] precomputed
        mesh features (encode_stacked_mesh_feats).  When given, each
        element gathers its class's features instead of re-running the
        batch-independent mesh encoder inside the per-element forward —
        the stacked analogue of the per-object pipeline's cached
        encode_mesh.  Same values as the recompute path (the features
        come from the same encode_mesh jit).
    """
    from gdm_tpu.eval.pose_fit import apply_refine, fit_pose_single

    def one(stacked_vars, stacked_mesh, stacked_feats, icp_gates,
            inputs_b, cld_b, oi, det_b):
        variables = select_tree(stacked_vars, oi)
        mesh = select_tree(stacked_mesh, oi)
        inputs_1 = jax.tree_util.tree_map(
            lambda x: x[None], inputs_b)               # add batch dim of 1
        if stacked_feats is None:
            out = model.apply(variables, inputs_1, mesh, train=False)
        else:
            # precomputed per-object mesh features (encode_stacked_
            # mesh_feats): gather [M, F] by class instead of re-running
            # the batch-independent mesh encoder per element
            mf = jax.lax.dynamic_index_in_dim(
                stacked_feats, oi, axis=0, keepdims=False)
            out = model.apply(variables, inputs_1, mesh, train=False,
                              mesh_features=mf)
        if fit_fn is not None:
            return fit_fn(cld_b, out, mesh.xyz, det_b)
        rt, w, idx = fit_pose_single(
            cld_b, out["seg"][0], out["mesh"], out["rgbd"][0], mesh.xyz,
            det_b)
        if refine is not None:
            rt = apply_refine(rt, w, idx, cld_b, mesh.xyz, refine,
                              icp_iters=icp_iters,
                              icp_reject_dist=icp_gates[oi])
        return rt

    @jax.jit
    def infer(stacked_vars, stacked_mesh, inputs, cld, obj_idx, det,
              icp_reject=None, mesh_feats=None):
        b = obj_idx.shape[0]
        g = min(group, b)
        assert b % g == 0, (b, g)
        if icp_reject is None:
            icp_reject = jnp.full(
                (jax.tree_util.tree_leaves(stacked_vars)[0].shape[0],),
                0.01, jnp.float32)

        def vmapped(inputs_c, cld_c, oi_c, det_c):
            return jax.vmap(
                one, in_axes=(None, None, None, None, 0, 0, 0, 0)
            )(stacked_vars, stacked_mesh, mesh_feats, icp_reject,
              inputs_c, cld_c, oi_c, det_c)

        if b == g:
            return vmapped(inputs, cld, obj_idx, det)

        def resh(x):
            return x.reshape(b // g, g, *x.shape[1:])

        def step(_, xs):
            return None, vmapped(*xs)

        _, rts = jax.lax.scan(
            step, None,
            (jax.tree_util.tree_map(resh, inputs), resh(cld),
             resh(obj_idx), resh(det)))
        return rts.reshape(b, *rts.shape[2:])

    return infer
