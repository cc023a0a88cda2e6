"""Shared inference body: KNN pyramid + forward + on-device pose fit.

The reference's eval path assembles inputs on the CPU dataloader, runs
the torch forward, then fits poses on a host thread pool
(train_lm.py:318-380, evaluator.py:294-303).  Here the whole chain is
one traced function of a finalized batch, used by BOTH the live jits
(cli._make_infer_jits) and the AOT serving export (gdm_tpu.serve), so a
serialized artifact runs exactly the program the evaluator validated.
"""

from __future__ import annotations


def run_inference(apply_fn, variables, fin, mesh_input, mesh_feats,
                  mesh_xyz, icp_reject, *, needs_pyramid: bool,
                  knn_chunk: int, exact_knn: bool, refine,
                  sp_mesh=None):
    """Finalized batch -> fitted poses [B, 3, 4].

    Args:
      apply_fn: the flax module apply (state.apply_fn).
      variables: {"params": ..., "batch_stats": ...}.
      fin: finalize_batch output (rgb, cld_rgb_nrm, choose, xyz_img,
        optionally det).
      mesh_input / mesh_feats / mesh_xyz: per-object mesh constants and
        the precomputed mesh-branch features (encode_mesh output).
      icp_reject: ICP correspondence gate in metres (traced scalar).
      needs_pyramid / knn_chunk / exact_knn / refine: static knobs —
        callers jit over them.
      sp_mesh: optional 2-D ('data', 'model') jax.sharding.Mesh (static;
        parallel.sp.make_mesh_2d).  When given, the similarity argmax
        runs model-axis sharded across the mesh columns
        (parallel.sp.sharded_cosine_argmax — exact jnp.argmax semantics,
        O(N*M/D_model) HBM per chip) instead of as one dense matmul;
        the CLI's --model-shards flag routes here.
    """
    from gdm_tpu.data.pipeline import assemble_inputs
    from gdm_tpu.eval.pose_fit import fit_poses_from_outputs

    if needs_pyramid:
        inputs = assemble_inputs(
            fin["rgb"], fin["cld_rgb_nrm"], fin["choose"],
            fin["xyz_img"], knn_chunk=knn_chunk, approx=not exact_knn)
    else:
        inputs = {"cld_rgb_nrm": fin["cld_rgb_nrm"]}
    out = apply_fn(variables, inputs, mesh_input, train=False,
                   mesh_features=mesh_feats)
    pre_idx = None
    if sp_mesh is not None:
        from gdm_tpu.parallel.sp import sharded_cosine_argmax

        pre_idx, _ = sharded_cosine_argmax(
            out["rgbd"], out["mesh"], sp_mesh)
    return fit_poses_from_outputs(
        fin["cld_rgb_nrm"][..., :3], out, mesh_xyz,
        det=fin.get("det"), refine=refine, icp_reject_dist=icp_reject,
        pre_idx=pre_idx)
