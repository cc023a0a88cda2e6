"""AOT serving artifacts (gdm_tpu.serve): serialized finalize/infer
programs must reproduce the live jitted inference path on the same
inputs, survive a disk round-trip, and honour the metadata contract.

The reference has no deployment story beyond re-running the training
repo (train_lm.py:318-380); this subsystem is TPU-framework-only.
"""

import os.path as osp

import numpy as np
import pytest

import conftest  # noqa: F401

IM, N_MESH, N_SAMPLE, BATCH = 48, 32, 256, 2
KNN_CHUNK = 64


@pytest.fixture(scope="module")
def setup():
    import jax
    import jax.numpy as jnp

    from gdm_tpu.data.pipeline import assemble_inputs, finalize_batch
    from gdm_tpu.data.synthetic import make_object
    from gdm_tpu.models import GeoMatch
    from gdm_tpu.models.geomatch import MeshArrays
    from gdm_tpu.models.spline_mesh import build_mesh_graph

    rng = np.random.RandomState(0)
    K = np.array([[210.0, 0, IM / 2], [0, 210.0, IM / 2], [0, 0, 1]],
                 np.float32)
    mesh_fps = make_object(N_MESH, rng, radius=0.04)
    mesh = MeshArrays.from_graph(build_mesh_graph(mesh_fps, N_MESH))
    model = GeoMatch(positive_r=0.01)

    raw = {
        "rgb_u8": rng.randint(0, 255, (BATCH, IM, IM, 3)).astype(
            np.uint8),
        "dpt_u16": (4000 + 1000 * rng.rand(BATCH, IM, IM)).astype(
            np.uint16),
        "dpt_scale": np.full((BATCH,), 10000.0, np.float32),
        "K_crop": np.tile(K, (BATCH, 1, 1)),
        "choose": rng.randint(0, IM * IM, (BATCH, N_SAMPLE)).astype(
            np.int32),
        "det": np.ones((BATCH,), np.int32),
    }
    fin = finalize_batch({k: jnp.asarray(v) for k, v in raw.items()},
                         fill_depth=False)
    inputs = assemble_inputs(fin["rgb"], fin["cld_rgb_nrm"],
                             fin["choose"], fin["xyz_img"],
                             knn_chunk=KNN_CHUNK)
    variables = jax.jit(
        lambda r, i, m: model.init(r, i, m, train=False))(
            jax.random.PRNGKey(0), inputs, mesh)
    mesh_feats = model.apply(variables, mesh, train=False,
                             method="encode_mesh")
    return model, mesh, variables, mesh_feats, raw


def _live_poses(model, mesh, variables, mesh_feats, raw, refine=None):
    import jax
    import jax.numpy as jnp

    from gdm_tpu.data.pipeline import finalize_batch
    from gdm_tpu.eval.infer import run_inference

    fin = finalize_batch({k: jnp.asarray(v) for k, v in raw.items()},
                         fill_depth=False)
    step = jax.jit(lambda f: run_inference(
        model.apply, variables, f, mesh, mesh_feats, mesh.xyz,
        jnp.float32(0.01), needs_pyramid=True, knn_chunk=KNN_CHUNK,
        exact_knn=False, refine=refine))
    return np.asarray(step(fin))


def test_artifact_matches_live_path(setup, tmp_path):
    from gdm_tpu import serve

    model, mesh, variables, mesh_feats, raw = setup
    out = str(tmp_path / "artifact")
    info = serve.export_serving_artifact(
        out,
        apply_fn=model.apply, variables=variables, mesh_input=mesh,
        mesh_feats=mesh_feats, mesh_xyz=mesh.xyz,
        raw_spec=serve.raw_input_spec(BATCH, IM, N_SAMPLE,
                                      fill_depth=False),
        fill_depth=False, needs_pyramid=True, knn_chunk=KNN_CHUNK,
        exact_knn=False, refine=None, icp_reject=0.01,
        platforms=("cpu",), meta={"obj_name": "synthetic"})
    assert osp.exists(osp.join(out, "finalize.bin"))
    assert osp.exists(osp.join(out, "infer.bin"))
    assert info["obj_name"] == "synthetic"
    assert info["raw_spec"]["rgb_u8"] == [[BATCH, IM, IM, 3], "uint8"]

    art = serve.load_artifact(out)
    assert art.platforms == ("cpu",)
    # staged: finalize output feeds infer, like the live evaluator
    fin = art.finalize(raw)
    poses = np.asarray(art.infer(fin))
    assert poses.shape == (BATCH, 3, 4)
    # one-call convenience path is the same program chain
    poses2 = np.asarray(art.run(raw))
    np.testing.assert_array_equal(poses, poses2)

    live = _live_poses(model, mesh, variables, mesh_feats, raw)
    np.testing.assert_allclose(poses, live, rtol=0, atol=1e-5)
    # rotations are valid (orthonormal, det +1)
    rtr = poses[:, :, :3] @ poses[:, :, :3].transpose(0, 2, 1)
    np.testing.assert_allclose(rtr, np.tile(np.eye(3), (BATCH, 1, 1)),
                               atol=1e-4)


@pytest.fixture(scope="module")
def artifact_dir(setup, tmp_path_factory):
    """One exported artifact shared by all server tests."""
    from gdm_tpu import serve

    model, mesh, variables, mesh_feats, raw = setup
    out = str(tmp_path_factory.mktemp("serving") / "synthetic")
    serve.export_serving_artifact(
        out,
        apply_fn=model.apply, variables=variables, mesh_input=mesh,
        mesh_feats=mesh_feats, mesh_xyz=mesh.xyz,
        raw_spec=serve.raw_input_spec(BATCH, IM, N_SAMPLE,
                                      fill_depth=False),
        fill_depth=False, needs_pyramid=True, knn_chunk=KNN_CHUNK,
        exact_knn=False, refine=None, icp_reject=0.01,
        platforms=("cpu",), meta={"obj_name": "synthetic"})
    return out


@pytest.fixture(scope="module")
def pose_server(artifact_dir):
    """A live PoseService + HTTP server on an ephemeral port."""
    import threading

    from gdm_tpu import serve
    from gdm_tpu.server import PoseService, make_server

    service = PoseService({"synthetic": serve.load_artifact(artifact_dir)})
    server = make_server(service, "127.0.0.1", 0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    host, port = server.server_address[:2]
    yield service, f"http://{host}:{port}"
    server.shutdown()
    server.server_close()
    t.join(timeout=10)


def test_server_pose_roundtrip(setup, artifact_dir, pose_server):
    """POST /pose over real HTTP reproduces the direct artifact call,
    including the short-batch pad/slice path."""
    from gdm_tpu import serve
    from gdm_tpu.server import request_poses

    _, _, _, _, raw = setup
    service, url = pose_server
    art = serve.load_artifact(artifact_dir)
    direct = np.asarray(art.run(raw))

    poses, ms = request_poses(url, raw)                 # full batch
    assert poses.shape == (BATCH, 3, 4) and ms > 0
    np.testing.assert_allclose(poses, direct, rtol=0, atol=1e-5)

    raw1 = {k: v[:1] for k, v in raw.items()}           # padded batch
    poses1, _ = request_poses(url, raw1, obj="synthetic")
    assert poses1.shape == (1, 3, 4)
    np.testing.assert_allclose(poses1, direct[:1], rtol=0, atol=1e-5)


def test_server_routes_and_errors(setup, pose_server):
    import json
    from urllib.request import urlopen

    from gdm_tpu.server import request_poses, synthetic_raw

    _, _, _, _, raw = setup
    service, url = pose_server

    with urlopen(url + "/healthz", timeout=30) as r:
        h = json.loads(r.read())
    assert h["ok"] and h["objects"] == ["synthetic"]
    assert h["platforms"]["synthetic"] == ["cpu"]

    with urlopen(url + "/meta?obj=synthetic", timeout=30) as r:
        meta = json.loads(r.read())
    assert meta["obj_name"] == "synthetic"
    assert meta["raw_spec"]["rgb_u8"] == [[BATCH, IM, IM, 3], "uint8"]

    # the synthetic warmup batch matches the artifact contract
    warm = synthetic_raw(meta)
    poses, _ = service.run("synthetic", warm)
    assert poses.shape == (BATCH, 3, 4)
    assert np.all(np.isfinite(poses))

    with pytest.raises(RuntimeError, match="unknown object"):
        request_poses(url, raw, obj="nope")
    bad = dict(raw)
    bad["dpt_u16"] = raw["dpt_u16"].astype(np.int32)    # wrong dtype
    with pytest.raises(RuntimeError, match="dtype"):
        request_poses(url, bad)
    with pytest.raises(RuntimeError, match="missing"):
        request_poses(url, {k: v for k, v in raw.items()
                            if k != "choose"})
    over = {k: np.repeat(v, 2, axis=0) for k, v in raw.items()}
    with pytest.raises(RuntimeError, match="batch"):
        request_poses(url, over)                        # b > artifact cap


def test_load_artifact_tree(artifact_dir, tmp_path):
    """cli serve's discovery: direct dirs, root-of-artifacts scan,
    duplicate names and artifact-free roots rejected."""
    from gdm_tpu.server import load_artifact_tree

    arts = load_artifact_tree([artifact_dir])           # direct
    assert sorted(arts) == ["synthetic"]

    root = osp.dirname(artifact_dir)                    # root scan
    arts = load_artifact_tree([root])
    assert sorted(arts) == ["synthetic"]

    with pytest.raises(ValueError, match="duplicate"):
        load_artifact_tree([artifact_dir, root])
    with pytest.raises(ValueError, match="no artifact"):
        load_artifact_tree([str(tmp_path)])


def test_artifact_refuses_newer_format(setup, tmp_path):
    import json

    from gdm_tpu import serve

    model, mesh, variables, mesh_feats, raw = setup
    out = str(tmp_path / "artifact")
    serve.export_serving_artifact(
        out,
        apply_fn=model.apply, variables=variables, mesh_input=mesh,
        mesh_feats=mesh_feats, mesh_xyz=mesh.xyz,
        raw_spec=serve.raw_input_spec(BATCH, IM, N_SAMPLE,
                                      fill_depth=False),
        fill_depth=False, needs_pyramid=True, knn_chunk=KNN_CHUNK,
        exact_knn=False, refine=None, icp_reject=0.01,
        platforms=("cpu",))
    meta_path = osp.join(out, "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    meta["format_version"] = serve._FORMAT_VERSION + 1
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    with pytest.raises(ValueError, match="newer"):
        serve.load_artifact(out)


def test_server_http_robustness(setup, pose_server):
    """Early-exit replies close the connection (an unread npz body on a
    keep-alive socket would be parsed as the next request line) and
    hostile Content-Length values are rejected before allocation."""
    import http.client

    from gdm_tpu.server import encode_arrays

    _, _, _, _, raw = setup
    service, url = pose_server
    host, port = url[len("http://"):].split(":")
    body = encode_arrays({k: v[:1] for k, v in raw.items()})

    # wrong route with a body: 404 AND Connection: close
    c = http.client.HTTPConnection(host, int(port), timeout=30)
    c.request("POST", "/poses", body=body)
    r = c.getresponse()
    assert r.status == 404
    assert (r.getheader("Connection") or "").lower() == "close"
    r.read()
    c.close()

    # claimed body size beyond the sanity cap -> 413 without reading
    c = http.client.HTTPConnection(host, int(port), timeout=30)
    c.putrequest("POST", "/pose")
    c.putheader("Content-Length", str(service.max_body_bytes + 1))
    c.endheaders()
    r = c.getresponse()
    assert r.status == 413
    r.read()
    c.close()

    # non-numeric Content-Length -> clean 400, not a 500
    c = http.client.HTTPConnection(host, int(port), timeout=30)
    c.putrequest("POST", "/pose")
    c.putheader("Content-Length", "banana")
    c.endheaders()
    r = c.getresponse()
    assert r.status == 400
    r.read()
    c.close()

    # a well-formed request on a FRESH connection still works after the
    # errors above (the daemon survived)
    from gdm_tpu.server import request_poses

    poses, _ = request_poses(url, {k: v[:1] for k, v in raw.items()})
    assert poses.shape == (1, 3, 4)


def test_server_obj_name_quoting(artifact_dir):
    """Route names with URL-reserved characters survive the client
    helper (request_poses must quote the obj query parameter)."""
    import threading

    from gdm_tpu import serve
    from gdm_tpu.server import (
        PoseService,
        make_server,
        request_poses,
        synthetic_raw,
    )

    art = serve.load_artifact(artifact_dir)
    service = PoseService({"blue cup": art})
    server = make_server(service, "127.0.0.1", 0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    host, port = server.server_address[:2]
    try:
        raw = synthetic_raw(art.meta)
        poses, _ = request_poses(f"http://{host}:{port}", raw,
                                 obj="blue cup")
        assert poses.shape == (BATCH, 3, 4)
    finally:
        server.shutdown()
        server.server_close()
        t.join(timeout=10)


def test_artifact_platform_fallback_and_fill(artifact_dir):
    """A cpu-only artifact runs even when the process default backend is
    another platform (ServingArtifact pins execution to a platform it
    was lowered for); serve.synthetic_raw accepts both spec forms."""
    import jax

    from gdm_tpu import serve

    art = serve.load_artifact(artifact_dir)
    if jax.default_backend() not in art.platforms:
        assert art._device is not None
        assert art._device.platform == "cpu"
    else:
        assert art._device is None

    # meta (serialized) form and live ShapeDtypeStruct form agree
    a = serve.synthetic_raw(art.meta["raw_spec"])
    b = serve.synthetic_raw(serve.raw_input_spec(
        BATCH, IM, N_SAMPLE, fill_depth=False, with_det=True))
    assert set(a) == set(b)
    for k in a:
        assert a[k].shape == b[k].shape and a[k].dtype == b[k].dtype
        np.testing.assert_array_equal(a[k], b[k])
    assert int(a["dpt_u16"].min()) > 0          # non-degenerate depth
    assert float(a["dpt_scale"].min()) > 0
    assert float(a["K_crop"][0, 0, 0]) > 0      # non-degenerate fx

    poses = np.asarray(art.run(a))
    assert poses.shape == (BATCH, 3, 4) and np.all(np.isfinite(poses))
