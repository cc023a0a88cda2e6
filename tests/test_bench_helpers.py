"""Unit tests for bench.py's self-diagnosis helpers (VERDICT r3
item 2): the tunnel-health H2D probe and the per-section wall-clock
timer that feed the driver-visible JSON keys.  The bench itself runs
only on the chip; these pin the helpers' contracts on CPU."""

import jax

import conftest  # noqa: F401


def test_section_timer_records_wall_clock():
    import bench

    result = {}
    timer = bench._SectionTimer(result)
    with timer("alpha"):
        pass
    try:
        with timer("beta"):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    # both sections recorded (beta despite the exception), non-negative
    assert set(result["section_s"]) == {"alpha", "beta"}
    assert all(v >= 0 for v in result["section_s"].values())


def test_h2d_probe_returns_positive_mbps():
    import bench

    mbps = bench.h2d_probe(jax.devices("cpu")[0], mb=1)
    assert mbps > 0


def test_fresh_json_parses_last_line():
    import bench

    out = bench._fresh_json(
        ["-c", "print('noise'); import json; "
               "print(json.dumps({'k': 1.5}))"], 60, "t")
    assert out == {"k": 1.5}

    import pytest

    with pytest.raises(RuntimeError, match="rc=3"):
        bench._fresh_json(["-c", "import sys; sys.exit(3)"], 60, "t")


def test_measure_stacked_tiny_cpu():
    """Wiring shakeout of the stacked-fps bench section at tiny shapes
    on the CPU platform (the chip run is the real measurement)."""
    import jax
    import jax.numpy as jnp

    import bench
    from gdm_tpu.data.pipeline import assemble_inputs
    from gdm_tpu.models import GeoMatch

    with jax.default_device(jax.devices("cpu")[0]):
        graph, mesh, data, mesh_fps = bench.build_workload(
            im=64, n_sample=256, n_mesh=64, batch=2)
        model = GeoMatch(positive_r=0.01)
        small = {k: v[:1] for k, v in data.items()}
        inputs = assemble_inputs(
            jnp.asarray(small["rgb"]), jnp.asarray(small["cld_rgb_nrm"]),
            jnp.asarray(small["choose"]), jnp.asarray(small["xyz_img"]),
            knn_chunk=128)
        variables = jax.jit(
            lambda r, i, m: model.init(r, i, m, train=False))(
                jax.random.PRNGKey(0), inputs, mesh)
        fps = bench.measure_stacked(data, mesh, model, variables,
                                    n_objects=2, batch=4, iters=1,
                                    warmup=1)
    assert fps > 0
