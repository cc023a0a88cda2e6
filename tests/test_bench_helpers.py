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
