"""Training-layer tests: schedules, train step, overfit, checkpointing,
8-virtual-device data parallelism.

Compile time dominates this file on CPU, so everything that can share a
compiled train step / initialised state does (module-scoped fixture);
TrainState is immutable, so sharing is safe.
"""

import os
import os.path as osp
from types import SimpleNamespace

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gdm_tpu.data.pipeline import assemble_inputs
from gdm_tpu.data.synthetic import make_batch, make_object
from gdm_tpu.models import GeoMatch
from gdm_tpu.models.geomatch import MeshArrays
from gdm_tpu.models.spline_mesh import build_mesh_graph
from gdm_tpu.train import (
    bn_momentum_schedule,
    create_train_state,
    cyclic_lr,
    load_checkpoint,
    make_optimizer,
    make_train_step,
    save_checkpoint,
)

K = np.array([[280.0, 0, 64], [0, 280.0, 64], [0, 0, 1]], np.float32)


def small_problem(batch=2, n_mesh=64, n_sample=256, im=64, seed=0):
    rng = np.random.RandomState(seed)
    mesh_fps = make_object(n_mesh, rng)
    graph = build_mesh_graph(mesh_fps, n_mesh)
    mesh = MeshArrays.from_graph(graph)
    data, _ = make_batch(mesh_fps, batch, K, im_size=im,
                         n_sample=n_sample, seed=seed)
    batch_dict = {k: jnp.array(v) for k, v in data.items()}
    return mesh, batch_dict


def _inputs(batch, knn_chunk=128):
    return assemble_inputs(
        batch["rgb"], batch["cld_rgb_nrm"], batch["choose"],
        batch["xyz_img"], labels=batch["labels"],
        match_idx=batch["match_idx"],
        visible_flag=batch["visible_flag"], RT=batch["RT"],
        knn_chunk=knn_chunk)


@pytest.fixture(scope="module")
def shared():
    """One model + initialised state + compiled step for the b=2 tests."""
    mesh, batch = small_problem()
    model = GeoMatch(positive_r=0.01)
    state0 = create_train_state(
        model, jax.random.PRNGKey(0), _inputs(batch), mesh,
        cyclic_lr(1e-4, 1e-3, 100))
    step = make_train_step(bn_momentum_schedule(), knn_chunk=128,
                           donate=False)
    return SimpleNamespace(mesh=mesh, batch=batch, model=model,
                           state0=state0, step=step)


class TestSchedules:
    def test_cyclic_lr_matches_torch(self):
        import torch

        sched = cyclic_lr(1e-6, 1e-3, step_size=50)
        opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=1.0)
        tsched = torch.optim.lr_scheduler.CyclicLR(
            opt, base_lr=1e-6, max_lr=1e-3, step_size_up=50,
            step_size_down=50, mode="triangular", cycle_momentum=False)
        for it in range(0, 160, 7):
            ours = float(sched(jnp.asarray(it)))
            theirs = tsched.get_last_lr()[0]
            assert abs(ours - theirs) < 1e-9, it
            for _ in range(7):
                opt.step()
                tsched.step()

    def test_bn_momentum_schedule(self):
        sched = bn_momentum_schedule(0.9, 0.5, decay_step=100,
                                     batch_size=10, clip=0.01)
        assert float(sched(jnp.asarray(0))) == pytest.approx(0.9)
        assert float(sched(jnp.asarray(10))) == pytest.approx(0.45)
        assert float(sched(jnp.asarray(10000))) == pytest.approx(0.01)


class TestTrainStep:
    @pytest.mark.slow
    def test_overfit_tiny(self, shared):
        state = shared.state0
        rng = jax.random.PRNGKey(7)
        losses = []
        for i in range(12):
            state, metrics = shared.step(state, shared.batch, shared.mesh,
                                         rng)
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.7, losses
        assert int(state.step) == 12

    @pytest.mark.slow
    def test_checkpoint_roundtrip(self, tmp_path, shared):
        state, _ = shared.step(shared.state0, shared.batch, shared.mesh,
                               jax.random.PRNGKey(7))
        save_checkpoint(state, str(tmp_path / "obj"), epoch=3)

        # restore into the pristine shared state as template
        restored, epoch = load_checkpoint(shared.state0,
                                          str(tmp_path / "obj"))
        assert epoch == 3
        assert int(restored.step) == 1
        a = jax.tree_util.tree_leaves(state.params)
        b = jax.tree_util.tree_leaves(restored.params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_missing_checkpoint_returns_none(self, tmp_path, shared):
        _, epoch = load_checkpoint(shared.state0, str(tmp_path / "nope"))
        assert epoch is None


class TestNonfiniteGuard:
    """solver.skip_nonfinite — the failure-detection layer the reference
    lacks entirely (SURVEY.md section 5: a NaN loss silently poisons a
    DDP run until someone reads the console)."""

    def test_optimizer_skips_then_passes_through(self):
        tx = make_optimizer(lambda _: 1e-2, skip_nonfinite=2)
        params = {"w": jnp.ones(3)}
        s = tx.init(params)
        nan_g = {"w": jnp.array([1.0, jnp.nan, 0.0])}
        fin_g = {"w": jnp.full(3, 0.5)}

        import optax

        # non-finite update: skipped, params unchanged, counter up
        u, s = tx.update(nan_g, s, params)
        p1 = optax.apply_updates(params, u)
        np.testing.assert_array_equal(np.asarray(p1["w"]), np.ones(3))
        assert int(s.total_notfinite) == 1

        # finite update: applied, consecutive counter resets
        u, s = tx.update(fin_g, s, params)
        p2 = optax.apply_updates(params, u)
        assert np.all(np.asarray(p2["w"]) != 1.0)
        assert int(s.notfinite_count) == 0

        # exceed max_consecutive_errors: the NaN passes through so the
        # failure surfaces instead of the run silently stalling
        for _ in range(2):
            u, s = tx.update(nan_g, s, params)
        u, s = tx.update(nan_g, s, params)
        p3 = optax.apply_updates(params, u)
        assert not np.all(np.isfinite(np.asarray(p3["w"])))

    @pytest.mark.slow
    def test_guarded_state_apply_gradients(self, shared):
        """A guarded TrainState skips a NaN-gradient apply_gradients and
        surfaces total_notfinite on its opt_state (what make_train_step
        exports as a metric).

        slow (70 s full-model state compile): default-suite
        representatives are test_optimizer_skips_then_passes_through
        (the optax guard itself, 3 s) and the 2-process resume test's
        guarded save/restore (test_multiprocess)."""
        tx = make_optimizer(cyclic_lr(1e-4, 1e-3, 100), skip_nonfinite=3)
        state = create_train_state(
            shared.model, jax.random.PRNGKey(0),
            _inputs(shared.batch), shared.mesh,
            cyclic_lr(1e-4, 1e-3, 100), tx=tx)
        assert hasattr(state.opt_state, "total_notfinite")

        bad_grads = jax.tree_util.tree_map(
            lambda p: jnp.full_like(p, jnp.nan), state.params)
        new_state = state.apply_gradients(bad_grads, state.batch_stats)
        assert int(new_state.opt_state.total_notfinite) == 1
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(new_state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # guarded checkpoints round-trip into a guarded template
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            save_checkpoint(new_state, osp.join(d, "obj"), epoch=0)
            restored, epoch = load_checkpoint(state, osp.join(d, "obj"))
            assert epoch == 0
            assert int(restored.opt_state.total_notfinite) == 1

            # cross-layout migration: a GUARDED checkpoint restores into
            # an UNGUARDED template (guard counters dropped) ...
            restored_u, epoch_u = load_checkpoint(
                shared.state0, osp.join(d, "obj"))
            assert epoch_u == 0
            assert not hasattr(restored_u.opt_state, "total_notfinite")
            for a, b in zip(
                    jax.tree_util.tree_leaves(new_state.params),
                    jax.tree_util.tree_leaves(restored_u.params)):
                np.testing.assert_array_equal(np.asarray(a),
                                              np.asarray(b))

        # ... and an UNGUARDED checkpoint restores into a GUARDED
        # template (fresh zeroed counters) — old checkpoints keep
        # loading after solver.skip_nonfinite changes the layout
        with tempfile.TemporaryDirectory() as d:
            save_checkpoint(shared.state0, osp.join(d, "obj"), epoch=2)
            restored_g, epoch_g = load_checkpoint(state, osp.join(d, "obj"))
            assert epoch_g == 2
            assert int(restored_g.opt_state.total_notfinite) == 0
            for a, b in zip(
                    jax.tree_util.tree_leaves(shared.state0.params),
                    jax.tree_util.tree_leaves(restored_g.params)):
                np.testing.assert_array_equal(np.asarray(a),
                                              np.asarray(b))


class TestJsonlLogger:
    def test_writes_and_appends(self, tmp_path):
        import json

        from gdm_tpu.utils.logging import JsonlLogger

        path = tmp_path / "sub" / "metrics.jsonl"
        log = JsonlLogger(str(path))
        log.write({"epoch": 0, "loss": 1.5, "lr": np.float32(0.1)})
        log.write({"epoch": 1, "loss": jnp.float32(0.7)})
        log.close()
        log2 = JsonlLogger(str(path))          # append, not truncate
        log2.write({"epoch": 2, "loss": 0.2})
        log2.close()
        rows = [json.loads(line) for line in path.read_text().splitlines()]
        assert [r["epoch"] for r in rows] == [0, 1, 2]
        assert rows[0]["lr"] == pytest.approx(0.1)
        assert all("ts" in r for r in rows)


class TestDataParallel:
    @pytest.mark.slow
    def test_sharded_train_step_8dev(self):
        """The driver-facing 8-device DP dryrun (one FULL train step over
        a Mesh('data'), SyncBN via GSPMD) must run AND reproduce the
        single-device loss on the same inputs/init.

        The sharded step executes in a SUBPROCESS: XLA's in-process CPU
        communicator hard-ABORTS the whole process (SIGABRT) when a
        collective rendezvous misses its timeout window — with the
        default 40 s that happened routinely for ~100 BN-sync
        collectives time-sliced over 8 virtual devices on this box's
        single core.  `--xla_cpu_collective_timeout_seconds` (conftest /
        `_dryrun_devices`) makes a pass the norm; subprocess isolation
        keeps a residual abort from killing pytest, with two retries and
        a skip only on repeated aborts (an rc=1 python failure still
        fails the test).
        """
        import re
        import subprocess
        import sys

        repo = osp.dirname(osp.dirname(osp.abspath(__file__)))
        sharded_loss = None
        for attempt in range(3):
            r = subprocess.run(
                [sys.executable, "-c",
                 "import __graft_entry__ as g; g.dryrun_dp(8)"],
                cwd=repo, env=dict(os.environ), timeout=2400,
                capture_output=True, text=True)
            if r.returncode == 0:
                m = re.search(r"dp loss=([-\d.naif]+) ok", r.stdout)
                assert m, r.stdout
                sharded_loss = float(m.group(1))
                break
            assert r.returncode == -6, (
                f"dryrun_dp failed rc={r.returncode}\n"
                f"{r.stdout[-2000:]}\n{r.stderr[-2000:]}")
        if sharded_loss is None:
            pytest.skip("8-way rendezvous aborted 3x (single-core "
                        "in-process CPU communicator scheduling)")

        # parity vs single-device on identical inputs and identical init
        # (same PRNGKeys as dryrun_dp): SyncBN-through-GSPMD means the
        # sharded loss equals the single-device loss on the full batch
        import __graft_entry__ as ge

        mesh, batch = ge._build_problem(batch=8)
        model = GeoMatch(positive_r=0.01)
        inputs = assemble_inputs(
            batch["rgb"], batch["cld_rgb_nrm"], batch["choose"],
            batch["xyz_img"], labels=batch["labels"],
            match_idx=batch["match_idx"],
            visible_flag=batch["visible_flag"], RT=batch["RT"],
            knn_chunk=128)
        state = create_train_state(
            model, jax.random.PRNGKey(0), inputs, mesh,
            cyclic_lr(1e-6, 1e-3, 100))
        step = make_train_step(bn_momentum_schedule(), knn_chunk=128,
                               donate=False)
        _, m_single = step(state, batch, mesh, jax.random.PRNGKey(1))
        # dryrun_dp prints 4 decimals -> abs tolerance 1e-4 on top
        assert sharded_loss == pytest.approx(
            float(m_single["loss"]), rel=2e-4, abs=1e-4)
