"""Training-layer tests: schedules, train step, overfit, checkpointing,
8-virtual-device data parallelism.

Compile time dominates this file on CPU, so everything that can share a
compiled train step / initialised state does (module-scoped fixture);
TrainState is immutable, so sharing is safe.
"""

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
from gdm_tpu.parallel import make_mesh, replicate, shard_batch
from gdm_tpu.train import (
    bn_momentum_schedule,
    create_train_state,
    cyclic_lr,
    load_checkpoint,
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


class TestDataParallel:
    @pytest.mark.slow
    def test_sharded_train_step_8dev(self, shared):
        devices = jax.devices("cpu")
        assert len(devices) == 8
        dp_mesh = make_mesh(devices)
        mesh, batch = small_problem(batch=8)
        batch = shard_batch({k: np.asarray(v) for k, v in batch.items()},
                            dp_mesh)
        mesh_r = replicate(mesh, dp_mesh)

        state = create_train_state(
            shared.model, jax.random.PRNGKey(0), _inputs(batch), mesh_r,
            cyclic_lr(1e-4, 1e-3, 100))
        state_sharded = state.replace(
            params=replicate(state.params, dp_mesh),
            batch_stats=replicate(state.batch_stats, dp_mesh),
            opt_state=replicate(state.opt_state, dp_mesh),
        )
        state2, metrics = shared.step(state_sharded, batch, mesh_r,
                                      jax.random.PRNGKey(7))
        assert np.isfinite(float(metrics["loss"]))

        # parity vs single-device on identical inputs and identical init
        # (same PRNGKey): the sharded step must produce the same loss
        # (global batch stats == SyncBN)
        host_batch = {k: np.asarray(v) for k, v in batch.items()}
        host_mesh = jax.tree_util.tree_map(np.asarray, mesh)
        _, m_single = shared.step(state, host_batch, host_mesh,
                                  jax.random.PRNGKey(7))
        assert float(metrics["loss"]) == pytest.approx(
            float(m_single["loss"]), rel=2e-4)
