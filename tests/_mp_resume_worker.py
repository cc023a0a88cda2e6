"""Worker for the 2-process checkpoint save->restart->resume rehearsal
(test_multiprocess.py::test_two_process_save_restart_resume).

The reference resumes mid-training from rank-0 checkpoints
(train_lm.py:118-154,292-296).  Our single-process roundtrip test
(test_train.py) cannot catch a layout mismatch on restore under
jax.distributed — this worker runs the REAL path cross-process:

  phase "save":   2 processes build a replicated TrainState over the
                  global 4-device mesh, run 2 SPMD train steps through
                  train.make_train_step (BN stats sync + guarded Adam),
                  rank 0 writes save_checkpoint, both dump their final
                  params/opt-state to JSON.
  phase "resume": a FRESH 2-process run re-initialises (different seed
                  => different init, proving the restore is what
                  matches), load_checkpoint's the rank-0 file on BOTH
                  ranks, dumps the restored tensors (parent asserts
                  bitwise equality with phase save), then runs ONE more
                  successful step.

The model is a miniature flax module with the GeoMatch apply contract
(inputs, mesh, train, momentum, mutable batch_stats, loss keys) so the
REAL make_train_step / TrainState / apply_if_finite optimizer /
checkpoint code runs unmodified — only the network inside is small
enough for a 1-core 2-process gloo rehearsal.

Usage: python _mp_resume_worker.py <pid> <nproc> <port> <out.json>
       <ckpt_dir> <phase>
"""

import json
import os
import sys


class MiniModel:
    """Built lazily (flax import after jax.distributed init)."""

    def __new__(cls):
        import flax.linen as nn
        import jax.numpy as jnp

        class _Mini(nn.Module):
            @nn.compact
            def __call__(self, inputs, mesh, train=False, momentum=0.1):
                h = nn.Dense(16, name="d1")(inputs["x"])
                h = nn.BatchNorm(use_running_average=not train,
                                 momentum=momentum, name="bn")(h)
                h = nn.relu(h)
                out = nn.Dense(4, name="d2")(h) @ mesh
                loss = jnp.mean((out - inputs["y"]) ** 2)
                return {"loss": loss, "seg_loss": loss,
                        "match_loss": loss}

        return _Mini()


def _tolist(tree):
    import jax

    return jax.tree_util.tree_map(
        lambda x: __import__("numpy").asarray(x).tolist(), tree)


def main():
    pid, nproc, port, out_path, ckpt_dir, phase = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
        sys.argv[5], sys.argv[6])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    import jax

    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(f"localhost:{port}", nproc, pid)
    local_cpu = [d for d in jax.devices("cpu")
                 if d.process_index == jax.process_index("cpu")][0]
    jax.config.update("jax_default_device", local_cpu)

    import jax.numpy as jnp
    import numpy as np

    from gdm_tpu.parallel import make_mesh, replicate, shard_batch
    from gdm_tpu.train import (
        bn_momentum_schedule,
        create_train_state,
        cyclic_lr,
        load_checkpoint,
        make_optimizer,
        make_train_step,
        save_checkpoint,
    )

    cpus = sorted(jax.devices("cpu"), key=lambda d: (d.process_index,
                                                     d.id))
    rank = jax.process_index("cpu")
    mesh = make_mesh(devices=cpus)

    rng_d = np.random.RandomState(7)
    batch = shard_batch(
        {"x": rng_d.randn(8, 8).astype(np.float32),
         "y": rng_d.randn(8, 4).astype(np.float32)}, mesh)
    mesh_in = replicate(jnp.eye(4, dtype=jnp.float32), mesh)

    model = MiniModel()
    lr = cyclic_lr(1e-4, 1e-2, 10)
    tx = make_optimizer(lr, skip_nonfinite=5)   # the guarded layout
    # resume phase inits with a DIFFERENT seed: only the restore can
    # make the two phases' tensors bitwise equal
    seed = 0 if phase == "save" else 123
    state = create_train_state(model, jax.random.PRNGKey(seed), batch,
                               mesh_in, lr, tx=tx)
    state = state.replace(
        params=replicate(state.params, mesh),
        batch_stats=replicate(state.batch_stats, mesh),
        opt_state=replicate(state.opt_state, mesh))
    step = make_train_step(bn_momentum_schedule(),
                           build_pyramid_in_step=False, donate=False)
    step_rng = jax.random.PRNGKey(1)

    result = {"rank": rank, "phase": phase}
    if phase == "save":
        for _ in range(2):
            state, metrics = step(state, batch, mesh_in, step_rng)
        result["loss"] = float(metrics["loss"])
        # both ranks call save; rank 0 alone writes (checkpoint.py).
        # process_index is passed explicitly because the DEFAULT backend
        # here (axon plugin) reports process_index 0 on every rank
        save_checkpoint(state, ckpt_dir, epoch=0, process_index=rank)
        # both ranks record the live state the checkpoint captured
        result["params"] = _tolist(jax.device_get(state.params))
        result["opt_state"] = _tolist(jax.device_get(
            jax.tree_util.tree_leaves(state.opt_state)))
        result["step"] = int(state.step)
    else:
        state, epoch = load_checkpoint(state, ckpt_dir)
        assert epoch == 0, epoch
        result["params"] = _tolist(jax.device_get(state.params))
        result["opt_state"] = _tolist(jax.device_get(
            jax.tree_util.tree_leaves(state.opt_state)))
        result["step"] = int(state.step)
        # one further successful step from the restored state
        state, metrics = step(state, batch, mesh_in, step_rng)
        result["loss_after_resume"] = float(metrics["loss"])
        result["step_after_resume"] = int(state.step)

    with open(out_path, "w") as f:
        json.dump(result, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
