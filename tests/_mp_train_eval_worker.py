"""Worker for the 2-process REAL `cli train --eval-every` smoke
(test_multiprocess.py, VERDICT r4 item 7).

Each process joins jax.distributed (2 virtual CPU devices each, gloo),
then calls the ACTUAL cli.train on the miniature BOP tree with
--eval-every 1.  What this proves that no single-process test can:

  * cli's rank/world plumbing uses `_process_rank_world` (the backend
    that actually reports the topology), so the two ranks shard the
    loader and only rank 0 writes the checkpoint/metrics (the ADVICE
    r4 race: a topology-hiding default backend made every rank take
    the rank-0 write path);
  * `--eval-every` under multihost runs the validation loop on rank
    0's LOCAL mesh devices (no cross-host collectives) and logs a
    val_add_auc record — round-4 silently skipped it.

The global mesh is 4 devices; the GeoMatch train step's BN-sync
all-gathers become real cross-process gloo collectives.

Usage: python _mp_train_eval_worker.py <pid> <nproc> <port> <out.json>
       <data_root> <ckpt_root>
"""

import json
import os
import sys


def main():
    pid, nproc, port, out_path, data_root, ckpt_root = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
        sys.argv[5], sys.argv[6])
    # 2 local devices + the raised collective-rendezvous timeout the
    # dryrun needs for collective-heavy programs time-sliced on one core
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=2 "
        "--xla_cpu_collective_timeout_seconds=3000")

    import jax

    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(f"localhost:{port}", nproc, pid)
    local_cpu = [d for d in jax.devices("cpu")
                 if d.process_index == jax.process_index("cpu")][0]
    jax.config.update("jax_default_device", local_cpu)
    print("W: distributed up", flush=True)

    # prime the gloo context for the 4-device clique NOW, while the two
    # ranks are still in lockstep: gloo context initialisation has a
    # hard 30 s KV-store rendezvous window, and the first TRAIN-STEP
    # collective would otherwise open it minutes apart (each rank
    # compiles the full train step on the one shared core).  A tiny
    # all-gather creates/caches the clique context up front.
    from gdm_tpu.parallel import all_gather_host

    cpus = sorted(jax.devices("cpu"),
                  key=lambda d: (d.process_index, d.id))
    all_gather_host({"prime": pid}, devices=cpus)
    print("W: gloo primed", flush=True)

    # the mini preset the single-process CLI tests use (64^2 crops,
    # 128-vertex mesh) — patched into the registry like test_cli does
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import test_data
    from gdm_tpu.configs import base as cfg_base

    cfg_base._PRESETS["lmo"] = test_data._mini_config()
    # test_data imports conftest, which re-pins jax_default_device to
    # jax.devices("cpu")[0] — PROCESS 0's device.  On rank 1 that pin
    # is non-addressable and every jnp.asarray would produce arrays
    # this process cannot read (the bug this comment marks the grave
    # of).  Re-pin to OUR local device.
    jax.config.update("jax_default_device", local_cpu)

    from gdm_tpu import cli

    rank = jax.process_index("cpu")
    # NOT --multihost (jax.distributed is already initialized here);
    # train() discovers rank/world via _process_rank_world
    cli.main([
        "train", "--dataset", "lmo", "--data-root", data_root,
        "--ckpt-root", ckpt_root, "--cls-id", "1", "--epochs", "1",
        "--batch-size", "4", "--num-workers", "2", "--knn-chunk", "64",
        "--eval-every", "1",
    ])
    print("W: train done", flush=True)

    import os.path as osp

    with open(out_path, "w") as f:
        json.dump({
            "rank": rank,
            "world": jax.process_count("cpu"),
            "ckpt_latest": osp.exists(
                osp.join(ckpt_root, "checkpoints", "ape", "latest")),
            "metrics_file": osp.exists(
                osp.join(ckpt_root, "metrics", "ape.jsonl")),
        }, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
