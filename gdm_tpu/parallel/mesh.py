"""Device mesh + sharding utilities."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over the given (or all) devices."""
    devices = jax.devices() if devices is None else devices
    return Mesh(np.array(devices), (axis,))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place every array of a batch dict with its leading axis sharded.

    Replaces the reference's DistributedSampler + per-rank H2D copies
    (train_lm.py:399-403,158-176): one device_put distributes each global
    batch across the mesh.
    """
    sh = data_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params, mesh constants) across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def _allgather_rows(row: np.ndarray, devices) -> np.ndarray:
    """One row per PROCESS, replicated to every process -> [P, ...].

    Explicit-device replacement for multihost_utils.process_allgather:
    each process contributes `row` on its addressable devices of the
    given (global) device list, a replicating jit moves every shard to
    every process, and one representative row per process is returned.
    Works on any backend — including a multi-process CPU rehearsal
    (jax_cpu_collectives_implementation=gloo), which process_allgather
    cannot reach here because the default backend hides the topology.
    """
    devices = sorted(devices, key=lambda d: (d.process_index, d.id))
    platform = devices[0].platform
    mesh = Mesh(np.array(devices), ("p",))
    me = jax.process_index(platform)
    local = [d for d in devices if d.process_index == me]
    row = np.asarray(row)[None]
    arrs = [jax.device_put(row, d) for d in local]
    garr = jax.make_array_from_single_device_arrays(
        (len(devices),) + row.shape[1:], NamedSharding(mesh, P("p")),
        arrs)
    rep = jax.jit(lambda a: a,
                  out_shardings=NamedSharding(mesh, P()))(garr)
    full = np.asarray(jax.device_get(rep))           # [n_devices, ...]
    first = {}
    for i, d in enumerate(devices):
        first.setdefault(d.process_index, i)
    return np.stack([full[first[p]] for p in sorted(first)])


def all_gather_host(obj, devices=None):
    """Gather a python object from all hosts (evaluator aggregation).

    Single-host: identity list.  Multi-host: pickled bytes are padded to
    the max length and allgathered over the device mesh — the TPU
    replacement for the pickled NCCL all_gather at utils/my_comm.py:
    57-103.  `devices` defaults to jax.devices(); tests pass the global
    CPU device list of a 2-process rehearsal.
    """
    import pickle

    devices = list(jax.devices() if devices is None else devices)
    if len({d.process_index for d in devices}) == 1:
        return [obj]
    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    # lengths first, then pad to the common max across hosts
    all_n = _allgather_rows(np.array([len(payload)], np.int32), devices)
    max_n = int(all_n.max())
    padded = np.zeros((max_n,), np.uint8)
    padded[: len(payload)] = payload
    gathered = _allgather_rows(padded, devices)
    return [pickle.loads(gathered[i, : int(all_n[i, 0])].tobytes())
            for i in range(gathered.shape[0])]
