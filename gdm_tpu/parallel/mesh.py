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


def all_gather_host(obj):
    """Gather a python object from all hosts (evaluator aggregation).

    Single-host: identity list.  Multi-host: via
    jax.experimental.multihost_utils (the TPU replacement for the
    pickled NCCL all_gather at utils/my_comm.py:57-103).
    """
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    import pickle

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    # pad to a common max length across hosts
    n = np.array([len(payload)], np.int32)
    all_n = multihost_utils.process_allgather(n)
    max_n = int(all_n.max())
    padded = np.zeros((max_n,), np.uint8)
    padded[: len(payload)] = payload
    gathered = multihost_utils.process_allgather(padded)
    lengths = all_n.reshape(-1)
    return [pickle.loads(gathered[i, : int(lengths[i])].tobytes())
            for i in range(gathered.shape[0])]
