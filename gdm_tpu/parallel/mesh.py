"""Device mesh + sharding utilities."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def default_devices():
    """Devices of the platform computation actually lands on.

    `jax.devices()` returns the DEFAULT backend, which in this
    environment can be a pre-registered TPU even when the process pinned
    computation elsewhere via `jax_default_device` (tests pin the
    8-virtual-device CPU platform).  Committing inputs to jax.devices()
    would silently drag such a run onto the TPU — honour the pin.
    """
    dd = jax.config.jax_default_device
    if dd is None:
        return jax.devices()
    platform = dd if isinstance(dd, str) else dd.platform
    return jax.devices(platform)


def make_mesh(devices=None, axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over the given (or all default) devices."""
    devices = default_devices() if devices is None else devices
    return Mesh(np.array(devices), (axis,))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place every array of a batch dict with its leading axis sharded.

    Replaces the reference's DistributedSampler + per-rank H2D copies
    (train_lm.py:399-403,158-176).  Single process: one device_put
    distributes the batch across the local mesh.  Multi-process: each
    process passes its LOCAL rows (global_batch / process_count — what
    its rank/world-sharded loader produced) and the global array is
    assembled without any host decoding more samples than it
    contributes.
    """
    sh = data_sharding(mesh, axis)
    nproc = len({d.process_index for d in mesh.devices.flat})
    if nproc == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sh), batch)

    # built from single-device shards rather than
    # make_array_from_process_local_data, which consults the DEFAULT
    # backend's process count and breaks when the mesh lives on another
    # backend (e.g. the multi-process CPU rehearsal under a TPU default)
    devs = list(mesh.devices.flat)
    me = jax.process_index(devs[0].platform)
    local_pos = [k for k, d in enumerate(devs) if d.process_index == me]

    def put(x):
        if hasattr(x, "is_fully_addressable") and not x.is_fully_addressable:
            # e.g. a jnp.asarray made under a jax_default_device pin
            # that points at ANOTHER process's device (a conftest pin
            # leaking into a jax.distributed worker) — np.asarray would
            # die with an opaque fetch error
            raise ValueError(
                "shard_batch (multi-process): got a jax.Array with "
                f"non-addressable shards ({x.sharding}); pass this "
                "process's LOCAL rows (numpy or locally-pinned arrays)")
        x = np.asarray(x)
        gshape = (x.shape[0] * nproc,) + x.shape[1:]
        rpd = gshape[0] // len(devs)   # rows per device
        # NamedSharding P(axis) over a 1-D mesh: device at mesh position
        # k owns global rows [k*rpd, (k+1)*rpd); this process's local
        # chunk fills its devices' row ranges in mesh order
        arrs = [jax.device_put(x[i * rpd:(i + 1) * rpd], devs[k])
                for i, k in enumerate(local_pos)]
        return jax.make_array_from_single_device_arrays(gshape, sh, arrs)

    return jax.tree_util.tree_map(put, batch)


def local_rows(arr) -> np.ndarray:
    """This process's rows of a batch-sharded global array, as numpy.

    Multi-host eval companion of shard_batch: jax.device_get of a global
    array whose shards live on other hosts raises; each host fetches the
    rows it contributed (its loader's samples) and books predictions for
    those only — the gather merges them (all_gather_host).
    """
    if not hasattr(arr, "addressable_shards"):
        return np.asarray(arr)
    shards = sorted(arr.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    if len(shards) == len(arr.sharding.device_set):
        return np.asarray(arr)          # fully local
    # the caller books per-row predictions against its loader's sample
    # order — that mapping only holds if the local shards cover disjoint
    # row ranges.  A replicated array (e.g. GSPMD propagated away the
    # batch sharding) would silently duplicate every row otherwise.
    starts = [s.index[0].start or 0 for s in shards]
    if len(set(starts)) != len(starts):
        raise ValueError(
            "local_rows: array is not batch-sharded across processes "
            f"(duplicate shard row-starts {starts}); pin the output "
            "sharding to PartitionSpec('data') before fetching")
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


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
