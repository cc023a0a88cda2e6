"""Parallelism helpers: device mesh, shardings, multi-host aggregation.

Reference distributed layer: torch DDP/NCCL (train_lm.py:385-388,436-439),
DistributedSampler, SyncBatchNorm, detectron2 comm all_gather
(utils/my_comm.py).  TPU-native equivalent (SURVEY.md section 2d): a 1-D
`data` mesh with NamedSharding — XLA inserts the psum for gradients and
global batch-norm moments; no hand-written communication layer exists
because the sharding annotations *are* the comm layer.
"""

from gdm_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    data_sharding,
    replicated_sharding,
    all_gather_host,
    local_rows,
)
from gdm_tpu.parallel.sp import (
    make_mesh_2d,
    sharded_cosine_argmax,
    sharded_matching_loss,
)
