"""Device mesh + sharding helpers (GSPMD data parallelism).

The reference's entire distributed story is single-process
``nn.DataParallel`` (``/root/reference/tools/train_rcnn.py:221-222``):
replicate the module, scatter the batch on dim 0, gather to GPU 0. The
TPU-native equivalent (SURVEY.md §2.3) is a 1-D ``data`` mesh: batch
tensors sharded on axis 0, parameters replicated, and gradient psums
inserted by the XLA partitioner — collectives ride ICI instead of CUDA P2P
copies. Multi-host extends the same mesh across DCN via
``jax.distributed.initialize`` (see ``initialize_distributed``).

Because the whole train step (backbone, NMS, target sampling, refinement)
is one jitted program with batch-leading shapes, data parallelism needs no
code changes anywhere else: every op partitions on the batch axis, and the
only cross-device traffic is the gradient/batch-stat reductions.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up. On single-host this is a no-op."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding for inputs."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Place a host batch dict onto the mesh, sharded on axis 0."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate_state(mesh: Mesh, state):
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state)
