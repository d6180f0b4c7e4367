"""Device-mesh / sharding utilities (TPU-native data parallelism).

The reference's ONLY parallelism strategy is data-parallel DDP over NCCL
(`/root/reference/tools/train.py:129-141`, `exps/train_utils/double_trainer.py:171`
— SURVEY.md §2.4). The TPU-native equivalent is SPMD: one process per host,
a 1-D ``Mesh(('data',))`` over all chips, the batch sharded on axis 0 via
``NamedSharding``, and the gradient all-reduce inserted by the XLA GSPMD
partitioner inside the jitted train step — no user-visible backend knob.

BatchNorm under this scheme reduces over the *global* batch (XLA turns the
batch-axis mean into a cross-replica collective), which subsumes the
reference's pre-eval ``all_reduce_norm`` BN-stat sync (`double_trainer.py:225`).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None, axis: str = DATA_AXIS
) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard axis 0 (batch) across the data mesh axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = DATA_AXIS) -> Any:
    """Place a host pytree onto the mesh with axis-0 sharding per leaf.

    Replaces the reference's ``DataPrefetcher`` H2D side-stream copy
    (`exps/train_utils/double_data_prefetcher.py:23-47`): ``jax.device_put``
    with a sharding is itself asynchronous, so the host thread returns
    immediately and the transfer overlaps the previous step's compute.

    Multi-host: each process passes its LOCAL shard (its slice of the global
    batch, from the rank-aware sampler) and the leaves are assembled into
    global arrays spanning the whole mesh.
    """
    sharding = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sharding, x), batch
        )
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


__all__ = [
    "DATA_AXIS",
    "Mesh",
    "NamedSharding",
    "P",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
]

from streamyolo_tpu.parallel.spatial import (
    SPATIAL_AXIS,
    make_spatial_mesh,
    row_sharding,
)

__all__ += ["SPATIAL_AXIS", "make_spatial_mesh", "row_sharding"]

from streamyolo_tpu.parallel.multihost import (
    all_gather_objects,
    get_rank,
    get_world_size,
    is_main_process,
    psum_stats,
    synchronize,
)

__all__ += [
    "all_gather_objects",
    "get_rank",
    "get_world_size",
    "is_main_process",
    "psum_stats",
    "synchronize",
]
