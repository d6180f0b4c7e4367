"""Latency-oriented spatial sharding of the streaming step.

The reference's only scale-out axis is throughput: more NCCL DDP replicas
process more independent streams (`/root/reference/tools/train.py:129-141`),
but a single stream's per-frame latency is pinned to one GPU. A TPU pod
slice offers an axis the reference cannot express: slice ONE frame's rows
across chips over ICI. Annotating the NHWC image (and the carried DFP
buffer) with an H-axis ``NamedSharding`` is sufficient — the XLA GSPMD
partitioner turns every convolution into a local conv plus a halo exchange
(a ``CollectivePermute`` of the kernel-radius boundary rows between H-mesh
neighbors, riding ICI), keeps BatchNorm-eval's per-channel affine fully
local, and gathers once at the per-anchor decode/NMS tail, whose cost is
negligible next to the backbone.

This is work division, not approximation: each output element still reduces
over exactly its receptive field, so the sharded step is numerically
identical to the single-chip step (asserted on the virtual CPU mesh in
``tests/test_stream_detector.py``). Use it when one stream must run faster
than one chip allows; use independent per-chip streams (the
``bench_suite.py`` multi-stream row) when aggregate throughput is the goal.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SPATIAL_AXIS = "spatial"


def make_spatial_mesh(
    devices: Optional[Sequence[jax.Device]] = None, axis: str = SPATIAL_AXIS
) -> Mesh:
    """1-D mesh over which one frame's rows are sliced."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def row_sharding(mesh: Mesh, axis: str = SPATIAL_AXIS) -> NamedSharding:
    """Shard axis 1 — H of an NHWC image / feature map — across the mesh.

    The same spec serves every carried feature map: XLA pads uneven
    H // n_devices splits internally, so no shape divisibility is required
    of the model's pyramid levels.
    """
    return NamedSharding(mesh, P(None, axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


__all__ = [
    "SPATIAL_AXIS",
    "make_spatial_mesh",
    "row_sharding",
    "replicated",
]
