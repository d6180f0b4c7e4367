"""Multi-host helpers: rank topology, barrier, cross-process object gather.

The TPU-native replacement for the torch.distributed surface the reference
consumes (``get_rank`` / ``get_world_size`` / ``is_main_process`` /
``synchronize`` / object ``gather`` — SURVEY.md §2.3): one JAX process per
host, topology from ``jax.process_index/process_count``, collectives via
``jax.experimental.multihost_utils``. Everything degrades to the trivial
single-process behavior when ``process_count() == 1`` (the common case here),
so the same evaluator code runs on a laptop, one chip, or a pod slice.
"""

from __future__ import annotations

import pickle
from typing import Any, List

import numpy as np


def get_rank() -> int:
    import jax

    return jax.process_index()


def get_world_size() -> int:
    import jax

    return jax.process_count()


def is_main_process() -> bool:
    return get_rank() == 0


def synchronize() -> None:
    """Cross-host barrier (no-op single-process)."""
    import jax

    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("streamyolo_barrier")


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather an arbitrary picklable object from every process (the
    ``yolox.utils.gather`` role used by the evaluators,
    `/root/reference/exps/evaluators/onex_stream_evaluator.py:158-161` —
    except all-gather instead of gather-to-0, which is what SPMD wants).

    Implementation: pickle -> pad to the global max length -> one
    ``process_allgather`` of uint8 buffers over DCN."""
    import jax

    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), np.uint8)
    length = np.asarray([len(payload)], np.int64)
    max_len = int(multihost_utils.process_allgather(length).max())
    padded = np.zeros(max_len, np.uint8)
    padded[: len(payload)] = payload
    all_payloads = multihost_utils.process_allgather(padded)
    all_lengths = multihost_utils.process_allgather(length).reshape(-1)
    return [
        pickle.loads(all_payloads[i, : int(all_lengths[i])].tobytes())
        for i in range(all_payloads.shape[0])
    ]


def psum_stats(values: np.ndarray) -> np.ndarray:
    """Sum small stat vectors across processes (timing meters etc.)."""
    import jax

    if jax.process_count() == 1:
        return np.asarray(values)
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.asarray(values))
    return np.asarray(gathered).sum(axis=0)
