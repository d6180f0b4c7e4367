"""Host-side data loading: infinite seeded sampler, mosaic/multiscale-aware
batch sampler, worker-process loader, and the TPU device prefetcher.

Capability parity with the yolox data plumbing the reference consumes
(SURVEY.md §2.3: ``InfiniteSampler``, ``YoloBatchSampler``, ``DataLoader``,
``worker_init_reset_seed`` — used at `/root/reference/cfgs/
s_s50_onex_dfp_tal_flip.py:95-110`). Worker processes are host-side IO
(cv2 decode of two frames per sample, `tal_flip_one_future_argoversedataset.py`),
so we build on ``torch.utils.data`` for its battle-tested worker pool — torch
never touches the device path; batches are collated to NumPy and handed to JAX
via ``parallel.shard_batch`` (which replaces the CUDA side-stream prefetcher,
`exps/train_utils/double_data_prefetcher.py:23-47`).
"""

from __future__ import annotations

import itertools
import random
import uuid
from typing import Iterator

import numpy as np
import torch
import torch.utils.data


class InfiniteSampler(torch.utils.data.Sampler):
    """Infinite shuffled index stream, seeded and shard-aware (yolox
    ``InfiniteSampler``: shuffle a permutation per epoch-sized chunk forever)."""

    def __init__(
        self,
        size: int,
        shuffle: bool = True,
        seed: int = 0,
        rank: int = 0,
        world_size: int = 1,
    ):
        self._size = size
        self._shuffle = shuffle
        self._seed = int(seed)
        self._rank = rank
        self._world_size = world_size

    def __iter__(self) -> Iterator[int]:
        yield from itertools.islice(
            self._infinite_indices(), self._rank, None, self._world_size
        )

    def _infinite_indices(self):
        g = torch.Generator()
        g.manual_seed(self._seed)
        while True:
            if self._shuffle:
                yield from torch.randperm(self._size, generator=g).tolist()
            else:
                yield from range(self._size)

    def __len__(self):
        return self._size // self._world_size


class YoloBatchSampler(torch.utils.data.BatchSampler):
    """BatchSampler that attaches the mosaic-enabled flag to every index so
    the dataset's ``__getitem__`` can switch augmentation per batch (yolox
    ``YoloBatchSampler``)."""

    def __init__(self, *args, mosaic: bool = True, **kwargs):
        super().__init__(*args, **kwargs)
        self.mosaic = mosaic

    def __iter__(self):
        for batch in super().__iter__():
            yield [(self.mosaic, idx) for idx in batch]


def worker_init_reset_seed(worker_id: int):
    """Re-seed every worker from fresh entropy (yolox
    ``worker_init_reset_seed``)."""
    seed = uuid.uuid4().int % 2**32
    random.seed(seed)
    torch.manual_seed(seed)
    np.random.seed(seed)


def _mosaic_flag_getitem(dataset, item):
    """Unpack the (mosaic_flag, index) tuples emitted by YoloBatchSampler —
    the role of yolox's ``@Dataset.mosaic_getitem`` decorator."""
    if isinstance(item, tuple):
        dataset.enable_mosaic = item[0]
        item = item[1]
    return dataset[item]


class _IndexUnpackDataset(torch.utils.data.Dataset):
    """Adapter that understands YoloBatchSampler's (flag, idx) items."""

    def __init__(self, dataset):
        self.dataset = dataset

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, item):
        return _mosaic_flag_getitem(self.dataset, item)

    def __getattr__(self, name):
        # guard: during unpickling (worker processes) __getattr__ runs before
        # __init__ populates the instance dict — avoid infinite recursion
        if name == "dataset":
            raise AttributeError(name)
        return getattr(self.dataset, name)


def _numpy_collate(batch):
    """Stack samples to NumPy arrays; tuples of targets stay tuples of
    stacked arrays (the reference's double-target collate)."""
    elem = batch[0]
    if isinstance(elem, np.ndarray):
        return np.stack(batch, 0)
    if isinstance(elem, tuple):
        return tuple(_numpy_collate([b[i] for b in batch]) for i in range(len(elem)))
    if isinstance(elem, (int, float)):
        return np.asarray(batch)
    return batch


class DataLoader(torch.utils.data.DataLoader):
    """Thin wrapper fixing collate to NumPy and the (flag, idx) adapter."""

    def __init__(self, dataset, **kwargs):
        kwargs.setdefault("collate_fn", _numpy_collate)
        # TPU input: no pinned CUDA memory involved.
        kwargs.pop("pin_memory", None)
        super().__init__(_IndexUnpackDataset(dataset), pin_memory=False, **kwargs)


class DevicePrefetcher:
    """Overlap host batch preparation with device compute by keeping one
    sharded batch in flight (the TPU analogue of the reference's CUDA
    side-stream ``DataPrefetcher``, `exps/train_utils/
    double_data_prefetcher.py:23-47`).

    The preload — pulling the next collated batch from the (worker-backed)
    loader and issuing its async ``device_put`` — runs on a background
    thread, so it happens *while the caller's dispatched device step is in
    flight* rather than inside ``next()``. cv2/NumPy collate and the JAX
    transfer all release the GIL, so the thread makes real progress even on
    a busy host; ``next()`` just joins the thread and kicks the next one.
    """

    def __init__(self, loader, mesh=None):
        import threading

        from streamyolo_tpu.parallel import shard_batch

        # Re-entrant: the Trainer restarts an exhausted prefetcher by calling
        # __init__ again. Join any in-flight preload FIRST — otherwise the old
        # thread can observe the fresh self._it and race the new preload on a
        # (non-thread-safe) DataLoader iterator, or clobber self._result.
        prior = getattr(self, "_thread", None)
        if prior is not None:
            prior.join()

        self._mesh = mesh
        self._shard = (lambda b: shard_batch(b, mesh)) if mesh is not None else (
            lambda b: b
        )
        self._it = iter(loader)
        self._threading = threading
        self._thread = None
        self._result = None
        self._error = None
        self._kick()

    def _to_batch(self, raw):
        images, targets = raw[0], raw[1]
        if isinstance(targets, tuple):
            batch = {
                "images": images,
                "labels": targets[0],
                "support_labels": targets[1],
            }
        else:
            batch = {"images": images, "labels": targets}
        return self._shard(batch)

    def _preload(self):
        try:
            self._result = self._to_batch(next(self._it))
        except StopIteration:
            self._result = None
        except BaseException as e:  # re-raised on the caller's thread
            self._error = e
            self._result = None

    def _kick(self):
        self._thread = self._threading.Thread(target=self._preload, daemon=True)
        self._thread.start()

    def next(self):
        if self._thread is None:  # exhausted (or errored) and not restarted
            return None
        self._thread.join()
        self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err
        batch, self._result = self._result, None
        if batch is not None:  # never kick a dead iterator
            self._kick()
        return batch

    def close(self):
        """Wait out the in-flight preload (so callers can tear down the
        underlying dataset/files without the thread racing a read)."""
        if self._thread is not None:
            self._thread.join()
            self._error = None


class ShardDataset(torch.utils.data.Dataset):
    """Strided shard of a dataset for multi-host eval (the role of
    ``DistributedSampler(shuffle=False)`` at `/root/reference/cfgs/
    s_s50_onex_dfp_tal_flip.py:126-128`): process r sees indices
    r, r+world, r+2*world, ... Attribute access forwards to the base dataset
    (the evaluators read ``coco`` / ``class_ids`` through it)."""

    def __init__(self, dataset, rank: int, world_size: int):
        self.dataset = dataset
        self._rank = rank
        self._world = world_size

    def __len__(self):
        n = len(self.dataset)
        return (n - self._rank + self._world - 1) // self._world

    def __getitem__(self, idx):
        return self.dataset[self._rank + idx * self._world]

    def __getattr__(self, name):
        if name == "dataset":  # see _IndexUnpackDataset.__getattr__
            raise AttributeError(name)
        return getattr(self.dataset, name)
