"""Dataset base + torch-free data loader with threaded prefetch.

The reference uses torch ``DataLoader`` + ``DistributedSampler`` with one
loader per DDP rank (data/base.py:11-26). Under single-controller JAX there
is one host process feeding the whole mesh, so the loader here produces
*global* batches (numpy, NHWC) that the trainer shards over the data axis
with ``jax.device_put``. Decoding runs in a thread pool (PIL/cv2/numpy
release the GIL) with a bounded prefetch queue so host IO overlaps TPU steps.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Iterator, List, Optional, Sequence

import numpy as np


class Dataset:
    """Minimal dataset protocol: __len__ + __getitem__ -> dict of numpy."""

    def __init__(self, opt, split: str = "train"):
        self.opt = opt
        self.split = split
        self._epoch = 0

    def set_epoch(self, epoch: int):
        """Current epoch for per-sample randomness (fed by DataLoader.set_epoch)."""
        self._epoch = epoch

    def __len__(self):  # pragma: no cover - abstract
        raise NotImplementedError

    def __getitem__(self, idx):  # pragma: no cover - abstract
        raise NotImplementedError

    def setup_loader(self, opt, shuffle=False, drop_last=False, batch_size=None):
        # multi-host: each process loads its slice of every global batch (the
        # reference's DistributedSampler role, data/base.py:11-26); detected
        # from the initialized jax.distributed state
        process_index, process_count = 0, 1
        try:
            import jax

            process_index, process_count = jax.process_index(), jax.process_count()
        except Exception:
            pass
        return DataLoader(
            self,
            batch_size=batch_size or opt.batch_size,
            shuffle=shuffle,
            drop_last=drop_last,
            num_workers=opt.data.get("num_workers", 4),
            seed=opt.get("seed", 0) or 0,
            process_index=process_index,
            process_count=process_count,
        )


def default_collate(samples: Sequence[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack leaf arrays; nested dicts recurse; scalars become [B] arrays."""
    out: Dict[str, Any] = {}
    first = samples[0]
    for key, val in first.items():
        vals = [s[key] for s in samples]
        if isinstance(val, dict):
            out[key] = default_collate(vals)
        elif isinstance(val, str):
            out[key] = list(vals)
        else:
            out[key] = np.stack([np.asarray(v) for v in vals], axis=0)
    return out


class DataLoader:
    """Epoch-based loader: shuffle -> batch -> threaded decode -> prefetch."""

    def __init__(
        self,
        dataset: Dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 4,
        seed: int = 0,
        prefetch: int = 2,
        collate=default_collate,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.prefetch = prefetch
        self.collate = collate
        self.process_index = process_index
        self.process_count = process_count
        if process_count > 1 and batch_size % process_count != 0:
            raise ValueError(
                f"global batch_size {batch_size} must divide evenly over "
                f"{process_count} processes"
            )
        self._epoch = 0

    def set_epoch(self, epoch: int):
        """Reshuffle deterministically per epoch (DistributedSampler.set_epoch).

        Propagated to the dataset so per-sample randomness (e.g. the SDF
        subsample draw) can key on the epoch instead of in-process state —
        a --resume'd run then continues the per-epoch progression instead of
        replaying epoch-0 draws."""
        self._epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def _batch_indices(self) -> List[np.ndarray]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed * 100003 + self._epoch)
            rng.shuffle(order)
        batches = []
        for start in range(0, n, self.batch_size):
            idx = order[start : start + self.batch_size]
            if len(idx) < self.batch_size and self.drop_last:
                continue
            if self.process_count > 1:
                if len(idx) < self.batch_size:
                    # pad an uneven tail batch with repeats of its last row up
                    # to the FULL global batch so every process holds an
                    # equal, full-size slice. Padding to the full batch (not
                    # just a process_count multiple) keeps the valid samples
                    # a contiguous global prefix — the engines then exclude
                    # every padded row from metrics by count alone, instead
                    # of averaging duplicated tail samples into the results
                    # (torch DistributedSampler duplicates them; the
                    # reference corrects with an aux remainder loader,
                    # shape_engine.py:57-62,436-461)
                    idx = np.concatenate(
                        [idx, np.repeat(idx[-1], self.batch_size - len(idx))]
                    )
                # contiguous per-process slice of the global batch: process p
                # holds rows [p*local, (p+1)*local), matching the process-
                # order concatenation jax.make_array_from_process_local_data
                # assumes for the sharded leading axis
                local = len(idx) // self.process_count
                lo = self.process_index * local
                idx = idx[lo : lo + local]
            batches.append(idx)
        return batches

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        batches = self._batch_indices()
        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def load_batch(idx):
            samples = list(pool.map(self.dataset.__getitem__, idx.tolist()))
            return self.collate(samples)

        def put_or_stop(item):
            # bounded put that aborts when the consumer abandons the iterator
            # (otherwise the producer blocks on a full queue forever and leaks
            # its threads)
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for idx in batches:
                    if stop.is_set():
                        break
                    if not put_or_stop(load_batch(idx)):
                        return
            except Exception as e:  # surface worker errors to the consumer
                put_or_stop(e)
            finally:
                put_or_stop(None)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
            pool.shutdown(wait=False)
