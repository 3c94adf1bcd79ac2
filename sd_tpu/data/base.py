"""Data layer base: the dict-of-named-arrays batch contract + loader.

The framework-wide data contract (SURVEY.md §1 L6, ``ddpm.py:329-335``):
datasets yield dicts of HWC float32 images in [-1, 1] under string keys
("image", "caption", "class_label", "LR_image", "segmentation", ...).

Host loading is NumPy-native: :class:`DataLoader` does shuffling, batching,
and background thread prefetch (the reference's torch DataLoader +
``parallel_data_prefetch``, ``ldm/util.py:108-203``); iterable datasets are
sharded per worker/host like ``main.worker_init_fn`` (``main.py:146-159``).
"""

from __future__ import annotations

import abc
import queue
import threading
from typing import Any, Dict, Iterator, List, Optional, Sequence

import numpy as np

__all__ = ["Dataset", "Txt2ImgIterableBaseDataset", "DataLoader", "collate"]


class Dataset(abc.ABC):
    """Map-style dataset."""

    @abc.abstractmethod
    def __len__(self) -> int: ...

    @abc.abstractmethod
    def __getitem__(self, i: int) -> Dict[str, Any]: ...


class Txt2ImgIterableBaseDataset(abc.ABC):
    """Web-scale iterable text-image stream interface.

    Ref: ``ldm/data/base.py:5-23`` — exposes ``num_records`` and per-shard
    ``valid_ids``; :meth:`shard` restricts to a worker's slice the way
    ``main.worker_init_fn`` splits ids across workers.
    """

    def __init__(self, num_records: int = 0, valid_ids: Optional[Sequence[int]] = None,
                 size: int = 256):
        self.num_records = num_records
        self.valid_ids = list(valid_ids) if valid_ids is not None else list(range(num_records))
        self.sample_ids = self.valid_ids
        self.size = size
        print(f"{self.__class__.__name__} dataset contains {self.__len__()} examples.")

    def __len__(self) -> int:
        return self.num_records

    def shard(self, worker_id: int, num_workers: int) -> "Txt2ImgIterableBaseDataset":
        split = np.array_split(np.asarray(self.valid_ids), num_workers)
        self.sample_ids = split[worker_id].tolist()
        return self

    @abc.abstractmethod
    def __iter__(self) -> Iterator[Dict[str, Any]]: ...


def collate(samples: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack a list of sample dicts into a batch dict (arrays stacked,
    strings/objects listed)."""
    out: Dict[str, Any] = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], (np.ndarray, np.generic, float, int, bool)):
            out[key] = np.stack([np.asarray(v) for v in vals])
        else:
            out[key] = vals
    return out


class DataLoader:
    """Batching iterator with shuffle + background prefetch."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = True, seed: int = 0,
                 prefetch: int = 2, num_shards: int = 1, shard_index: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset) // self.num_shards
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _index_iter(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(idx)
        # per-host contiguous sharding (multi-process data parallelism)
        idx = idx[self.shard_index::self.num_shards]
        return idx

    def __iter__(self):
        if isinstance(self.dataset, Txt2ImgIterableBaseDataset):
            yield from self._iter_iterable()
            return
        idx = self._index_iter()
        nb = len(idx) // self.batch_size if self.drop_last else -(-len(idx) // self.batch_size)

        def produce(q):
            for b in range(nb):
                sel = idx[b * self.batch_size:(b + 1) * self.batch_size]
                q.put(collate([self.dataset[int(i)] for i in sel]))
            q.put(None)

        if self.prefetch > 0:
            q: queue.Queue = queue.Queue(maxsize=self.prefetch)
            t = threading.Thread(target=produce, args=(q,), daemon=True)
            t.start()
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        else:
            for b in range(nb):
                sel = idx[b * self.batch_size:(b + 1) * self.batch_size]
                yield collate([self.dataset[int(i)] for i in sel])
        self.epoch += 1

    def _iter_iterable(self):
        self.dataset.shard(self.shard_index, self.num_shards)
        buf = []
        for sample in self.dataset:
            buf.append(sample)
            if len(buf) == self.batch_size:
                yield collate(buf)
                buf = []
        if buf and not self.drop_last:
            yield collate(buf)
