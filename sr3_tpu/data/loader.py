"""Host data pipeline: shuffling, batching, background prefetch.

Replaces torch DataLoader (reference data/__init__.py:7-21) with a
thread-pool loader producing stacked NHWC numpy batches ready for
``jax.device_put``. Train batches are drop_last so every step has a static
shape (one jit trace); validation is batch 1 like the reference.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def _collate(samples):
    out = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[k] = np.stack(vals, axis=0)
        else:
            out[k] = np.asarray(vals)
    return out


def _collate_native_bytes(samples, key_resolutions, min_max=(-1, 1)):
    """Fused C++ libpng decode + normalize + stack over compressed samples
    (from LRHRDataset.get_raw_bytes). None on failure."""
    from sr3_tpu.data.native import decode_collate_normalize

    flips = [s["flip"] for s in samples]
    out = {}
    for k in samples[0]:
        if k == "flip":
            continue
        vals = [s[k] for s in samples]
        if isinstance(vals[0], (bytes, bytearray)):
            h, w = key_resolutions[k]
            batch = decode_collate_normalize(
                vals, h, w, min_max[0], min_max[1], flips
            )
            if batch is None:
                return None
            out[k] = batch
        else:
            out[k] = np.asarray(vals)
    return out


def _collate_native(samples, min_max=(-1, 1)):
    """Fused C++ normalize+flip+stack over raw uint8 samples (from
    LRHRDataset.get_raw). Returns None if the native lib is unavailable."""
    from sr3_tpu.data.native import collate_normalize

    flips = [s["flip"] for s in samples]
    out = {}
    for k in samples[0]:
        if k in ("flip",):
            continue
        vals = [s[k] for s in samples]
        if isinstance(vals[0], np.ndarray) and vals[0].dtype == np.uint8:
            batch = collate_normalize(vals, min_max[0], min_max[1], flips)
            if batch is None:
                return None
            out[k] = batch
        else:
            out[k] = np.asarray(vals)
    return out


class DataLoader:
    """Iterable over batches for one pass of the dataset per iteration."""

    def __init__(self, dataset, batch_size=1, shuffle=False, num_workers=0,
                 drop_last=False, seed=0, prefetch=2, use_native=True,
                 shard_across_processes=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        # multi-host index sharding: by default only shuffled (training)
        # loaders split the epoch across processes. Val/infer loaders must
        # yield the FULL dataset on every process — the grouped evaluator
        # runs each group as one collective global batch (identical on all
        # hosts) and process 0 writes the outputs.
        self.shard_across_processes = (
            shuffle if shard_across_processes is None
            else bool(shard_across_processes)
        )
        self.num_workers = max(0, num_workers)
        self.drop_last = drop_last
        self.prefetch = prefetch
        self._rng = np.random.default_rng(seed)
        self._epoch = 0
        # native fast paths, best first:
        #   bytes  -> C++ libpng decode + normalize + stack (no PIL at all)
        #   uint8  -> PIL decode, C++ normalize + stack
        #   python -> PIL decode, numpy normalize + stack
        self.use_native = use_native and hasattr(dataset, "get_raw")
        self.use_native_decode = (
            use_native and hasattr(dataset, "get_raw_bytes")
        )
        if self.use_native or self.use_native_decode:
            from sr3_tpu.data.native import get_decode_lib, get_lib

            self.use_native = self.use_native and get_lib() is not None
            self.use_native_decode = (
                self.use_native_decode and get_decode_lib() is not None
            )

    def _mode(self):
        if self.use_native_decode:
            return "bytes"
        if self.use_native:
            return "raw"
        return "py"

    def _fetch_with(self, i, mode):
        """Fetch one sample in a FIXED mode (never mutates loader flags —
        safe to run concurrently). Returns None when the dataset can't
        serve this mode (non-png / missing key), signalling demotion."""
        if mode == "bytes":
            return self.dataset.get_raw_bytes(int(i))
        if mode == "raw":
            return self.dataset.get_raw(int(i))
        return self.dataset[int(i)]

    def _load_batch(self, batch_idx, mapfn):
        """Fetch + collate one batch. The fetch mode is decided once per
        batch and demotion re-fetches the WHOLE batch, so a batch can never
        mix compressed bytes with decoded arrays (which used to either hang
        the consumer or hand a short buffer to the C++ decode kernel)."""
        min_max = getattr(self.dataset, "min_max", (-1, 1))
        mode = self._mode()
        while True:
            samples = list(mapfn(lambda i: self._fetch_with(i, mode),
                                 batch_idx))
            if mode == "bytes":
                batch = None
                if all(s is not None for s in samples):
                    batch = _collate_native_bytes(
                        samples, self.dataset.key_resolutions, min_max
                    )
                if batch is not None:
                    return batch
                # demote for this and future batches (bad/absent png)
                self.use_native_decode = False
                mode = self._mode()
                continue
            if mode == "raw":
                batch = _collate_native(samples, min_max)
                if batch is not None:
                    return batch
                self.use_native = False
                mode = self._mode()
                continue
            return _collate(samples)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _batches(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(idx)
        # multi-host: each process reads a disjoint deterministic shard
        # (same shuffle seed everywhere -> consistent global epoch order)
        import jax

        pc, pi = jax.process_count(), jax.process_index()
        if pc > 1 and self.shard_across_processes:
            idx = idx[pi::pc]
        nb = len(idx) // self.batch_size
        if not self.drop_last and len(idx) % self.batch_size:
            nb += 1
        for b in range(nb):
            yield idx[b * self.batch_size : (b + 1) * self.batch_size]

    def __iter__(self):
        self._epoch += 1
        if self.num_workers == 0:
            for batch_idx in self._batches():
                yield self._load_batch(batch_idx, map)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            # any exception is forwarded to the consumer instead of dying
            # silently (which left the consumer blocked on q.get() forever)
            try:
                with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                    for batch_idx in self._batches():
                        if stop.is_set():
                            return
                        q.put(self._load_batch(batch_idx, pool.map))
            except BaseException as e:  # noqa: BLE001 — re-raised consumer-side
                q.put(e)
            else:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()


def create_dataloader(dataset, dataset_opt, phase):
    """Reference data/__init__.py:7-21: train uses config batch/shuffle/
    workers; val is batch 1, single worker."""
    if phase == "train":
        return DataLoader(
            dataset,
            batch_size=dataset_opt["batch_size"],
            shuffle=dataset_opt["use_shuffle"],
            num_workers=dataset_opt.get("num_workers", 0) or 0,
            drop_last=True,
        )
    if phase == "val":
        return DataLoader(dataset, batch_size=1, shuffle=False, num_workers=1)
    raise NotImplementedError(f"Dataloader [{phase}] is not found.")


def create_dataset(dataset_opt, phase):
    """Reference data/__init__.py:24-39."""
    import logging

    from sr3_tpu.data.lrhr import LRHRDataset

    mode = dataset_opt["mode"]
    dataset = LRHRDataset(
        dataroot=dataset_opt["dataroot"],
        datatype=dataset_opt["datatype"],
        l_resolution=dataset_opt["l_resolution"],
        r_resolution=dataset_opt["r_resolution"],
        split=phase,
        data_len=dataset_opt["data_len"] if dataset_opt["data_len"] is not None else -1,
        need_LR=(mode == "LRHR"),
        cache=dataset_opt.get("cache"),
    )
    logging.getLogger("base").info(
        "Dataset [%s - %s] is created.",
        dataset.__class__.__name__,
        dataset_opt["name"],
    )
    return dataset
