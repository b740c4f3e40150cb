"""Host->device input pipeline: batching, shuffling, prefetch.

Replaces the reference's torch DataLoader (train_mmwhs_noPad.py:133-137) with a
TPU-oriented design: the host thread assembles numpy batches ahead of time and
`jax.device_put`s them (optionally with a NamedSharding for data-parallel
meshes) while the device is busy with the previous step — classic
double-buffered prefetch. Augmentation does NOT happen here; it is jitted
on-device (micformer_tpu/data/transforms.py).
"""

from __future__ import annotations

import multiprocessing
import queue
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor

import jax
import numpy as np


# --- process-worker plumbing (reference inference/predict.py:35-93 uses
# mp.Process preprocessing queues; this is the pool equivalent). The dataset
# is shipped ONCE per worker via the initializer, not per task. Workers are
# forked and do numpy/IO only — they must never touch jax (the parent's
# device client does not survive a fork into a second user).
_WORKER_DS = None


def _proc_init(ds):
    global _WORKER_DS
    _WORKER_DS = ds


def _proc_fetch(i):
    return _WORKER_DS[int(i)]


def make_fetch_pool(dataset, workers: int, mode: str = "thread"):
    """Pool + fetch function for parallel dataset[i] fetches.

    mode='thread': GIL-releasing numpy/IO concurrency (default).
    mode='process': real OS processes (fork) — bypasses the GIL entirely for
    pure-Python preprocessing (e.g. the pure-Python NIfTI parser when the
    native reader is unavailable), the reference's mp.Process capability.
    Returns (pool, fetch_one) where fetch_one(i) -> future-like .result().
    """
    if mode == "process":
        ctx = multiprocessing.get_context("fork")
        pool = ProcessPoolExecutor(workers, mp_context=ctx,
                                   initializer=_proc_init, initargs=(dataset,))
        return pool, lambda i: pool.submit(_proc_fetch, i)
    pool = ThreadPoolExecutor(workers)
    return pool, lambda i: pool.submit(dataset.__getitem__, int(i))


def _stack_batch(samples, compact=True):
    """Assemble a host batch. compact=True minimizes H2D bytes (the hot-path
    design rule: the reference ships f16 images itself, MMWHS.py:386):
    images as float16, one-hot labels collapsed to uint8 class indices —
    ~10x less transfer than f32 one-hot; the train/eval steps one-hot and
    upcast ON DEVICE."""
    if compact:
        images = np.stack([np.asarray(s["image"], dtype=np.float16) for s in samples])
        labs = []
        for s in samples:
            lab = np.asarray(s["label"])
            labs.append(np.argmax(lab, axis=0).astype(np.uint8) if lab.ndim == 4 else lab.astype(np.uint8))
        labels = np.stack(labs)
    else:
        images = np.stack([np.asarray(s["image"], dtype=np.float32) for s in samples])
        labels = np.stack([np.asarray(s["label"], dtype=np.float32) for s in samples])
    meta = {
        "patient_id": [s["patient_id"] for s in samples],
        "crop_indexes": [s.get("crop_indexes") for s in samples],
    }
    return images, labels, meta


class DataLoader:
    """Minimal deterministic batching loader over an indexable dataset.

    Args mirror the reference DataLoader usage: batch_size, shuffle, drop_last
    (train_mmwhs_noPad.py:133-137). `sharding` is a jax.sharding.Sharding to
    place batches directly into their data-parallel layout; None puts the batch
    on the default device.
    """

    def __init__(
        self,
        dataset,
        batch_size=1,
        shuffle=False,
        drop_last=False,
        seed=0,
        sharding=None,
        prefetch=2,
        device_put=True,
        compact=True,
        workers=0,
        worker_mode="thread",
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.sharding = sharding
        self.prefetch = max(1, prefetch)
        self.device_put = device_put
        self.compact = compact
        # workers > 1: samples of a batch are fetched concurrently by a
        # worker pool. worker_mode='thread' (default) relies on __getitem__
        # releasing the GIL (NIfTI decompression, native resize, npy reads);
        # 'process' forks real workers (reference mp.Process parity,
        # inference/predict.py:35-93) — needed when preprocessing is
        # GIL-bound pure Python. Batch ORDER is unchanged regardless of
        # worker count: parallelism is within a batch, so runs stay
        # deterministic (grain-style determinism, TODO.md infra).
        self.workers = int(workers)
        self.worker_mode = worker_mode
        self._pool = self._fetch_one = None
        if self.workers > 1:
            self._pool, self._fetch_one = make_fetch_pool(
                dataset, self.workers, worker_mode)
        self._rng = np.random.default_rng(seed)
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def peek_shape(self):
        """[B, C, D, H, W] of a full batch (for model init without iterating)."""
        s = self.dataset[0]
        return (self.batch_size,) + tuple(np.asarray(s["image"]).shape)

    def _index_batches(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng = np.random.default_rng(self._rng.integers(0, 2**63))
            self._rng.shuffle(order)
        for i in range(0, len(order), self.batch_size):
            chunk = order[i : i + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            yield chunk

    def _fetch(self, chunk):
        if self._pool is not None:
            return [f.result() for f in [self._fetch_one(j) for j in chunk]]
        return [self.dataset[int(j)] for j in chunk]

    def _produce(self, out_q: queue.Queue):
        try:
            for chunk in self._index_batches():
                images, labels, meta = _stack_batch(self._fetch(chunk), self.compact)
                if self.device_put:
                    if self.sharding is not None:
                        images = jax.device_put(images, self.sharding)
                        labels = jax.device_put(labels, self.sharding)
                    else:
                        images = jax.device_put(images)
                        labels = jax.device_put(labels)
                out_q.put((images, labels, meta))
            out_q.put(None)
        except BaseException as e:  # surface worker errors to the consumer
            out_q.put(e)

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        t = threading.Thread(target=self._produce, args=(q,), daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
