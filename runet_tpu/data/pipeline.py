"""Host-side async prefetch feeding the device (SURVEY.md §2.2 table:
"torch DataLoader worker pool" → "host-side async prefetch").

A background thread draws patch batches with numpy while the device computes;
batches are queued and transferred with ``jax.device_put`` (optionally with a
``NamedSharding`` so each data-parallel device receives only its shard).
"""

from __future__ import annotations

import queue
import threading
from collections.abc import Iterator

import jax
import numpy as np

from runet_tpu.data.dataset import PreparedCase
from runet_tpu.data.sampler import sample_batch


class PatchLoader:
    """Infinite iterator of device-resident (images, labels) batches."""

    def __init__(
        self,
        cases: list[PreparedCase],
        batch_size: int,
        patch_size: tuple[int, int, int],
        fg_prob: float = 0.5,
        seed: int = 0,
        prefetch: int = 2,
        sharding=None,
        compact_transfer: bool = True,
        put_fn=None,
        stack_steps: int = 1,
    ):
        self.cases = cases
        self.batch_size = batch_size
        self.patch_size = patch_size
        self.fg_prob = fg_prob
        self.sharding = sharding
        # Host→device transfer runs on the PREFETCH thread (put_fn, or
        # device_put with `sharding`): a consumer-side device_put blocks the
        # main thread ~10 ms/step through the tunnel before it can dispatch
        # the step (measured 189.6 vs 180.1 ms/step at 128³ b1 compact) —
        # issuing it from the worker overlaps the transfer with the previous
        # step's compute. put_fn, when given, maps the HOST batch tree to
        # device arrays on the worker thread (e.g. comm.shard_batch for a
        # data-parallel mesh).
        self.put_fn = put_fn
        # stack_steps > 1: each queue item is a (K, B, ...) superbatch of K
        # consecutive micro-batches, consumed by the multi-step-per-dispatch
        # train path (train/state.py make_multi_train_step). The caller's
        # put_fn must shard axis 1 in that case (comm.shard_batch
        # batch_axis=1).
        self.stack_steps = stack_steps
        # Halve+ host→device bytes per step: z-scored HU patches are exact
        # enough in f16 (the model computes in bf16 anyway) and labels fit
        # uint8; the jitted step upcasts on device (train/state.py). At 128³
        # batch 1 this is 16 MB → 6 MB per step through the tunnel.
        self.compact_transfer = compact_transfer
        self._rng = np.random.default_rng(seed)
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._exc: BaseException | None = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    # Queue sentinel marking a dead worker: without it a worker exception
    # (bad case file, device_put failure on a dropped tunnel, ...) would
    # kill the thread silently and the consumer would block in __next__
    # forever. The consumer re-raises instead.
    _SENTINEL = object()

    def _worker(self):
        try:
            self._worker_loop()
        except BaseException as e:  # propagate to the consumer thread
            self._exc = e
            self._put(self._SENTINEL)

    def _put(self, item) -> None:
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.1)
                return
            except queue.Full:
                continue

    def _worker_loop(self):
        image_dtype = np.float16 if self.compact_transfer else np.float32
        label_dtype = np.uint8 if self.compact_transfer else np.int32
        while not self._stop.is_set():
            # Dtype conversion happens inside the sampler's single-copy
            # write — no separate astype pass on the 1-core host.
            if self.stack_steps > 1:
                parts = [
                    sample_batch(
                        self._rng, self.cases, self.batch_size,
                        self.patch_size, self.fg_prob,
                        image_dtype=image_dtype, label_dtype=label_dtype,
                    )
                    for _ in range(self.stack_steps)
                ]
                batch = tuple(
                    np.stack([p[j] for p in parts]) for j in range(len(parts[0]))
                )
            else:
                batch = sample_batch(
                    self._rng, self.cases, self.batch_size, self.patch_size,
                    self.fg_prob, image_dtype=image_dtype, label_dtype=label_dtype,
                )
            if self.put_fn is not None:
                batch = self.put_fn(batch)
            elif self.sharding is not None:
                batch = tuple(jax.device_put(x, self.sharding) for x in batch)
            else:
                batch = tuple(jax.device_put(x) for x in batch)
            self._put(batch)

    def __iter__(self) -> Iterator:
        return self

    def __next__(self):
        # Batches arrive already device-resident (worker-thread put).
        # Bounded waits + a liveness check: once the single sentinel has
        # been consumed (or close() drained it), a dead worker leaves the
        # queue empty forever — a plain q.get() would hang the consumer
        # with no diagnosis.
        while True:
            try:
                item = self._q.get(timeout=1.0)
            except queue.Empty:
                if self._exc is not None or not self._thread.is_alive():
                    raise RuntimeError(
                        "PatchLoader worker thread is dead"
                    ) from self._exc
                continue
            if item is self._SENTINEL:
                self._exc = self._exc or RuntimeError("worker stopped")
                raise RuntimeError(
                    "PatchLoader worker thread failed"
                ) from self._exc
            return item

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=2.0)
