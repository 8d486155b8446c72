"""Pipelined stream executor: overlap host IO with device codec work.

The reference's video loop is strictly sequential -- load, encode, write,
repeat (old/src/main_video_t3v.cpp:16-40).  On TPU the encode dispatch is
asynchronous, so a production encoder should have three things in flight
at once: the host decoding source frame i+1, the device encoding frame i,
and the host serializing frame i-1.  This module provides that shape with
plain threads and bounded queues (the GIL is released inside PIL/numpy/
jax transfers, which is where the time goes):

    loader thread   : source -> RAW words, H2D staged   (queue depth = prefetch)
    caller thread   : async device dispatch per frame    (never blocks on D2H)
    writer thread   : D2H + sink.write, in frame order   (queue depth = prefetch)

Backpressure is the queue bound: at most `prefetch` frames of device
output are in flight, so HBM use stays O(prefetch) regardless of video
length.  Errors on any stage cancel the pipeline and re-raise in run().

Used by cli/main_video_t3v (--pipelined); tested with synthetic sources
and a fake sink in tests/test_executor.py.
"""
from __future__ import annotations

import queue
import threading
from dataclasses import dataclass, field
from typing import Any, Callable, Iterable, Optional

from . import tracing

_SENTINEL = object()


@dataclass
class ExecutorStats:
    frames: int = 0
    load_s: float = 0.0
    dispatch_s: float = 0.0
    write_s: float = 0.0
    errors: list = field(default_factory=list)


class StreamExecutor:
    """Run load -> device_fn -> write over a frame stream, pipelined.

    load(item) -> x           host work (file decode, quantize, H2D stage)
    device_fn(x) -> y         must be ASYNC-dispatching (a jitted fn); the
                              executor never forces y on the caller thread
    write(index, y) -> None   host work (D2H np.asarray, container write);
                              called in frame order from the writer thread
    """

    def __init__(self, load: Callable[[Any], Any],
                 device_fn: Callable[[Any], Any],
                 write: Callable[[int, Any], None],
                 prefetch: int = 2):
        if prefetch < 1:
            raise ValueError("prefetch must be >= 1")
        self._load = load
        self._device = device_fn
        self._write = write
        self._prefetch = prefetch
        self.stats = ExecutorStats()

    def run(self, items: Iterable[Any], start: int = 0) -> ExecutorStats:
        """Process items[start:] as frames start, start+1, ...; returns
        stats.  Re-raises the first stage error after cancelling."""
        import time

        inq: queue.Queue = queue.Queue(maxsize=self._prefetch)
        outq: queue.Queue = queue.Queue(maxsize=self._prefetch)
        cancel = threading.Event()
        errs: list = []

        def _loader():
            try:
                for i, item in enumerate(items):
                    if i < start:
                        continue
                    if cancel.is_set():
                        return
                    t0 = time.perf_counter()
                    x = self._load(item)
                    self.stats.load_s += time.perf_counter() - t0
                    inq.put((i, x))
            except Exception as e:          # noqa: BLE001 - stage boundary
                errs.append(e)
                cancel.set()
            finally:
                inq.put(_SENTINEL)

        def _writer():
            try:
                while True:
                    got = outq.get()
                    if got is _SENTINEL:
                        return
                    i, y = got
                    t0 = time.perf_counter()
                    self._write(i, y)
                    self.stats.write_s += time.perf_counter() - t0
                    self.stats.frames += 1
            except Exception as e:          # noqa: BLE001
                errs.append(e)
                cancel.set()
                # drain so the dispatcher never blocks on a dead writer
                while outq.get() is not _SENTINEL:
                    pass

        lt = threading.Thread(target=_loader, name="t3-loader", daemon=True)
        wt = threading.Thread(target=_writer, name="t3-writer", daemon=True)
        lt.start()
        wt.start()
        try:
            while True:
                got = inq.get()
                if got is _SENTINEL:
                    break
                if cancel.is_set():
                    continue                 # drain
                i, x = got
                t0 = time.perf_counter()
                with tracing.stage_timer("executor_dispatch"):
                    y = self._device(x)      # async dispatch; do NOT sync
                self.stats.dispatch_s += time.perf_counter() - t0
                outq.put((i, y))
        finally:
            cancel.set()
            outq.put(_SENTINEL)
            wt.join()
            # unblock a loader stuck on a full input queue, then join it
            while lt.is_alive():
                try:
                    inq.get(timeout=0.1)
                except queue.Empty:
                    pass
                lt.join(timeout=0.1)
        self.stats.errors = errs
        if errs:
            raise errs[0]
        return self.stats
