"""Tracing / profiling / structured logging.

The reference has no instrumentation beyond minitest JSON reports and
FFVideoStats counters (SURVEY.md section 5 "tracing/profiling":
include/video_writer_ffmpeg.hpp:27-31, src/minitest_trits.cpp:252-291).
The rebuild keeps those report schemas (cli/) and adds the TPU-side story:

  * stage_timer(name)    -- host-side wall-clock accumulation per pipeline
                            stage (device work is synced before/after, so a
                            stage's time includes its device execution);
  * stage_report()       -- {stage: {"calls": n, "total_s": t}} snapshot;
  * log_event(event, **) -- one structured JSON line to stderr, enabled by
                            T3_LOG=1 (the minitests' report style, applied
                            to the library);
  * device_trace(outdir) -- jax.profiler trace context (TensorBoard/xprof
                            format); bench.py uses T3_TRACE_DIR.

Everything is no-overhead-when-off: timers are a perf_counter pair, and
log_event returns immediately unless T3_LOG is set.
"""
from __future__ import annotations

import contextlib
import json
import os
import sys
import threading
import time
from typing import Dict

_lock = threading.Lock()
_stages: Dict[str, Dict[str, float]] = {}


@contextlib.contextmanager
def stage_timer(name: str, sync=None):
    """Time a pipeline stage.  `sync`: optional device value to block on
    before stopping the clock (pass the stage's output array)."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            try:
                sync.block_until_ready()
            except AttributeError:
                pass
        dt = time.perf_counter() - t0
        with _lock:
            s = _stages.setdefault(name, {"calls": 0, "total_s": 0.0})
            s["calls"] += 1
            s["total_s"] += dt


def stage_report(reset: bool = False) -> Dict[str, Dict[str, float]]:
    with _lock:
        out = {k: dict(v) for k, v in _stages.items()}
        if reset:
            _stages.clear()
    return out


def log_event(event: str, **fields) -> None:
    """One JSON line to stderr when T3_LOG is set (structured logging)."""
    if not os.environ.get("T3_LOG"):
        return
    rec = {"event": event, "ts": time.time()}
    rec.update(fields)
    print(json.dumps(rec), file=sys.stderr, flush=True)


@contextlib.contextmanager
def device_trace(outdir: str | None):
    """jax.profiler trace context; no-op when outdir is falsy or the
    profiler is unavailable (e.g. remote-tunnel backends that reject it)."""
    if not outdir:
        yield
        return
    import jax
    try:
        jax.profiler.start_trace(outdir)
        started = True
    except Exception as e:  # profiler unsupported on this backend
        log_event("device_trace_failed", outdir=outdir, error=str(e))
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception as e:
                log_event("device_trace_stop_failed", error=str(e))
