"""StreamExecutor: pipelined load -> device -> write with bounded queues.

Covers ordering, backpressure, resume-start, error propagation from each
stage, and byte-parity of the pipelined video CLI against a hand-rolled
sequential encode.
"""
import os
import threading
import time

import numpy as np
import pytest

from ternary_image_codec_tpu.runtime.executor import StreamExecutor


def test_order_and_stats():
    out = []
    stats = StreamExecutor(
        load=lambda i: i * 10,
        device_fn=lambda x: x + 1,
        write=lambda i, y: out.append((i, y)),
        prefetch=2,
    ).run(range(7))
    assert out == [(i, i * 10 + 1) for i in range(7)]
    assert stats.frames == 7 and not stats.errors


def test_resume_start_skips_loads():
    loaded = []
    out = []
    StreamExecutor(
        load=lambda i: loaded.append(i) or i,
        device_fn=lambda x: x,
        write=lambda i, y: out.append(i),
    ).run(range(6), start=4)
    assert loaded == [4, 5]
    assert out == [4, 5]


def test_stages_overlap():
    """A load and a write must be in flight concurrently (pipelining) --
    asserted on wall-clock intervals, not totals, so the test stays
    stable under CPU contention from the rest of the suite."""
    d = 0.03
    n = 8
    loads, writes = [], []

    def load(i):
        t0 = time.perf_counter()
        time.sleep(d)
        loads.append((t0, time.perf_counter()))
        return i

    def write(i, y):
        t0 = time.perf_counter()
        time.sleep(d)
        writes.append((t0, time.perf_counter()))

    StreamExecutor(load, lambda x: x, write, prefetch=2).run(range(n))
    overlap = any(ls < we and ws < le
                  for ls, le in loads for ws, we in writes)
    assert overlap, (loads, writes)


def test_backpressure_bounds_inflight():
    """No more than prefetch outputs may exist before the writer drains
    them (HBM discipline)."""
    inflight = []
    live = [0]
    lock = threading.Lock()

    def device(x):
        with lock:
            live[0] += 1
            inflight.append(live[0])
        return x

    def write(i, y):
        time.sleep(0.01)
        with lock:
            live[0] -= 1

    StreamExecutor(lambda i: i, device, write, prefetch=2).run(range(12))
    # caller thread + 2 queue slots bound the in-flight outputs
    assert max(inflight) <= 4, inflight


@pytest.mark.parametrize("stage", ["load", "device", "write"])
def test_error_propagates_and_cancels(stage):
    boom = RuntimeError("boom")

    def load(i):
        if stage == "load" and i == 3:
            raise boom
        return i

    def device(x):
        if stage == "device" and x == 3:
            raise boom
        return x

    def write(i, y):
        if stage == "write" and i == 3:
            raise boom

    ex = StreamExecutor(load, device, write, prefetch=2)
    with pytest.raises(RuntimeError, match="boom"):
        ex.run(range(50))
    # pipeline cancelled early: nowhere near all 50 frames processed
    assert ex.stats.frames < 50


def test_video_cli_pipelined_matches_sequential(tmp_path):
    """The pipelined CLI writes byte-identical containers to a sequential
    encode of the same frames."""
    import jax.numpy as jnp
    from ternary_image_codec_tpu.cli import main_video_t3v as MV
    from ternary_image_codec_tpu.config import EncoderConfig, ProfileID, Tile2D
    from ternary_image_codec_tpu.io import image as I
    from ternary_image_codec_tpu.io import legacy_containers as LC
    from ternary_image_codec_tpu.ops import pipeline as PL
    from ternary_image_codec_tpu.ops import quant as Q
    from ternary_image_codec_tpu.ops import wordcodec as WC

    r = np.random.default_rng(5)
    paths = []
    for i in range(3):
        p = tmp_path / f"in_{i}.png"
        I.save_image_png(str(p),
                         r.integers(0, 256, size=(8, 8, 3)).astype(np.uint8))
        paths.append(str(p))
    out = tmp_path / "out.t3v"
    fdir = tmp_path / "frames"
    rc = MV.main([*paths, str(out), "--frames-dir", str(fdir)])
    assert rc == 0

    # hand-rolled sequential reference bytes
    cfg = EncoderConfig(profile=ProfileID.P2_RS26_22, tile=Tile2D(64, 64))
    blobs = []
    for p in paths:
        rgb = I.load_image_rgb8(p)
        q = Q.rgb_to_quant(jnp.asarray(rgb)).reshape(-1, 3)
        raw = WC.quant_to_words9(q)
        prof = np.asarray(PL.encode_profile_from_raw(raw, cfg))
        blobs.append(LC._t3v_old_frame_bytes(prof))
    got = open(out, "rb").read()
    assert got.endswith(b"".join(blobs))
    # per-frame PNG exports present and decodable
    assert sorted(os.listdir(fdir)) == [f"frame_{i:05d}.png"
                                        for i in range(3)]
