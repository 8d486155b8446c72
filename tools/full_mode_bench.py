"""Chip A/B: rs_mode="full" decode throughput, v3 blocked grid vs v2.

The full (unconditional BM/Chien/Forney on every block) decode serves
adversarially dense damage (old/.../v6_min.hpp:948-993 runs it always).
Times an 8K frame's superframe stream through strategy="full" with
T3_FULL_V3 on/off.  Usage: python tools/full_mode_bench.py [iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax
    from ternary_image_codec_tpu.config import (EncoderConfig, ProfileID,
                                                uep_luma_priority)
    from ternary_image_codec_tpu.ops import pipeline

    if os.environ.get("T3_BENCH_CPU"):
        jax.config.update("jax_platforms", "cpu")
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    W, H = map(int, os.environ.get("T3_BENCH_WH", "7680x4320").split("x"))
    n_raw = W * H // 2
    cfg = EncoderConfig(profile=ProfileID.P2_RS26_22, uep=uep_luma_priority())
    sf = cfg.superframe_words
    n_sf = -(-n_raw // sf)
    r = np.random.default_rng(0)
    t = r.integers(0, 3, size=(n_raw, 27)).astype(np.int8)
    t[:, 26] = 0
    raw_np = (t.reshape(n_raw, 9, 3) * np.array([1, 3, 9])).sum(-1) \
        .astype(np.int8)
    pad = n_sf * sf - n_raw
    chunks_np = np.concatenate(
        [raw_np, np.zeros((pad, 9), dtype=np.int8)]).reshape(n_sf, sf, 9)

    for v3 in ("1", "0"):
        os.environ["T3_FULL_V3"] = v3
        pipeline._decode_body_fn.cache_clear()
        pipeline._stream_fns.cache_clear()
        _l, _d, enc, dec_full = pipeline._stream_fns(cfg, 128,
                                                     rs_mode="full")

        @jax.jit
        def dec_frames(ws):
            outs, oks = lax.map(dec_full, ws)
            return jnp.all(oks), jnp.sum(outs[0, 0, :8].astype(jnp.int32))

        w1 = enc(jnp.asarray(chunks_np))
        ws = jnp.asarray(np.repeat(np.asarray(w1)[None], iters, axis=0))
        # inject scattered damage in every frame (full mode always pays
        # the whole chain; damage only changes the correction outcome)
        wnp = np.asarray(ws).copy()
        for i in range(iters):
            sfi = (200 + i) % n_sf
            pos = (500 + i) % (wnp.shape[3] - 6) + 6
            wnp[i, sfi, 4, pos] = (wnp[i, sfi, 4, pos] + 1 + i % 25) % 27
        ws = jnp.asarray(wnp)
        ok, chk = dec_frames(ws)     # compile + warm
        assert bool(ok), f"full-mode decode flagged (v3={v3})"
        t0 = time.perf_counter()
        ok, chk = dec_frames(ws)
        _ = float(chk)
        dt = (time.perf_counter() - t0) / iters
        print(f"T3_FULL_V3={v3}: full-mode decode {dt * 1e3:.1f} ms/frame "
              f"({1.0 / dt:.2f} fps decode-only)")


if __name__ == "__main__":
    main()
