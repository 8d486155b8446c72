"""Per-stage timing of the 8K streamed pipeline on the live backend.

Splits the headline bench (bench.py) into separately-jitted stages so the
encode/decode/fast-slow split is measurable on the real chip (the remote
tunnel rejects jax.profiler, so stage timing is the instrument --
docs/PERF.md "measurement gotchas").

Usage:
    python tools/profile_stages.py [--sf-batch 128] [--iters 3] [--dirty]

Prints one JSON object: seconds per stage per 8K frame.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, variants, sync=lambda r: r):
    """Min-of-iters wall time; forces a device->host scalar per call."""
    import jax.numpy as jnp
    best = float("inf")
    for v in variants:
        t0 = time.perf_counter()
        r = fn(v)
        _ = float(jnp.sum(sync(r)[0].astype(jnp.int32) if isinstance(r, tuple)
                          else sync(r).astype(jnp.int32)))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--dirty", action="store_true",
                    help="also time decode of a corrupted stream (slow path)")
    ap.add_argument("--rs-mode", choices=["paged", "full", "legacy"],
                    default="paged",
                    help="A/B: paged (dirty-page-compacted chain), full "
                         "(unconditional chain, micro-batch RS), legacy "
                         "(per-superframe chain under vmap)")
    args = ap.parse_args()

    import jax
    # persistent compile cache: first compile over the remote tunnel is
    # minutes; cached reloads are seconds (tests/conftest.py does the same)
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from ternary_image_codec_tpu.config import (EncoderConfig, ProfileID,
                                                uep_luma_priority)
    from ternary_image_codec_tpu.ops import pipeline

    W, H = 7680, 4320
    n_raw = W * H // 2
    cfg = EncoderConfig(profile=ProfileID.P2_RS26_22, uep=uep_luma_priority())
    sf = cfg.superframe_words
    n_sf = -(-n_raw // sf)

    r = np.random.default_rng(0)
    t = r.integers(0, 3, size=(n_sf * sf, 27)).astype(np.int8)
    t[:, 26] = 0
    raw_np = ((t.reshape(-1, 9, 3) * np.array([1, 3, 9])).sum(-1)
              .astype(np.int8)).reshape(n_sf, sf, 9)

    _lay, dlay, enc, dec = pipeline._stream_fns(cfg, args.sf_batch,
                                                rs_mode=args.rs_mode)

    report = {"sf_batch": args.sf_batch, "n_sf": n_sf,
              "rs_mode": args.rs_mode,
              "barrier": not os.environ.get("T3_NO_BARRIER")}

    # distinct inputs per iteration (defeats remote result caching), built
    # host-side: integer mod on the VPU is the measured pathology
    enc_vars = [jnp.asarray((raw_np + i) % 27) for i in range(args.iters)]
    for v in enc_vars:
        v.block_until_ready()
    print("compiling encode...", file=sys.stderr, flush=True)
    def cost(fn, *a):
        try:
            c = fn.lower(*a).compile().cost_analysis()
            c = c[0] if isinstance(c, list) else c
            return {"gbytes": round(c.get("bytes accessed", 0) / 1e9, 3),
                    "gflops": round(c.get("flops", 0) / 1e9, 3)}
        except Exception as e:
            return {"error": str(e)[:80]}

    enc(enc_vars[0])  # compile
    report["encode_s"] = timed(enc, enc_vars)
    report["encode_cost"] = cost(enc, enc_vars[0])
    print(f'encode_s={report["encode_s"]:.4f}', file=sys.stderr, flush=True)

    prof = [enc(v) for v in enc_vars]
    for p in prof:
        p.block_until_ready()
    print("compiling decode...", file=sys.stderr, flush=True)
    dec(prof[0])  # compile
    report["decode_clean_s"] = timed(dec, prof)
    report["decode_cost"] = cost(dec, prof[0])
    print(f'decode_clean_s={report["decode_clean_s"]:.4f}',
          file=sys.stderr, flush=True)

    if args.dirty:
        # one flipped symbol per superframe: every micro-batch is dirty
        dirty = []
        for p in prof:
            d = np.asarray(p).copy()
            d[:, pipeline.HEADER_WORDS + 7, 4] = (
                d[:, pipeline.HEADER_WORDS + 7, 4] + 1) % 27
            dirty.append(jnp.asarray(d))
        report["decode_dirty_s"] = timed(dec, dirty)

    report["enc_dec_fps"] = round(
        1.0 / (report["encode_s"] + report["decode_clean_s"]), 3)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
