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
    ap.add_argument("--rs-mode",
                    choices=["paged", "full", "legacy", "check", "none"],
                    default="paged",
                    help="A/B: paged (dirty-page-compacted chain), full "
                         "(unconditional chain, micro-batch RS), legacy "
                         "(per-superframe chain under vmap)")
    ap.add_argument("--encode-cumulative", action="store_true",
                    help="time FUSED cumulative encode prefixes (to_cols, "
                         "+rs, full)")
    ap.add_argument("--encode-stages", action="store_true",
                    help="time encode sub-stages (to_cols / rs / "
                         "build_words) as separate jits")
    ap.add_argument("--decode-stages", action="store_true",
                    help="time decode sub-stages (pre / rs / post) as "
                         "separate jits")
    ap.add_argument("--decode-cumulative", action="store_true",
                    help="time FUSED cumulative decode prefixes (pre, "
                         "pre+syndromes, pre+rs, full) -- marginal costs "
                         "without stage-boundary materialization")
    args = ap.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # env alone is not enough: a sitecustomize hook force-registers the
        # tunneled TPU backend (CLAUDE.md "environment gotchas")
        jax.config.update("jax_platforms", "cpu")
    # persistent compile cache: first compile over the remote tunnel is
    # minutes; cached reloads are seconds (tests/conftest.py does the same)
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from ternary_image_codec_tpu.config import (EncoderConfig, ProfileID,
                                                uep_luma_priority)
    from ternary_image_codec_tpu.ops import pipeline

    W, H = (int(x) for x in
            os.environ.get("T3_BENCH_WH", "7680x4320").split("x"))
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
        # (wire-planes layout: (n_sf, 9, total))
        dirty = []
        for p in prof:
            d = np.asarray(p).copy()
            d[:, 4, pipeline.HEADER_WORDS + 7] = (
                d[:, 4, pipeline.HEADER_WORDS + 7] + 1) % 27
            dirty.append(jnp.asarray(d))
        report["decode_dirty_s"] = timed(dec, dirty)

    from jax import lax

    def stream_of(stage_fn):
        """Wrap a per-superframe stage as the lax.map(vmap(.)) stream the
        real pipeline uses, so sub-stage timings add up comparably."""
        @jax.jit
        def run(x):
            return lax.map(jax.vmap(stage_fn), x)
        return run

    def rebatch(x, n):
        nb = -(-x.shape[0] // args.sf_batch)
        pad = nb * args.sf_batch - x.shape[0]
        if pad:
            x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)])
        return x.reshape(nb, args.sf_batch, *x.shape[1:])

    if args.encode_stages:
        layout = pipeline.build_encode_layout(cfg, sf)
        to_cols, rs_stage, build_words, _efmt = pipeline._encode_parts(layout)
        xs_l = [rebatch(v.reshape(-1, sf, 9), n_sf) for v in enc_vars[:2]]
        f1, f2, f3 = (stream_of(s) for s in (to_cols, rs_stage, build_words))
        cols_l = [f1(x) for x in xs_l]
        report["enc_to_cols_s"] = timed(f1, xs_l)
        report["enc_to_cols_cost"] = cost(f1, xs_l[0])
        encd_l = [f2(c) for c in cols_l]
        report["enc_rs_s"] = timed(f2, cols_l)
        report["enc_rs_cost"] = cost(f2, cols_l[0])
        f3(encd_l[0])
        report["enc_build_words_s"] = timed(f3, encd_l)
        report["enc_build_words_cost"] = cost(f3, encd_l[0])
        print("encode stages done", file=sys.stderr, flush=True)

    if args.decode_stages:
        from ternary_image_codec_tpu.ops import rs as RS
        pre, post, meta, fmt = pipeline._decode_parts(dlay)
        body_l = [rebatch(p[:, :, pipeline.HEADER_WORDS:], n_sf)
                  for p in prof[:2]]
        if fmt == "pm":
            op = ((lambda c, kk: RS.decode_paged_pm(c, kk, page=32))
                  if args.rs_mode == "paged" else RS.decode_pm)
            axis = -1
        else:
            op = ((lambda c, kk: RS.decode_dig_paged(c, kk, page=32))
                  if args.rs_mode == "paged" else RS.decode_dig)
            axis = 0

        def rs_only(blks):
            dec = pipeline._grouped_rs(
                [(i, blk, meta[i][2]) for i, blk in enumerate(blks)],
                op, axis=axis)
            return tuple(dec[i][0] for i in range(len(meta)))

        g1, g2, g3 = (stream_of(s) for s in (pre, rs_only, post))
        blk_l = [g1(b) for b in body_l]
        report["dec_pre_s"] = timed(g1, body_l)
        report["dec_pre_cost"] = cost(g1, body_l[0])
        decd_l = [g2(b) for b in blk_l]
        report["dec_rs_s"] = timed(g2, blk_l)
        report["dec_rs_cost"] = cost(g2, blk_l[0])
        g3(decd_l[0])
        report["dec_post_s"] = timed(g3, decd_l)
        report["dec_post_cost"] = cost(g3, decd_l[0])
        print("decode stages done", file=sys.stderr, flush=True)

    if args.encode_cumulative:
        from jax import lax as _lx
        layout = pipeline.build_encode_layout(cfg, sf)
        to_cols, rs_st, build_w, _ef = pipeline._encode_parts(layout)
        xs_l = [rebatch(v.reshape(-1, sf, 9), n_sf) for v in enc_vars[:2]]

        def c_cols(c):
            return jnp.sum(to_cols(c).astype(jnp.int32))

        def c_rs(c):
            return sum(jnp.sum(x.astype(jnp.int32))
                       for x in rs_st(to_cols(c)))

        def c_full(c):
            return jnp.sum(build_w(rs_st(to_cols(c))).astype(jnp.int32))

        for name, fnx in (("ecum_cols", c_cols), ("ecum_rs", c_rs),
                          ("ecum_full", c_full)):
            g = jax.jit(lambda x, f=fnx: _lx.map(jax.vmap(f), x).sum())
            g(xs_l[0])
            best = float("inf")
            for v in xs_l * ((args.iters + 1) // 2):
                t0 = time.perf_counter()
                _ = int(g(v))
                best = min(best, time.perf_counter() - t0)
            report[f"{name}_s"] = round(best, 5)
            print(f"{name}={best:.4f}", file=sys.stderr, flush=True)

    if args.decode_cumulative:
        from ternary_image_codec_tpu.ops import rs as RS
        pre, post, meta, fmt = pipeline._decode_parts(dlay)
        assert fmt == "pm"
        body_l = [rebatch(p[:, :, pipeline.HEADER_WORDS:], n_sf)
                  for p in prof[:2]]

        def upto_pre(b):
            blks = pre(b)
            return sum(jnp.sum(x.astype(jnp.int32)) for x in blks)

        def upto_synd(b):
            blks = pre(b)
            acc = jnp.int32(0)
            for i, blk in enumerate(blks):
                acc += jnp.sum(RS.syndromes_pm_bk(blk, meta[i][2])
                               .astype(jnp.int32))
            return acc

        def upto_rs(b):
            blks = pre(b)
            dec = pipeline._grouped_rs(
                [(i, blk, meta[i][2]) for i, blk in enumerate(blks)],
                lambda c, kk: RS.decode_paged_pm_bk(c, kk, page=32), axis=1)
            return sum(jnp.sum(dec[i][0].astype(jnp.int32))
                       for i in range(len(meta)))

        def upto_full(b):
            blks = pre(b)
            dec = pipeline._grouped_rs(
                [(i, blk, meta[i][2]) for i, blk in enumerate(blks)],
                lambda c, kk: RS.decode_paged_pm_bk(c, kk, page=32), axis=1)
            out = post(tuple(dec[i][0] for i in range(len(meta))))
            return jnp.sum(out.astype(jnp.int32))

        for name, fn in (("cum_pre", upto_pre), ("cum_synd", upto_synd),
                         ("cum_rs", upto_rs), ("cum_full", upto_full)):
            g = jax.jit(lambda x, f=fn: lax.map(jax.vmap(f), x).sum())
            g(body_l[0])
            best = float("inf")
            for v in body_l * ((args.iters + 1) // 2):
                t0 = time.perf_counter()
                _ = int(g(v))
                best = min(best, time.perf_counter() - t0)
            report[f"{name}_s"] = round(best, 5)
            print(f"{name}={best:.4f}", file=sys.stderr, flush=True)

    report["enc_dec_fps"] = round(
        1.0 / (report["encode_s"] + report["decode_clean_s"]), 3)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
