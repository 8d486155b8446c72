"""RS(26,k) symbol-throughput micro-benchmark on the real chip.

BASELINE.md's secondary target is "RS(26,k) over GF(27), Mtrit/s class,
vectorized on-device" (BASELINE.json "metric"); this measures it directly:
encode, syndrome-check, and paged-correct throughput over a large block
batch per profile k, reported as Msym/s (26 GF(27) symbols per codeword)
and Mtrit/s (3 trits per symbol).

Usage: python tools/rs_bench.py [--blocks N] [--iters I]
(run on the chip; compile is cached under /root/.jax_cache)
"""
import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=2_000_000)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--errors", type=int, default=2000,
                    help="corrupted blocks per batch in the paged run")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from ternary_image_codec_tpu.ops import rs

    B = args.blocks
    rng = np.random.default_rng(0)

    def timed(fn, inputs):
        # warm/compile on the first input, then time over distinct inputs
        # (identical inputs can hit remote result caching, docs/PERF.md);
        # sync by pulling a scalar through the host
        _ = np.asarray(jnp.sum(fn(inputs[0]).astype(jnp.int32)))
        t0 = time.perf_counter()
        acc = [fn(x) for x in inputs[1:]]
        for r in acc:
            _ = np.asarray(jnp.sum(r.astype(jnp.int32)))
        return (time.perf_counter() - t0) / (len(inputs) - 1)

    out = {}
    for k in (24, 22, 20, 18):
        data = rng.integers(0, 3, size=(3, B, k)).astype(np.int8)
        enc = jax.jit(lambda d, k=k: rs.encode_pm_blocks(d, k))
        datasets = [jnp.asarray((data + i) % 3) for i in range(args.iters)]
        t_enc = timed(enc, datasets)
        cw = np.asarray(enc(datasets[0]))
        # corrupt a few blocks beyond-zero but within t = r//2 symbols
        bad = rng.choice(B, args.errors, replace=False)
        cwd = cw.copy()
        t_cap = (26 - k) // 2
        for bi in bad:
            for c in rng.choice(26, t_cap, replace=False):
                cwd[:, bi, c] = (cwd[:, bi, c] + 1) % 3
        chk = jax.jit(lambda w, k=k: rs.syndromes_pm_bk(w, k))
        wsets = [jnp.asarray((cw + i) % 3) for i in range(args.iters)]
        t_chk = timed(chk, wsets)
        page = rs.pick_page(B)
        fix = jax.jit(lambda w, k=k, p=page: rs.decode_paged_pm_bk(
            w, k, page=p, max_dirty_pages=max(args.errors // 4, 4))[0])
        # paged decode needs valid-ish codewords: rotate the dirty batch
        dsets = [jnp.asarray(np.roll(cwd, i, axis=1)) for i in range(args.iters)]
        t_fix = timed(fix, dsets)
        sym = 26 * B
        out[f"k{k}"] = {
            "encode_Msym_s": round(sym / t_enc / 1e6, 1),
            "check_Msym_s": round(sym / t_chk / 1e6, 1),
            "paged_fix_Msym_s": round(sym / t_fix / 1e6, 1),
            "encode_Mtrit_s": round(3 * sym / t_enc / 1e6, 1),
        }
        print(k, out[f"k{k}"], flush=True)
    print(json.dumps({"metric": "rs26_throughput", "blocks": B, **out}))


if __name__ == "__main__":
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
