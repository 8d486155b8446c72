"""Perf bisection harness (run manually on the TPU): times pipeline stages
separately to locate the bottleneck. Not a pytest file."""
import sys
import time

import numpy as np


def timeit(fn, *args, iters=3, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt*1e3:.1f} ms")
    return dt


if __name__ == "__main__":
    import jax
    import jax.numpy as jnp
    from ternary_image_codec_tpu.config import (EncoderConfig, ProfileID,
                                                uep_luma_priority)
    from ternary_image_codec_tpu.ops import pipeline, rs, scramble

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    cfg = EncoderConfig(profile=ProfileID.P2_RS26_22, uep=uep_luma_priority())
    n_raw = 7680 * 4320 // 2
    sf = cfg.superframe_words
    n_sf = -(-n_raw // sf)
    r = np.random.default_rng(0)

    if which in ("all", "enc", "dec"):
        lay, dlay, enc, dec = pipeline._stream_fns(cfg, 128)
        chunks = jnp.asarray(r.integers(0, 27, size=(n_sf, sf, 9),
                                        dtype=np.int8))
        if which in ("all", "enc"):
            dt = timeit(enc, chunks, label="encode stream")
        prof = enc(chunks)
        jax.block_until_ready(prof)
        if which in ("all", "dec"):
            timeit(dec, prof, label="decode stream")

    if which in ("all", "rs"):
        # raw RS throughput: all blocks of the frame in one shot
        B = 5_530_000 // 4
        data = jnp.asarray(r.integers(0, 27, size=(B, 22), dtype=np.int8))
        enc22 = jax.jit(lambda d: rs.encode(d, 22))
        timeit(enc22, data, label=f"rs.encode k=22 B={B}")
        cw = enc22(data)
        jax.block_until_ready(cw)
        dec22 = jax.jit(lambda c: rs.decode(c, 22))
        timeit(dec22, cw, label=f"rs.decode k=22 B={B}")

    if which in ("all", "scr"):
        n = 143_900_000 // 4
        syms = jnp.asarray(r.integers(0, 27, size=n, dtype=np.int8))
        scr = jax.jit(lambda s: scramble.scramble(s, 1, 1, 1))
        timeit(scr, syms, label=f"scramble n={n}")
