"""Chip probe #2: does batch-merging fix the class-dot M-starvation floor?

probe_p5_struct measured a ~3 ms/frame floor per class-batched dot
(vmap batch 128 x Pa class instances of M = G = nblk/Pa = 14 rows each
-- MXU-starved), which caps every P5 w-not-dividing-234 design at ~13
ms/side vs the ~2.6 ms/side budget that 30 fps allows.  In the STREAM
domain the vmap axis B is logically ADJACENT to the per-superframe block
group axis G, so (B, G, Pa, ...) -> (B*G, Pa, ...) is a pure reshape and
the class dot runs at M = B*G = 1792+ rows per class instance.

Legs (inputs staged directly in stream/grid layout; `base*` legs time
the staging read + consume floor for each input family):
  vm_small3_p5   per-sf under vmap: (G=69, Pw=5, 3, 234) x (5, 234, 234) x3
  bm_small3_p5   batch-merged:   (B*69, Pw=5, 3, 234) x (5, 234, 234) x3
  vm_small3_p25  per-sf under vmap: (G=14, 25, 3, 234) x (25, 234, 234) x3
  bm_small3_p25  batch-merged:   (B*14, 25, 3, 234) x (25, 234, 234) x3
  bm_enc_full    batch-merged encode FULL-FOLD: (B*G, Pa, 702) x
                 (Pa, 702, 702) x3 deltas (the _win_consts shape, merged)
  bm_enc_narrow  merged self full-size + 2 narrow-K neighbor dots
                 ((Pa, 81, 702): only 3 boundary words contract)
  bm_dec_full    batch-merged decode full-fold: (B*G, Pa, 702) x
                 (Pa, 702, 243) x3
  bm_dec_narrow  merged self + 2 narrow-N neighbor dots ((Pa, 702, 81))
  rev_stream     elementwise minor-w rev + parity mask on (3, L) staged
                 contiguous (no transpose in the program)

Usage: python tools/probe_p5_bm.py [--iters 5] [--scan 24]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 128
N7 = 341
L = 234 * N7
MBF = 2025 / 128


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--scan", type=int, default=24)
    ap.add_argument("--legs", type=str, default="")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)

    def const(*shape):
        return jnp.asarray(rng.integers(0, 2, size=shape, dtype=np.int8))

    # staged inputs: per-sf stream (B, n7p, 3, 234) padded to lcm(5,25)=25
    N7P = 350                       # ceil(341/25)*25, also mult of 5
    st_x = [jnp.asarray(rng.integers(0, 3, size=(B, N7P, 3, 234),
                                     dtype=np.int8)) for _ in range(2)]
    F5 = const(5, 234, 234)
    F25 = const(25, 234, 234)
    CW_full = const(25, 702, 702)
    CW_nar = const(25, 81, 702)
    CD_full = const(25, 702, 243)
    CD_nar = const(25, 702, 81)
    E81 = const(25, 81, 243)
    NR = (N7P * 234) // 5
    mask_r = jnp.asarray(
        rng.integers(0, 2, size=(1, 1, NR, 1)).astype(bool))

    def s8(y):
        return y.astype(jnp.int8)

    def consume(y):
        z = y.astype(jnp.int32).reshape(-1)
        w = lax.iota(jnp.int32, z.shape[0]) & 7
        return jnp.sum(z * z * w)

    # ---- whole-batch programs (NO vmap; merge done by reshape) ----------
    def base(x):
        return consume(x)

    def _cls3(x, P, F, vmapped):
        G = N7P // P
        if vmapped:
            def one(xs):                       # xs (n7p, 3, 234)
                acc = 0
                for dlt in range(3):
                    v = jnp.roll(xs, dlt - 1, axis=0) \
                        .reshape(G, P, 3, 234)
                    acc = acc + s8(lax.dot_general(
                        v, F, (((3,), (1,)), ((1,), (0,))),
                        preferred_element_type=jnp.int32))
                return consume(acc)
            return jnp.sum(jax.vmap(one)(x))
        xm = x.reshape(B * G, P, 3, 234)
        acc = 0
        for dlt in range(3):
            v = jnp.roll(xm, dlt - 1, axis=0)
            acc = acc + s8(lax.dot_general(
                v, F, (((3,), (1,)), ((1,), (0,))),
                preferred_element_type=jnp.int32))
        return consume(acc)

    def vm_small3_p5(x):
        return _cls3(x, 5, F5, True)

    def bm_small3_p5(x):
        return _cls3(x, 5, F5, False)

    def vm_small3_p25(x):
        return _cls3(x, 25, F25, True)

    def bm_small3_p25(x):
        return _cls3(x, 25, F25, False)

    def _grid(x):
        return x.reshape(B * (N7P // 25), 25, 702)

    def bm_enc_full(x):
        g = _grid(x)
        acc = 0
        for dlt in range(3):
            v = jnp.roll(g, dlt - 1, axis=0)
            acc = acc + s8(lax.dot_general(
                v, CW_full, (((2,), (1,)), ((1,), (0,))),
                preferred_element_type=jnp.int32))
        return consume(acc)

    def bm_enc_narrow(x):
        g = _grid(x)
        self_d = s8(lax.dot_general(g, CW_full,
                                    (((2,), (1,)), ((1,), (0,))),
                                    preferred_element_type=jnp.int32))
        acc = self_d
        for dlt in (0, 2):
            v = jnp.roll(g, dlt - 1, axis=0)[:, :, -81:]
            acc = acc + s8(lax.dot_general(
                v, CW_nar, (((2,), (1,)), ((1,), (0,))),
                preferred_element_type=jnp.int32))
        return consume(acc)

    def bm_dec_full(x):
        g = _grid(x)
        acc = 0
        for dlt in range(3):
            v = jnp.roll(g, dlt - 1, axis=0)
            acc = acc + s8(lax.dot_general(
                v, CD_full, (((2,), (1,)), ((1,), (0,))),
                preferred_element_type=jnp.int32))
        return consume(acc)

    def bm_dec_narrow(x):
        g = _grid(x)
        self_d = s8(lax.dot_general(g, CD_full,
                                    (((2,), (1,)), ((1,), (0,))),
                                    preferred_element_type=jnp.int32))
        nb = sum(
            s8(lax.dot_general(jnp.roll(g, dlt - 1, axis=0), CD_nar,
                               (((2,), (1,)), ((1,), (0,))),
                               preferred_element_type=jnp.int32))
            for dlt in (0, 2))                   # (Pa, BG, 81)
        ex = s8(lax.dot_general(nb.transpose(1, 0, 2), E81,
                                (((2,), (1,)), ((1,), (0,))),
                                preferred_element_type=jnp.int32))
        return consume(self_d + ex.transpose(0, 1, 2))

    def rev_stream(x):
        v = x.reshape(B, 3, N7P * 234 // 5, 5)   # NOT stream-contiguous;
        # timing stand-in for minor-w rev + mask on resident data
        return consume(jnp.where(mask_r, lax.rev(v, (3,)), v))

    legs = [
        ("base", base),
        ("vm_small3_p5", vm_small3_p5), ("bm_small3_p5", bm_small3_p5),
        ("vm_small3_p25", vm_small3_p25), ("bm_small3_p25", bm_small3_p25),
        ("bm_enc_full", bm_enc_full), ("bm_enc_narrow", bm_enc_narrow),
        ("bm_dec_full", bm_dec_full), ("bm_dec_narrow", bm_dec_narrow),
        ("rev_stream", rev_stream),
    ]
    if args.legs:
        sel = set(args.legs.split(","))
        legs = [(n, f) for n, f in legs if n in sel or n == "base"]

    S = args.scan
    res = {}
    for name, fn in legs:
        def whole(x, fn=fn):
            def step(c, _):
                xi = ((x + c.astype(jnp.int8)) % jnp.int8(3))
                r = fn(xi)
                return c + jnp.int32(1) + (r & jnp.int32(1)), None
            c, _ = jax.lax.scan(step, jnp.int32(0), None, length=S)
            return c
        f = jax.jit(whole)
        _ = float(f(st_x[0]))
        best = float("inf")
        for i in range(args.iters):
            t0 = time.perf_counter()
            _ = float(f(st_x[i % 2]))
            best = min(best, time.perf_counter() - t0)
        res[name] = best * 1e3
        print(f"{name}: {res[name]:.2f} ms raw ({S} steps)", flush=True)
    out = {}
    for k, v in res.items():
        per_op = (v - res["base"]) / S
        out[k] = {"ms_per_mb": round(per_op, 3),
                  "ms_per_frame": round(per_op * MBF, 2)}
    print(json.dumps({"raw_ms": {k: round(v, 2) for k, v in res.items()},
                      "per_op": out}))


if __name__ == "__main__":
    main()
