"""Chip microbenchmarks for the pipeline's three hot dot_generals.

Measures, at real micro-batch scale (128 superframes), the end-to-end cost
of each contraction INCLUDING its follow-on convert/relayout -- the dot
output dtype decides the dominant HBM bytes (an int32 output is 4x the
int8 the pipeline actually keeps), so the variants probe:

  i8_i32   int8 operands, preferred int32 (current pipeline default)
  i8_i8    int8 operands, preferred int8 (accumulate stays exact: every
           probed contraction's true values fit int8)
  bf16     bf16 operands, preferred bf16 (values <= 2 -- exact)
  bal_bf16 balanced-map operands (2 -> -1) in bf16, f32 accumulate via
           preferred f32 (RS dot only: |sum| <= 132 < 256)

Usage: python tools/dot_probe.py [--iters 5]
Prints one JSON object {probe_name: seconds_per_frame}.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--sf-batch", type=int, default=128)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax
    from ternary_image_codec_tpu.ops import pipeline, rs

    B = args.sf_batch
    n_micro = -(-2025 // B)          # micro-batches per 8K frame
    nblk7 = 335                      # to_cols block count per superframe
    nblk = 400                       # padded RS blocks per band
    MB = 335                         # decode assembly blocks
    k = 22
    g = 6                            # k=22 band group size

    r = np.random.default_rng(0)
    P702 = np.asarray(pipeline._pack702())                     # (702, 729)
    U702 = np.asarray(pipeline._unpack702_bw())                # (27,26,243)
    G2 = np.asarray(rs._matrices_pm(k)["G2"])                  # (78, 3, k)

    X2_np = r.integers(0, 3, size=(B, nblk7, 729)).astype(np.int8)
    Ug_np = r.integers(0, 3, size=(B, g, 3, nblk, k)).astype(np.int8)
    M27_np = r.integers(0, 3, size=(B, 27, MB, 26)).astype(np.int8)

    results = {}

    def timed(name, fn, x_np):
        """Differential timing: one dispatch mapping fn over m micro-batches
        for m in {2, 6}; the slope removes the ~25 ms tunnel dispatch floor
        (docs/PERF.md "machine constants")."""
        def stack(m, j):
            # DISTINCT buffer per timed call: repeated identical inputs can
            # hit a remote result cache (docs/PERF.md gotchas)
            return jnp.asarray(np.stack(
                [(x_np.astype(np.int16) + j * m + i) % 3
                 for i in range(1, m + 1)]).astype(x_np.dtype))

        def run_m(m):
            # sum the WHOLE output (a sliced sum would let XLA narrow the
            # dot itself); the reduction pass is identical across variants
            f = jax.jit(lambda xs: jax.lax.map(
                lambda x: jnp.sum(fn(x).astype(jnp.int32)), xs))
            xs = [stack(m, j) for j in range(args.iters + 1)]
            try:
                _ = float(jnp.sum(f(xs[-1])))   # compile + warm
            except Exception as e:
                raise RuntimeError(
                    f"{type(e).__name__}: {e}"[:200]) from e
            best = float("inf")
            for xm in xs[:-1]:
                t0 = time.perf_counter()
                _ = float(jnp.sum(f(xm)))
                best = min(best, time.perf_counter() - t0)
            return best

        try:
            t2, t6 = run_m(2), run_m(6)
        except RuntimeError as e:
            results[name] = f"FAIL: {e}"
            return
        results[name] = round((t6 - t2) / 4.0 * n_micro, 5)  # s per frame

    fmod3 = lambda x: x - 3.0 * jnp.floor(x * (1.0 / 3.0))

    # ---- probe 1: encode to_cols 702-permutation dot + convert+relayout
    def cols_variant(pref, op_t):
        P = jnp.asarray(P702.astype(op_t))
        def fn(X2):
            Y = lax.dot_general(P, X2.astype(op_t),
                                (((1,), (2,)), ((), ())),
                                preferred_element_type=pref)   # (702,B,n)
            grid = Y.astype(jnp.int8).reshape(27, 26, B, nblk7) \
                .transpose(2, 0, 3, 1).reshape(B, 27, 26 * nblk7)
            return grid
        return fn

    timed("cols_i8_i32", cols_variant(jnp.int32, np.int8), X2_np)
    timed("cols_i8_i8", cols_variant(jnp.int8, np.int8), X2_np)
    timed("cols_bf16", cols_variant(jnp.bfloat16, jnp.bfloat16), X2_np)
    timed("cols_f32", cols_variant(jnp.float32, jnp.float32), X2_np)

    # ---- probe 2: RS encode group dot + fmod3 + int8
    def rs_variant(pref, op_t, balanced=False):
        Gm = G2.astype(np.int32)
        if balanced:
            Gm = np.where(Gm == 2, -1, Gm)
        Gj = jnp.asarray(Gm.astype(op_t))
        def fn(Ug):
            y = lax.dot_general(Gj, Ug.astype(op_t),
                                (((1, 2), (2, 4)), ((), ())),
                                preferred_element_type=pref)  # (78,B,g,nblk)
            return fmod3(y.astype(jnp.float32) + 135.0).astype(jnp.int8)
        return fn

    timed("rs_i8_i32", rs_variant(jnp.int32, np.int8), Ug_np)
    timed("rs_i8_i8", rs_variant(jnp.int8, np.int8), Ug_np)  # 264 > 127: wraps, timing only
    timed("rs_bal_bf16_f32", rs_variant(jnp.float32, jnp.bfloat16, True),
          Ug_np)
    timed("rs_bal_bf16_bf16", rs_variant(jnp.bfloat16, jnp.bfloat16, True),
          Ug_np)

    # ---- probe 3: decode assembly unpack dot + convert+relayout
    def asm_variant(pref, op_t):
        Uj = jnp.asarray(U702.astype(op_t))
        def fn(M27):
            wT = lax.dot_general(Uj, M27.astype(op_t),
                                 (((0, 1), (1, 3)), ((), ())),
                                 preferred_element_type=pref)  # (243,B,MB)
            return wT.astype(jnp.int8).reshape(9, 27, B, MB) \
                .transpose(2, 0, 3, 1).reshape(B, 9, MB * 27)
        return fn

    timed("asm_i8_i32", asm_variant(jnp.int32, np.int8), M27_np)
    timed("asm_i8_i8", asm_variant(jnp.int8, np.int8), M27_np)
    timed("asm_bf16", asm_variant(jnp.bfloat16, jnp.bfloat16), M27_np)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
