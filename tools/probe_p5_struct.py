"""Chip micro-probe: rank candidate P5 w-not-dividing-234 structures.

The round-3 ledger (docs/PERF.md) left 5x5 at 17.6 fps and 25x25 at 17.9
vs the 30 fps target: the win/gen paths pay 3 full-size class-batched
dots per side.  Every redesign candidate converges to ~30 fps on paper,
so the decision needs measured micro-costs of the primitives at bench
shapes (sf=8192 superframes: nblk7=341, L=79794, vmap batch 128):

  cls_dense   current _win_consts dot: (27, G, Pa, 27) x (Pa, 27, 27, 702)
  mfull_dense M-full extraction: (27, 341, 27) x (27, 27, 702)
  cls_small   fold-flip candidate: (G, Pa, 3, 234) x (Pa, 234, 234)
  cls_narrow  boundary extract: (27, G, Pa, 27) x (Pa, 27, 27, 128)
  cls_expand  boundary merge: (G, Pa, 128) x (Pa, 128, 702)
  fold_dots   3 digit-plane folds: (341, 234) x (234, 234)
  u702_dots   3 digit-plane rebuilds: (341, 234) x (234, 243)
  transpose   (341, 3, 234) -> (3, L) materialized
  rev_minor   (3, nrows, 5) lax.rev on the minor w axis + parity mask
  rev_rows    (3, 5, nrows) rev on the second-minor axis (good layout)

Each leg is its own jit over a vmapped (128, ...) int8 program ending in
a forced scalar; a `base` leg (sum only) measures the shared input-pass +
dispatch cost to subtract.  Prints one JSON dict of ms per micro-batch.

Usage: python tools/probe_p5_struct.py [--iters 4]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 128          # vmap superframe batch (bench sf_batch)
N7 = 341         # nblk7 at sf=8192
PA = 25          # 5x5 class period
G = 14           # ceil(341 / 25)
L = 234 * N7     # stream length 79794
SB = 5850        # lcm(234, 25)
NSB = 14         # ceil(L / SB)
LP = SB * NSB    # padded stream 81900
NR = LP // 5     # rows of width 5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)

    def const(*shape):
        return jnp.asarray(rng.integers(0, 2, size=shape, dtype=np.int8))

    # shared input: word digit planes (27, 27*nblk7) per superframe
    xs = [jnp.asarray(rng.integers(0, 3, size=(B, 27, 27 * N7),
                                   dtype=np.int8)) for _ in range(3)]

    VC_cls = const(PA, 27, 27, 702)
    VC_id = const(27, 27, 702)
    F_small = const(PA, 234, 234)
    VC_nar = const(PA, 27, 27, 128)
    E_exp = const(PA, 128, 702)
    W_fold = const(234, 234)
    U_reb = const(234, 243)
    mask_r = jnp.asarray(rng.integers(0, 2, size=(1, NR, 1)).astype(bool))
    mask_rT = jnp.asarray(np.ascontiguousarray(
        np.asarray(mask_r).transpose(0, 2, 1)))

    def s8(y):
        return y.astype(jnp.int8)

    # --- per-superframe programs (vmapped below) -------------------------
    def base(x):
        return x

    def mfull_dense(x):
        X3 = x.reshape(27, N7, 27)
        return s8(lax.dot_general(X3, VC_id, (((0, 2), (0, 1)), ((), ())),
                                  preferred_element_type=jnp.int32))

    def _cls_dense1(x, nd):
        Xc = jnp.pad(x, ((0, 0), (0, (G * PA - N7) * 27)))
        X5 = Xc.reshape(27, G, PA, 27)
        out = 0
        for d in range(nd):
            out = out + s8(lax.dot_general(
                X5, VC_cls, (((0, 3), (1, 2)), ((2,), (0,))),
                preferred_element_type=jnp.int32))
        return out

    def cls_dense1(x):
        return _cls_dense1(x, 1)

    def cls_dense3(x):
        return _cls_dense1(x, 3)

    def _st(x):
        """shared V702-ish extraction to (N7, 3, 234) via 3 fold dots on a
        (27, 27)-joint dot -- stand-in for the stream dot output."""
        X3 = x.reshape(27, N7, 27)
        y = lax.dot_general(X3, VC_id, (((0, 2), (0, 1)), ((), ())),
                            preferred_element_type=jnp.int32)
        return s8(y).reshape(N7, 3, 234)

    def cls_small3(x):
        st = _st(x)
        stp = jnp.pad(st, ((0, G * PA - N7), (0, 0), (0, 0))) \
            .reshape(G, PA, 3, 234)
        out = 0
        for d in range(3):
            out = out + s8(lax.dot_general(
                stp, F_small, (((3,), (1,)), ((1,), (0,))),
                preferred_element_type=jnp.int32))
        return out

    def cls_narrow(x):
        Xc = jnp.pad(x, ((0, 0), (0, (G * PA - N7) * 27)))
        X5 = Xc.reshape(27, G, PA, 27)
        return s8(lax.dot_general(X5, VC_nar, (((0, 3), (1, 2)), ((2,), (0,))),
                                  preferred_element_type=jnp.int32))

    def cls_narrow_exp(x):
        nb = cls_narrow(x)                      # (PA, G, 128)
        return s8(lax.dot_general(nb.transpose(1, 0, 2), E_exp,
                                  (((2,), (1,)), ((1,), (0,))),
                                  preferred_element_type=jnp.int32))

    def enc_C(x):
        """narrow-boundary composition: dense self + narrow + expand."""
        return _cls_dense1(x, 1) + cls_narrow_exp(x)

    def fold_dots(x):
        st = _st(x)
        return sum(s8(lax.dot_general(st[:, d], W_fold,
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32))
                   for d in range(3))

    def u702_dots(x):
        st = _st(x)
        return sum(s8(lax.dot_general(st[:, d], U_reb,
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32))
                   for d in range(3))

    def transpose_st(x):
        st = _st(x)
        return st.transpose(1, 0, 2).reshape(3, L) + jnp.int8(1)

    def rev_minor(x):
        st = _st(x).transpose(1, 0, 2).reshape(3, L)
        stp = jnp.pad(st, ((0, 0), (0, LP - L))).reshape(3, NR, 5)
        return jnp.where(mask_r, lax.rev(stp, (2,)), stp)

    def rev_rows(x):
        st = _st(x).transpose(1, 0, 2).reshape(3, L)
        stp = jnp.pad(st, ((0, 0), (0, LP - L))) \
            .reshape(3, NR, 5).transpose(0, 2, 1)       # (3, 5, NR)
        return jnp.where(mask_rT, lax.rev(stp, (1,)), stp)

    def enc_B(x):
        """superblock elementwise path: extract -> transpose -> rev+mask
        -> fold dots."""
        st = _st(x).transpose(1, 0, 2).reshape(3, L)
        stp = jnp.pad(st, ((0, 0), (0, LP - L))).reshape(3, NR, 5)
        fl = jnp.where(mask_r, lax.rev(stp, (2,)), stp)
        fl = fl.reshape(3, LP)[:, :L].reshape(3, N7, 234)
        return sum(s8(lax.dot_general(fl[d], W_fold,
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32))
                   for d in range(3))

    def enc_Bp(x):
        """fold-flip class-dot path: extract -> (G, Pa) view -> 3 small
        class dots (no transpose before the dots)."""
        st = _st(x)
        stp = jnp.pad(st, ((1, G * PA - N7 + 1), (0, 0), (0, 0)))
        out = 0
        for dlt in range(3):
            v = lax.slice_in_dim(stp, dlt, dlt + G * PA, axis=0) \
                .reshape(G, PA, 3, 234)
            out = out + s8(lax.dot_general(
                v, F_small, (((3,), (1,)), ((1,), (0,))),
                preferred_element_type=jnp.int32))
        return out

    legs = [
        ("base", base), ("mfull_dense", mfull_dense),
        ("cls_dense1", cls_dense1), ("cls_dense3", cls_dense3),
        ("cls_small3", cls_small3), ("cls_narrow", cls_narrow),
        ("cls_narrow_exp", cls_narrow_exp), ("enc_C", enc_C),
        ("fold_dots", fold_dots), ("u702_dots", u702_dots),
        ("transpose_st", transpose_st), ("rev_minor", rev_minor),
        ("rev_rows", rev_rows), ("enc_B", enc_B), ("enc_Bp", enc_Bp),
    ]

    import jax
    res = {}
    for name, fn in legs:
        f = jax.jit(lambda x, fn=fn: jnp.sum(
            jax.vmap(fn)(x).astype(jnp.int32)))
        _ = float(f(xs[0]))                       # compile + warm
        best = float("inf")
        for i in range(args.iters):
            t0 = time.perf_counter()
            _ = float(f(xs[i % len(xs)]))
            best = min(best, time.perf_counter() - t0)
        res[name] = round(best * 1e3, 2)
        print(f"{name}: {res[name]} ms", flush=True)
    res_d = {k: round(v - res["base"], 2) for k, v in res.items()}
    print(json.dumps({"raw_ms_per_microbatch": res,
                      "minus_base": res_d,
                      "microbatches_per_frame": 2025 / B}))


if __name__ == "__main__":
    main()
