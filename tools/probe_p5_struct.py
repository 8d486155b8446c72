"""Chip micro-probe: rank candidate P5 w-not-dividing-234 structures.

The round-3 ledger (docs/PERF.md) left 5x5 at 17.6 fps and 25x25 at 17.9
vs the 30 fps target: the win/gen paths pay 3 full-size class-batched
dots per side.  Every redesign candidate converges to ~30 fps on paper,
so the decision needs measured micro-costs of the primitives at bench
shapes (sf=8192 superframes: nblk7=341, L=79794, vmap batch 128).

Measurement discipline (v1 of this probe produced garbage): a plain
jnp.sum consumer lets XLA DELETE permutations (sum is permutation-
invariant) and COLLAPSE dot+reduce into a matvec (sum is linear), so
every leg ends in a position-sensitive NONLINEAR consumer
(sum(out^2 * iota_weight)); each leg runs its core op on REP=4 distinct
derived inputs inside one jit (amplifies signal over the ~23 ms
dispatch floor without re-reading staged inputs); `base` measures the
shared input pass + consumer floor to subtract.

Legs (all int8, vmapped over 128 superframes):
  cls_dense{1,3}  current _win_consts dot(s): (27,G,Pa,27)x(Pa,27,27,702)
  mfull_dense     M-full extraction: (27,341,27)x(27,27,702)
  cls_small3      fold-flip candidate: (G,Pa,3,234)x(Pa,234,234) x3 deltas
  dec_cls3        decode CUW-style: (G,Pa,702)x(Pa,702,243) x3
  cls_narrow(+exp) boundary extract (729->128) and merge (128->702)
  fold_dots/u702  3 digit-plane folds (234x234) / rebuilds (234x243)
  transpose_st    (341,3,234) -> (3,L) materialized
  rev_minor/rows  minor-w lax.rev vs transposed-layout rev + parity mask
  enc_B / enc_Bp / enc_C  full encode-side candidate compositions

Prints one JSON dict: ms per op-instance per micro-batch (already /REP),
and scaled ms/frame (x15.8 micro-batches, x2 sides is NOT applied).

Usage: python tools/probe_p5_struct.py [--iters 8] [--rep 4]
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
MBF = 2025 / 128  # micro-batches per 8K frame


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--rep", type=int, default=4)
    ap.add_argument("--scan", type=int, default=24)
    ap.add_argument("--legs", type=str, default="",
                    help="comma-separated subset to run")
    args = ap.parse_args()
    REP = args.rep

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)

    def const(*shape):
        return jnp.asarray(rng.integers(0, 2, size=shape, dtype=np.int8))

    xs = [jnp.asarray(rng.integers(0, 3, size=(B, 27, 27 * N7),
                                   dtype=np.int8)) for _ in range(3)]

    VC_cls = const(PA, 27, 27, 702)
    VC_id = const(27, 27, 702)
    F_small = const(PA, 234, 234)
    CU_cls = const(PA, 702, 243)
    VC_nar = const(PA, 27, 27, 128)
    E_exp = const(PA, 128, 702)
    W_fold = const(234, 234)
    U_reb = const(234, 243)
    mask_r = jnp.asarray(rng.integers(0, 2, size=(1, NR, 1)).astype(bool))
    mask_rT = jnp.asarray(np.ascontiguousarray(
        np.asarray(mask_r).transpose(0, 2, 1)))

    def s8(y):
        return y.astype(jnp.int8)

    def consume(y):
        """Position-sensitive nonlinear scalar: survives no algebraic
        rewrite (square kills linear collapse; iota weight kills
        permutation invariance)."""
        z = y.astype(jnp.int32).reshape(-1)
        w = lax.iota(jnp.int32, z.shape[0]) & 7
        return jnp.sum(z * z * w)

    # --- per-superframe programs (vmapped below) -------------------------
    def base(x):
        return consume(x)

    def mfull_dense(x):
        X3 = x.reshape(27, N7, 27)
        return consume(s8(lax.dot_general(
            X3, VC_id, (((0, 2), (0, 1)), ((), ())),
            preferred_element_type=jnp.int32)))

    def _cls_dense(x, nd):
        Xc = jnp.pad(x, ((0, 0), (0, (G * PA - N7) * 27)))
        X5 = Xc.reshape(27, G, PA, 27)
        out = jnp.int32(0)
        for d in range(nd):
            out = out + consume(s8(lax.dot_general(
                X5, jnp.roll(VC_cls, d, axis=0),
                (((0, 3), (1, 2)), ((2,), (0,))),
                preferred_element_type=jnp.int32)))
        return out

    def cls_dense1(x):
        return _cls_dense(x, 1)

    def cls_dense3(x):
        return _cls_dense(x, 3)

    def _st(x):
        X3 = x.reshape(27, N7, 27)
        y = lax.dot_general(X3, VC_id, (((0, 2), (0, 1)), ((), ())),
                            preferred_element_type=jnp.int32)
        return s8(y).reshape(N7, 3, 234)

    def cls_small3(x):
        st = _st(x)
        stp = jnp.pad(st, ((1, G * PA - N7 + 1), (0, 0), (0, 0)))
        out = jnp.int32(0)
        acc = 0
        for dlt in range(3):
            v = lax.slice_in_dim(stp, dlt, dlt + G * PA, axis=0) \
                .reshape(G, PA, 3, 234)
            acc = acc + s8(lax.dot_general(
                v, F_small, (((3,), (1,)), ((1,), (0,))),
                preferred_element_type=jnp.int32))
        return out + consume(acc)

    def dec_cls3(x):
        st = _st(x).reshape(N7, 702)
        stp = jnp.pad(st, ((1, G * PA - N7 + 1), (0, 0)))
        acc = 0
        for dlt in range(3):
            v = lax.slice_in_dim(stp, dlt, dlt + G * PA, axis=0) \
                .reshape(G, PA, 702)
            acc = acc + s8(lax.dot_general(
                v, CU_cls, (((2,), (1,)), ((1,), (0,))),
                preferred_element_type=jnp.int32))
        return consume(acc)

    def cls_narrow(x):
        Xc = jnp.pad(x, ((0, 0), (0, (G * PA - N7) * 27)))
        X5 = Xc.reshape(27, G, PA, 27)
        return consume(s8(lax.dot_general(
            X5, VC_nar, (((0, 3), (1, 2)), ((2,), (0,))),
            preferred_element_type=jnp.int32)))

    def _narrow_exp(x):
        Xc = jnp.pad(x, ((0, 0), (0, (G * PA - N7) * 27)))
        X5 = Xc.reshape(27, G, PA, 27)
        nb = s8(lax.dot_general(X5, VC_nar,
                                (((0, 3), (1, 2)), ((2,), (0,))),
                                preferred_element_type=jnp.int32))
        return s8(lax.dot_general(nb.transpose(1, 0, 2), E_exp,
                                  (((2,), (1,)), ((1,), (0,))),
                                  preferred_element_type=jnp.int32))

    def cls_narrow_exp(x):
        return consume(_narrow_exp(x))

    def enc_C(x):
        Xc = jnp.pad(x, ((0, 0), (0, (G * PA - N7) * 27)))
        X5 = Xc.reshape(27, G, PA, 27)
        self_d = s8(lax.dot_general(X5, VC_cls,
                                    (((0, 3), (1, 2)), ((2,), (0,))),
                                    preferred_element_type=jnp.int32))
        return consume(self_d + _narrow_exp(x))

    def fold_dots(x):
        st = _st(x)
        return consume(sum(
            s8(lax.dot_general(st[:, d], W_fold, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32))
            for d in range(3)))

    def u702_dots(x):
        st = _st(x)
        return consume(sum(
            s8(lax.dot_general(st[:, d], U_reb, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32))
            for d in range(3)))

    def transpose_st(x):
        st = _st(x)
        return consume(st.transpose(1, 0, 2).reshape(3, L))

    def rev_minor(x):
        st = _st(x).transpose(1, 0, 2).reshape(3, L)
        stp = jnp.pad(st, ((0, 0), (0, LP - L))).reshape(3, NR, 5)
        return consume(jnp.where(mask_r, lax.rev(stp, (2,)), stp))

    def rev_rows(x):
        st = _st(x).transpose(1, 0, 2).reshape(3, L)
        stp = jnp.pad(st, ((0, 0), (0, LP - L))) \
            .reshape(3, NR, 5).transpose(0, 2, 1)
        return consume(jnp.where(mask_rT, lax.rev(stp, (1,)), stp))

    def enc_B(x):
        st = _st(x).transpose(1, 0, 2).reshape(3, L)
        stp = jnp.pad(st, ((0, 0), (0, LP - L))).reshape(3, NR, 5)
        fl = jnp.where(mask_r, lax.rev(stp, (2,)), stp)
        fl = fl.reshape(3, LP)[:, :L].reshape(3, N7, 234)
        return consume(sum(
            s8(lax.dot_general(fl[d], W_fold, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32))
            for d in range(3)))

    def enc_Bp(x):
        st = _st(x)
        stp = jnp.pad(st, ((1, G * PA - N7 + 1), (0, 0), (0, 0)))
        acc = 0
        for dlt in range(3):
            v = lax.slice_in_dim(stp, dlt, dlt + G * PA, axis=0) \
                .reshape(G, PA, 3, 234)
            acc = acc + s8(lax.dot_general(
                v, F_small, (((3,), (1,)), ((1,), (0,))),
                preferred_element_type=jnp.int32))
        return consume(acc.transpose(1, 0, 2, 3))

    legs = [
        ("base", base), ("mfull_dense", mfull_dense),
        ("cls_dense1", cls_dense1), ("cls_dense3", cls_dense3),
        ("cls_small3", cls_small3), ("dec_cls3", dec_cls3),
        ("cls_narrow", cls_narrow), ("cls_narrow_exp", cls_narrow_exp),
        ("enc_C", enc_C), ("fold_dots", fold_dots),
        ("u702_dots", u702_dots), ("transpose_st", transpose_st),
        ("rev_minor", rev_minor), ("rev_rows", rev_rows),
        ("enc_B", enc_B), ("enc_Bp", enc_Bp),
    ]
    if args.legs:
        sel = set(args.legs.split(","))
        legs = [(n, f) for n, f in legs if n in sel or n == "base"]

    # Scan-amplified timing: S serialized steps of the op inside ONE
    # dispatch (the carry seeds each step's input, the full sum(y^2)
    # reduce feeds the carry -- XLA can neither reorder, CSE, nor shrink
    # the op, and S x op-cost rises far above the ~25 ms tunnel jitter).
    import jax
    S = args.scan
    x0 = xs[0]
    res = {}
    for name, fn in legs:
        def whole(x, fn=fn):
            def step(c, _):
                xi = ((x + c.astype(jnp.int8)) % jnp.int8(3))
                r = jax.vmap(fn)(xi)
                c2 = c + jnp.int32(1) + (jnp.sum(r) & jnp.int32(1))
                return c2, None
            c, _ = jax.lax.scan(step, jnp.int32(0), None, length=S)
            return c
        f = jax.jit(whole)
        _ = float(f(x0))
        best = float("inf")
        for i in range(args.iters):
            t0 = time.perf_counter()
            _ = float(f(xs[i % len(xs)]))
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
