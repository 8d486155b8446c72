"""Chip probe #3: can the P5 encode skip the fold dots / a third rev dot?

Follow-ups to probe_p5_struct/probe_p5_bm (round-4 ledger):
  grp_ym       control: 3 fold dots (st -> Ym) + the k=22 group data dot
               from Ym's (M, Lk, 3, gv, 3, 26) view (the shipped shape)
  grp_stream   candidate: the SAME group dot taken directly from the
               masked stream via reshape (M, Lk, 3d, 26i, 3u, 3v) --
               zero fold dots, but the dot consumes a (26, 3, 3)-minor
               view (does XLA insert a killer relayout?)
  rev3         control: the shipped 3-delta _rev_mask class dots
  rev2         candidate: self class dot + ONE combined-neighbor narrow
               dot ((Pw, 64, 234): prev-tail + next-head cells concat)

Usage: python tools/probe_p5_grp.py [--iters 5] [--scan 24]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = 128
N7 = 341      # = Lk * M for k=22 (11 * 31) at sf=8192
M_, LK = 31, 11
PW = 5
N7P = 345     # ceil(341/5)*5
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

    st_x = [jnp.asarray(rng.integers(0, 3, size=(B, N7, 3, 234),
                                     dtype=np.int8)) for _ in range(2)]
    W_fold = const(234, 3, 3, 26)          # st -> Ym fold (per digit)
    Dk_ym = const(3, 2, 26, LK, 13, 22)    # group dot vs Ym view
    Dk_st = const(3, 2, 26, LK, 13, 22)    # group dot vs stream view
    R5 = const(PW, 234, 234)
    R5n = const(PW, 64, 234)
    mask_r = jnp.asarray(rng.integers(0, 2, size=(N7, 1, 234)).astype(bool))

    def s8(y):
        return y.astype(jnp.int8)

    def consume(y):
        z = y.astype(jnp.int32).reshape(-1)
        w = lax.iota(jnp.int32, z.shape[0]) & 7
        return jnp.sum(z * z * w)

    def base(x):
        return consume(x)

    def grp_ym(x):                          # x (N7, 3, 234) per sf
        Ym = jnp.stack(
            [lax.dot_general(x[:, d], W_fold, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
             .astype(jnp.int8) for d in range(3)],
            axis=3)                         # (n7, 3, 3, 3d, 26)
        Yg = Ym[:, :, 1:3].reshape(M_, LK, 3, 2, 3, 26)
        data = lax.dot_general(Yg, Dk_ym,
                               (((5, 1), (2, 3)), ((2, 3), (0, 1))),
                               preferred_element_type=jnp.int32)
        return consume(s8(data))

    def grp_stream(x):
        v6 = x.reshape(M_, LK, 3, 26, 3, 3)[..., 1:3]
        data = lax.dot_general(v6, Dk_st,
                               (((3, 1), (2, 3)), ((4, 5), (0, 1))),
                               preferred_element_type=jnp.int32)
        return consume(s8(data))

    def rev3(x):
        stp = jnp.pad(x, ((1, 1 + N7P - N7), (0, 0), (0, 0)))
        rev = sum(
            s8(lax.dot_general(
                lax.slice_in_dim(stp, dlt, dlt + N7P, axis=0)
                .reshape(N7P // PW, PW, 3, 234),
                R5[None][0] if dlt == 1 else jnp.roll(R5, dlt, 1),
                (((3,), (1,)), ((1,), (0,))),
                preferred_element_type=jnp.int32))
            for dlt in range(3))
        rev = rev.transpose(1, 0, 2, 3).reshape(N7P, 3, 234)[:N7]
        return consume(jnp.where(mask_r, rev, x))

    def rev2(x):
        stp = jnp.pad(x, ((1, 1 + N7P - N7), (0, 0), (0, 0)))
        self_r = s8(lax.dot_general(
            lax.slice_in_dim(stp, 1, 1 + N7P, axis=0)
            .reshape(N7P // PW, PW, 3, 234),
            R5, (((3,), (1,)), ((1,), (0,))),
            preferred_element_type=jnp.int32))
        nbr = jnp.concatenate(
            [lax.slice_in_dim(stp, 0, N7P, axis=0)[:, :, -32:],
             lax.slice_in_dim(stp, 2, 2 + N7P, axis=0)[:, :, :32]],
            axis=2)                          # (N7P, 3, 64)
        nbr_r = s8(lax.dot_general(
            nbr.reshape(N7P // PW, PW, 3, 64), R5n,
            (((3,), (1,)), ((1,), (0,))),
            preferred_element_type=jnp.int32))
        rev = (self_r + nbr_r).transpose(1, 0, 2, 3) \
            .reshape(N7P, 3, 234)[:N7]
        return consume(jnp.where(mask_r, rev, x))

    legs = [("base", base), ("grp_ym", grp_ym), ("grp_stream", grp_stream),
            ("rev3", rev3), ("rev2", rev2)]
    if args.legs:
        sel = set(args.legs.split(","))
        legs = [(n, f) for n, f in legs if n in sel or n == "base"]

    S = args.scan
    res = {}
    for name, fn in legs:
        def whole(x, fn=fn):
            def step(c, _):
                xi = ((x + c.astype(jnp.int8)) % jnp.int8(3))
                r = jnp.sum(jax.vmap(fn)(xi))
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
    out = {k: round((v - res["base"]) / S * MBF, 2) for k, v in res.items()}
    print(json.dumps({"raw_ms": {k: round(v, 2) for k, v in res.items()},
                      "ms_per_frame": out}))


if __name__ == "__main__":
    main()
