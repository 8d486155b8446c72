"""Calibrate achievable on-chip HBM bandwidth + dispatch floor.

Times trivially bandwidth-bound ops (int8 copy-add, f32 axpy) at several
sizes on the live backend, plus an empty-ish dispatch to measure the
per-call floor over the remote tunnel.  Anchors profile_stages numbers:
a stage at X GB accessed should take ~X / (measured GB/s).

Usage: python tools/hbm_probe.py [--sizes-mb 64,256,512]
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
    ap.add_argument("--sizes-mb", default="64,256,512")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--layouts", action="store_true",
                    help="probe minor-dim tiling cost: same logical bytes "
                         "as (B,26,3) vs (3,26,B) vs flat")
    ap.add_argument("--chain", action="store_true",
                    help="probe per-op overhead in the pipeline's regime: "
                         "N distinct elementwise stages (each a forced "
                         "materialization) over (128, 27, 7895) int8 "
                         "under lax.map x16")
    args = ap.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    import jax.numpy as jnp

    report = {"device": str(jax.devices()[0])}

    @jax.jit
    def tiny(x):
        return x + 1

    t = jnp.zeros((8,), jnp.int32)
    tiny(t)
    times = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        _ = int(jnp.sum(tiny(t)))
        times.append(time.perf_counter() - t0)
    report["dispatch_floor_ms"] = round(min(times) * 1e3, 2)

    @jax.jit
    def bump(x):  # read n + write n bytes, one dispatch incl. checksum
        y = x + jnp.int8(1)
        return y, jnp.sum(y[::4096].astype(jnp.int32))

    floor = report["dispatch_floor_ms"] / 1e3
    for mb in (int(s) for s in args.sizes_mb.split(",")):
        n = mb * (1 << 20)
        xs = [jnp.asarray(np.full(n, i, dtype=np.int8)) for i in range(2)]
        bump(xs[0])
        best = float("inf")
        for i in range(args.iters):
            v = xs[i % 2]
            t0 = time.perf_counter()
            _y, chk = bump(v)
            _ = int(chk)
            best = min(best, time.perf_counter() - t0)
        gbs = 2 * n / max(best - floor, 1e-9) / 1e9
        report[f"int8_copy_{mb}mb"] = {"s": round(best, 5),
                                       "GBps_rw_minus_floor": round(gbs, 1)}

    if args.layouts:
        # Theory under test: int8 arrays whose two minor dims are tiny
        # (e.g. (..., 26, 3) -> (32, 128) tile padding) cost ~50x their
        # logical bytes in HBM/VMEM traffic.  Same 78 MB logical data in
        # three shapes; if the theory holds, (B, 26, 3) is far slower.
        B = 1_000_000
        r = np.random.default_rng(0)
        base = r.integers(0, 3, size=(B, 26, 3)).astype(np.int8)
        shapes = {
            "B_26_3": [jnp.asarray(base + i) for i in range(2)],
            "3_26_B": [jnp.asarray((base + i).transpose(2, 1, 0).copy())
                       for i in range(2)],
            "flat": [jnp.asarray((base + i).reshape(-1).copy())
                     for i in range(2)],
        }

        @jax.jit
        def work(x):
            y = (x + jnp.int8(1)) * jnp.int8(2)
            return y, jnp.sum(y.reshape(-1)[::4096].astype(jnp.int32))

        for name, xs in shapes.items():
            work(xs[0])
            best = float("inf")
            for i in range(args.iters):
                t0 = time.perf_counter()
                _y, chk = work(xs[i % 2])
                _ = int(chk)
                best = min(best, time.perf_counter() - t0)
            report[f"layout_{name}_ms"] = round(
                (best - floor) * 1e3, 3)

    if args.chain:
        from jax import lax
        shape = (16, 128, 27, 7895)  # the decode micro-batch regime
        r = np.random.default_rng(1)
        xs = [jnp.asarray(r.integers(0, 3, size=shape).astype(np.int8) + i)
              for i in range(2)]
        for n_ops in (4, 16, 48):
            def body(x, n=n_ops):
                for i in range(n):
                    # optimization_barrier forces one materialized tensor
                    # per stage -- models the pipeline's fusion boundaries
                    x = lax.optimization_barrier(x + jnp.int8(1 + i % 2))
                return x

            f = jax.jit(lambda v, b=body: jnp.sum(
                lax.map(b, v)[:, 0, 0, ::512].astype(jnp.int32)))
            f(xs[0])
            best = float("inf")
            for i in range(args.iters):
                v = xs[i % 2]
                t0 = time.perf_counter()
                _ = int(f(v))
                best = min(best, time.perf_counter() - t0)
            el = best - floor
            gb = np.prod(shape) / 1e9
            report[f"chain_{n_ops}ops"] = {
                "s": round(best, 4),
                "ms_per_op": round(el * 1e3 / n_ops, 3),
                "GBps_rw": round(2 * gb * n_ops / el, 1)}
    print(json.dumps(report))


if __name__ == "__main__":
    main()
