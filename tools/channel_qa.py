"""Channel-robustness QA: recovery / flagged / miscorrection rates per
RS profile under random symbol errors.

The reference only ever self-tested at exactly t injected errors
(selftest_rs_unit, old/.../v6_min.hpp:1172-1207).  This sweeps error
counts from 0 to beyond capacity and reports, per profile:

  exact    -- decoded == sent and ok=True
  flagged  -- ok=False (failure detected)
  miscorr  -- ok=True but decoded != sent (landed inside another
              codeword's decode sphere; inherent to RS, see README)

Usage: python tools/channel_qa.py [--blocks 2048] [--json] [--chip]
Forces CPU by default (the sitecustomize hook pins the axon TPU backend
and env vars alone cannot override it, CLAUDE.md); --chip keeps the TPU.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="channel_qa")
    ap.add_argument("--blocks", type=int, default=2048)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--chip", action="store_true",
                    help="run on the real TPU backend instead of CPU")
    args = ap.parse_args(argv)

    import jax
    if not args.chip:
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

    import numpy as np
    import jax.numpy as jnp
    from ternary_image_codec_tpu.ops import rs

    r = np.random.default_rng(args.seed)
    B = args.blocks
    report = {}
    for k in (24, 22, 20, 18):
        t = (26 - k) // 2
        rows = {}
        data = r.integers(0, 27, size=(B, k))
        cw = rs.np_encode(data, k)
        exp = np.stack([data % 3, data // 3 % 3, data // 9 % 3],
                       axis=-1).astype(np.int8)
        for ne in range(0, 2 * t + 2):
            recv = cw.copy()
            for i in range(B):
                pos = r.choice(26, ne, replace=False)
                recv[i, pos] = (recv[i, pos]
                                + r.integers(1, 27, size=ne)) % 27
            dig = np.stack([recv % 3, recv // 3 % 3, recv // 9 % 3],
                           axis=-1).astype(np.int8)
            out, ok = rs.decode_dig(jnp.asarray(dig), k)
            okn = np.asarray(ok)
            exact = okn & np.all(np.asarray(out) == exp, axis=(1, 2))
            rows[ne] = {
                "exact": round(float(exact.mean()), 4),
                "flagged": round(float((~okn).mean()), 4),
                "miscorr": round(float((okn & ~exact).mean()), 4),
            }
            if not args.json:
                print(f"RS(26,{k}) ne={ne}: {rows[ne]}", flush=True)
        report[f"RS(26,{k}) t={t}"] = rows

    if args.json:
        print(json.dumps(report, indent=2))
    else:
        for prof, rows in report.items():
            print(f"== {prof}")
            print("  errs  exact  flagged  miscorr")
            for ne, m in rows.items():
                print(f"  {ne:4d}  {m['exact']:.3f}  {m['flagged']:7.3f}"
                      f"  {m['miscorr']:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
