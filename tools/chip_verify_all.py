"""ONE-command chip gate: every chip-vs-CPU verification sweep in one run.

Five XLA:TPU miscompile sightings (docs/PERF.md "XLA:TPU miscompile")
established that correctness on this backend is a property of each fused
PROGRAM x SHAPE combination, not of individual dot shapes -- so every
shipped combination must be chip-verified against CPU goldens before any
default flips.  The rule used to be three separate manual commands
(chip_v3_verify, chip_p5_verify --tile all, main_bare); forgetting one is
exactly how a sixth sighting ships.  This gate runs all of them and
prints ONE JSON verdict line:

    python tools/chip_verify_all.py            # full gate (~all sweeps)
    python tools/chip_verify_all.py --quick    # v3 at sfb=4 only + main_bare

Legs:
  v3      tools/chip_v3_verify.py 4 128 -- config x batch matrix (6 cfgs,
          enc/dec/paged/auto/full legs) + the public word-major RS API
          (k x B matrix; sighting #4's program)
  p5      tools/chip_p5_verify.py --tile all -- P5 tile matrix incl.
          beacon combos, Pw = 4/5/7/25 (sightings #1/2/5a/5b's programs)
  bare    python -m ternary_image_codec_tpu.cli.main_bare -- the
          reference-mirroring self-tests on the live backend (C15)

Exit 0 iff every leg passes.  Each leg runs as a subprocess so a hang or
crash in one cannot mask the others; per-leg stdout is teed to
/tmp/chip_verify_all.<leg>.log.
"""
import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_leg(name, cmd, timeout):
    log = f"/tmp/chip_verify_all.{name}.log"
    t0 = time.time()
    try:
        with open(log, "wb") as f:
            p = subprocess.run(cmd, cwd=ROOT, stdout=f,
                               stderr=subprocess.STDOUT, timeout=timeout)
        rc = p.returncode
    except subprocess.TimeoutExpired:
        rc = -1
    dt = time.time() - t0
    tail = ""
    try:
        with open(log, "rb") as f:
            tail = f.read().decode(errors="replace").strip().splitlines()
            tail = tail[-1] if tail else ""
    except OSError:
        pass
    return {"leg": name, "ok": rc == 0, "rc": rc, "secs": round(dt, 1),
            "log": log, "last_line": tail[-200:]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="v3 sweep at sfb=4 only + main_bare (smoke)")
    ap.add_argument("--timeout", type=int, default=5400,
                    help="per-leg timeout in seconds (first compiles over "
                    "the remote tunnel can take many minutes)")
    args = ap.parse_args()
    py = sys.executable

    legs = [("v3", [py, "tools/chip_v3_verify.py"]
             + (["4"] if args.quick else ["4", "128"]))]
    if not args.quick:
        legs.append(("p5", [py, "tools/chip_p5_verify.py", "--tile", "all"]))
    legs.append(("bare", [py, "-m", "ternary_image_codec_tpu.cli.main_bare",
                          "--outdir", "/tmp"]))

    results = [run_leg(n, c, args.timeout) for n, c in legs]
    ok = all(r["ok"] for r in results)
    print(json.dumps({"chip_verify_all": "PASS" if ok else "FAIL",
                      "quick": args.quick, "legs": results}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
