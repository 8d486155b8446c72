"""Chip-vs-CPU bit-exactness check for the P5 fused (snake-composed) path.

The XLA:TPU backend here MISCOMPILES some vmapped int8 dot_generals with
joint contracting dims (docs/PERF.md "XLA:TPU miscompile"); any new
multi-dim contraction must be verified under vmap on the chip before it
ships.  The fused P5 encode contracts (27, 54) jointly and the fused
decode contracts (3, 3, 26) with a pair batch dim -- this probe runs the
full v3 P5 encode+decode vmapped over a 128-superframe batch on the chip
and diffs every wire/output byte against a CPU golden (computed by a
subprocess forced onto the CPU backend).

Round 3 adds --tile WxH (default 26x26) and --beacon so the general
id/rev fuse (_rev702 / _rev_windows / _flip_mask) and the P5+beacon
composition can be swept on chip; `--tile all` runs a representative
matrix (half-fuse, block-aligned rev, window classes, odd h, beacon).

Usage: python tools/chip_p5_verify.py [--batch 128] [--sf 8192]
                                      [--tile WxH|all] [--beacon]
Prints one JSON verdict line per (tile, beacon) combination.
"""
import argparse
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build(sf, batch, tile=(26, 26), beacon=False):
    import jax.numpy as jnp
    from ternary_image_codec_tpu.config import (EncoderConfig, ProfileID,
                                                SparseBeaconCfg, Tile2D,
                                                uep_luma_priority)
    from ternary_image_codec_tpu.ops import pipeline

    cfg = EncoderConfig(profile=ProfileID.P5_RS26_22_2D,
                        uep=uep_luma_priority(), tile=Tile2D(*tile),
                        beacon=(SparseBeaconCfg(13, 4, True) if beacon
                                else SparseBeaconCfg()),
                        superframe_words=sf)
    r = np.random.default_rng(7)
    t = r.integers(0, 3, size=(batch, sf, 27)).astype(np.int8)
    t[:, :, 26] = 0
    raw = (t.reshape(batch, sf, 9, 3) * np.array([1, 3, 9])).sum(-1) \
        .astype(np.int8).transpose(0, 2, 1)      # planes (B, 9, sf)
    return cfg, pipeline, jnp.asarray(raw)


def run(sf, batch, rs_mode, tile, beacon):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    cfg, pipeline, raw = _build(sf, batch, tile, beacon)
    from ternary_image_codec_tpu.config import SuperframeHeader
    layout = pipeline.build_encode_layout(cfg, sf)
    hdr = SuperframeHeader(profile=cfg.profile, uep=cfg.uep, tile=cfg.tile,
                           seed=cfg.seed, beacon=cfg.beacon,
                           subword=cfg.subword, centered=cfg.centered,
                           coset=cfg.coset)
    dlay = pipeline.build_decode_layout(
        hdr, layout.total_words - pipeline.HEADER_WORDS)
    enc = pipeline._encode_fn(layout, wire="planes", raw_wire="planes")
    dec = pipeline._decode_body_fn(dlay, rs_mode, wire="planes")

    @jax.jit
    def step(rb):
        w = jax.vmap(enc)(rb)
        out, ok = jax.vmap(dec)(w[:, :, pipeline.HEADER_WORDS:])
        return w, out, ok

    w, out, ok = step(raw)
    return np.asarray(w), np.asarray(out), np.asarray(ok)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--sf", type=int, default=8192)
    ap.add_argument("--rs-mode", default="check")
    ap.add_argument("--tile", default="26x26",
                    help="WxH, or 'all' for the representative matrix")
    ap.add_argument("--beacon", action="store_true")
    ap.add_argument("--cpu-golden", metavar="OUT_NPZ",
                    help="internal: compute on CPU and save")
    args = ap.parse_args()

    if args.cpu_golden:
        import jax
        jax.config.update("jax_platforms", "cpu")
        w_, h_ = map(int, args.tile.split("x"))
        w, out, ok = run(args.sf, args.batch, args.rs_mode, (w_, h_),
                         args.beacon)
        np.savez(args.cpu_golden, w=w, out=out, ok=ok)
        return

    if args.tile == "all":
        # half-fuse (26x26), per-flip-class (13x7, 26x5), stream-rev
        # encode + win/stream-rev decode (5x5 Pw=5/Pa=25, 7x3 Pw=7/Pa=7,
        # 25x25 Pw=25/Pa=625, 8x4 even-h Pw=4/Pa=16), and beacon combos
        matrix = [((26, 26), False), ((13, 7), False), ((26, 5), False),
                  ((5, 5), False), ((7, 3), False), ((25, 25), False),
                  ((8, 4), False), ((26, 26), True), ((5, 5), True)]
    else:
        w_, h_ = map(int, args.tile.split("x"))
        matrix = [((w_, h_), args.beacon)]

    bad = 0
    for tile, beacon in matrix:
        tl = f"{tile[0]}x{tile[1]}"
        with tempfile.NamedTemporaryFile(suffix=".npz") as f:
            print(f"computing CPU golden ({tl} beacon={beacon})...",
                  file=sys.stderr)
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--batch", str(args.batch), "--sf", str(args.sf),
                   "--rs-mode", args.rs_mode, "--tile", tl,
                   "--cpu-golden", f.name]
            if beacon:
                cmd.append("--beacon")
            subprocess.run(cmd, check=True)
            g = np.load(f.name)
            print(f"running on chip ({tl} beacon={beacon})...",
                  file=sys.stderr)
            w, out, ok = run(args.sf, args.batch, args.rs_mode, tile,
                             beacon)
            verdict = {
                "rs_mode": args.rs_mode,
                "batch": args.batch,
                "tile": tl,
                "beacon": beacon,
                "wire_equal": bool(np.array_equal(w, g["w"])),
                "wire_bad_cells": int((w != g["w"]).sum()),
                "out_equal": bool(np.array_equal(out, g["out"])),
                "out_bad_cells": int((out != g["out"]).sum()),
                "ok_equal": bool(np.array_equal(ok, g["ok"])),
                "ok_all": bool(ok.all()),
            }
            bad += not (verdict["wire_equal"] and verdict["out_equal"]
                        and verdict["ok_equal"])
            print(json.dumps(verdict))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
