"""Chip bisect: phase-2 repair wrong at large gathered batches (round 4).

At 10-20% dirty superframes with the header-damage model, the bench's
phase-2 repair flags ~19% of flagged superframes ok=False on the chip
while the SAME program+data on CPU repairs everything (and the repaired
bytes are correct).  D=101 (808 gathered sf) is chip-clean; D=202
(1616) and D=405 (3240) are not.  Candidate culprits:

  1. the 2-D advanced-indexing gather ws[bi, bj] at large index counts;
  2. the dec_fix lax.map program at >= 13 steps;
  3. data-dependent wrongness in the repair chain itself.

This probe rebuilds the EXACT bench damage for a given D, then on chip:
  g_check   gather ws[bi, bj] vs the numpy gather -- byte equality
  fix_full  dec_fix_sf on all gathered sf -> per-sf ok + byte-diff vs
            the CPU-golden repair of the same gathered slab
  fix_half  same on the first half (the D=101-sized program)
  fix_sfb   same with T3_REPAIR_SFB-style micro-batch 64

Usage: python tools/chip_repair_bisect.py [--d 202] [--frames 8]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=202)
    ap.add_argument("--frames", type=int, default=8)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from ternary_image_codec_tpu.config import (EncoderConfig, ProfileID,
                                                uep_luma_priority)
    from ternary_image_codec_tpu.ops import pipeline

    W, H = 7680, 4320
    n_raw = W * H // 2
    cfg = EncoderConfig(profile=ProfileID.P2_RS26_22,
                        uep=uep_luma_priority())
    sf = cfg.superframe_words
    r = np.random.default_rng(0)
    t = r.integers(0, 3, size=(n_raw, 27)).astype(np.int8)
    t[:, 26] = 0
    raw_np = (t.reshape(n_raw, 9, 3) * np.array([1, 3, 9])).sum(-1) \
        .astype(np.int8)
    n_sf = -(-n_raw // sf)
    pad = n_sf * sf - n_raw
    chunks_np = np.concatenate(
        [raw_np, np.zeros((pad, 9), dtype=np.int8)]).reshape(n_sf, sf, 9)

    D, E, d_iters = args.d, 8, args.frames
    r2 = np.random.default_rng(1)
    total_w = pipeline.build_encode_layout(cfg, sf).total_words
    fi_sf = np.repeat(np.arange(d_iters), D)
    si_sf = np.stack([r2.choice(n_sf, D, replace=False)
                      for _ in range(d_iters)]).reshape(-1)
    fi = np.repeat(fi_sf, E)
    si = np.repeat(si_sf, E)
    bi_ = np.stack([r2.choice(9, E, replace=False)
                    for _ in range(len(fi_sf))]).reshape(-1)
    pi_ = np.stack([
        pipeline.HEADER_WORDS
        + r2.choice(total_w - pipeline.HEADER_WORDS, E, replace=False)
        for _ in range(len(fi_sf))]).reshape(-1)
    dlt = r2.integers(1, 27, size=fi.shape)
    n_hdr = int(round(0.25 * len(fi_sf)))
    sel = np.arange(len(fi_sf))[::-1][:n_hdr]
    hb = np.stack([r2.choice(9, 2, replace=False) for _ in range(n_hdr)])
    hp = r2.integers(0, pipeline.HEADER_WORDS, size=(n_hdr, 2))
    fi = np.concatenate([fi, np.repeat(fi_sf[sel], 2)])
    si = np.concatenate([si, np.repeat(si_sf[sel], 2)])
    bi_ = np.concatenate([bi_, hb.reshape(-1)])
    pi_ = np.concatenate([pi_, hp.reshape(-1)])
    dlt = np.concatenate([dlt, r2.integers(1, 27, size=2 * n_hdr)])

    # encode the d_iters frames (host loop, sf_batch 128) and corrupt
    _l, _d, enc, _dec = pipeline._stream_fns(cfg, 128, rs_mode="check")
    ws = []
    for i in range(1, d_iters + 1):
        b = ((chunks_np + i) % 27).astype(np.int8)
        ws.append(np.asarray(enc(jnp.asarray(b))))
        print(f"encoded frame {i - 1}", flush=True)
    ws = np.stack(ws)                       # (F, n_sf, 9, total)
    ws[fi, si, bi_, pi_] = (ws[fi, si, bi_, pi_] + dlt) % 27

    # the bench's flagged set is exactly the dirty (fi_sf, si_sf) pairs
    order = np.lexsort((si_sf, fi_sf))
    bi_g, bj_g = fi_sf[order], si_sf[order]
    wj = jnp.asarray(ws)

    # 1) gather check
    g_dev = np.asarray(jax.jit(lambda w, i, j: w[i, j])(
        wj, jnp.asarray(bi_g), jnp.asarray(bj_g)))
    g_np = ws[bi_g, bj_g]
    print(f"gather bytes equal: {np.array_equal(g_dev, g_np)}", flush=True)

    # CPU golden repair of the gathered slab
    cpu = jax.devices("cpu")[0]
    def run_fix(slab, sfb):
        _l2, _d2, _e2, fix = pipeline._stream_fns(cfg, sfb,
                                                  rs_mode="paged",
                                                  ok_per_sf=True,
                                                  hdr_all_pages=True)
        return fix(jnp.asarray(slab))

    with jax.default_device(cpu):
        gfix, gok = run_fix(g_np, 128)
        gfix, gok = np.asarray(gfix), np.asarray(gok)
    print(f"CPU golden: ok_all={bool(gok.all())}", flush=True)

    for name, slab, gold_fix, gold_ok, sfb in [
            ("fix_full", g_np, gfix, gok, 128),
            ("fix_half", g_np[:len(bi_g) // 2], gfix[:len(bi_g) // 2],
             gok[:len(bi_g) // 2], 128),
            ("fix_sfb64", g_np, gfix, gok, 64)]:
        dfix, dok = run_fix(slab, sfb)
        dfix, dok = np.asarray(dfix), np.asarray(dok)
        nbad_ok = int((dok != gold_ok[:dok.shape[0]]).sum())
        nbad_by = int((dfix != gold_fix[:dfix.shape[0]]).sum())
        print(f"{name}: ok_all={bool(dok.all())} ok_mismatch={nbad_ok} "
              f"byte_mismatch={nbad_by}", flush=True)


if __name__ == "__main__":
    main()
