"""Chip-vs-CPU full-byte verification of the v3 encode/decode paths.

XLA:TPU on this backend MISCOMPILES certain int8 dot_general shapes under
vmap (docs/PERF.md "XLA:TPU miscompile"): bit-exact on CPU and at batch 1,
wrong at production batch sizes.  Any change to the v3 contractions must
therefore be verified ON CHIP against a CPU golden at a realistic vmap
batch -- this tool does that for a matrix of configs (profiles, UEP
shapes, beacon, P5) under the CURRENT env knobs:

    python tools/chip_v3_verify.py [sf_batch ...]

Prints one line per (config, sf_batch): encode byte-diff count vs the CPU
golden, decode ok flag, and decoded byte equality.  Exit code 1 on any
mismatch.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from ternary_image_codec_tpu.config import (EncoderConfig, ProfileID,
                                                SparseBeaconCfg, Tile2D,
                                                uep_luma_priority,
                                                uep_uniform)
    from ternary_image_codec_tpu.ops import pipeline

    def raw_words(n, seed):
        r = np.random.default_rng(seed)
        t = r.integers(0, 3, size=(n, 27)).astype(np.int8)
        t[:, 26] = 0
        return (t.reshape(n, 9, 3) * np.array([1, 3, 9])).sum(-1) \
            .astype(np.int8)

    cfgs = [
        ("P2+luma", EncoderConfig(profile=ProfileID.P2_RS26_22,
                                  uep=uep_luma_priority())),
        ("P2+luma+beacon", EncoderConfig(profile=ProfileID.P2_RS26_22,
                                         uep=uep_luma_priority(),
                                         beacon=SparseBeaconCfg(13, 4, True))),
        ("P1+uniform", EncoderConfig(profile=ProfileID.P1_RS26_24,
                                     uep=uep_uniform(0))),
        ("P1+uniform+beacon",
         EncoderConfig(profile=ProfileID.P1_RS26_24, uep=uep_uniform(0),
                       beacon=SparseBeaconCfg(13, 4, True))),
        ("P3+uniform", EncoderConfig(profile=ProfileID.P3_RS26_20,
                                     uep=uep_uniform(2))),
        ("P5+luma", EncoderConfig(profile=ProfileID.P5_RS26_22_2D,
                                  uep=uep_luma_priority(),
                                  tile=Tile2D(26, 26))),
    ]
    batches = [int(a) for a in sys.argv[1:]] or [4, 128]
    cpu = jax.devices("cpu")[0]
    bad = 0
    # Public word-major RS API at SMALL batch: the k=22 B=1 decode chain
    # is miscompile sighting #4 (docs/PERF.md; main_bare's RS unit runs
    # exactly this program) -- sweep every (k, B) the self-tests and API
    # users dispatch, against the numpy oracle
    from ternary_image_codec_tpu.ops import rs
    for k in (24, 22, 20, 18):
        t = (26 - k) // 2
        for B in (1, 2, 8):
            r = np.random.default_rng(50 + k + B)
            data = r.integers(0, 27, size=(B, k)).astype(np.int8)
            recv = np.asarray(rs.np_encode(data, k))
            for b in range(B):
                for p in r.choice(26, size=t, replace=False):
                    recv[b, p] = (recv[b, p] + 1 + r.integers(0, 26)) % 27
            dec, ok = rs.decode_jit(jnp.asarray(recv), k)
            good = (bool(np.all(np.asarray(ok)))
                    and np.array_equal(np.asarray(dec)[:, :k], data))
            bad += not good
            print(f"{'OK' if good else 'FAIL'} rs_api k={k} B={B} "
                  f"(word-major decode_jit, t={t} errors)")
    for sfb in batches:
        for name, cfg in cfgs:
            n = cfg.superframe_words * sfb * 2 + 77
            raw = raw_words(n, 3)
            with jax.default_device(cpu):
                gold = np.asarray(pipeline.encode_stream_superframes(
                    jnp.asarray(raw), cfg, sf_batch=sfb))
            prof = np.asarray(pipeline.encode_stream_superframes(
                jnp.asarray(raw), cfg, sf_batch=sfb))
            ndiff = int((prof != gold).sum())
            out, ok = pipeline.decode_stream_superframes(
                jnp.asarray(gold), cfg, n, sf_batch=sfb)
            dec_ok = bool(ok) and np.array_equal(np.asarray(out), raw)
            # dirty leg: exercises the paged repair dispatch (incl. the
            # T3_RS_MIXED merged chain when enabled) against a CPU golden
            dirty = gold.copy()
            dirty[0, 500, 4] = (dirty[0, 500, 4] + 1) % 27
            dirty[1, 77, 0] = (dirty[1, 77, 0] + 2) % 27
            with jax.default_device(cpu):
                gout, gok = pipeline.decode_stream_superframes(
                    jnp.asarray(dirty), cfg, n, sf_batch=sfb,
                    strategy="paged")
                gout, gok = np.asarray(gout), bool(gok)
            dout, dok = pipeline.decode_stream_superframes(
                jnp.asarray(dirty), cfg, n, sf_batch=sfb, strategy="paged")
            fix_ok = (bool(dok) == gok
                      and np.array_equal(np.asarray(dout), gout))
            # auto-strategy dirty leg: the production two-phase path runs
            # a DIFFERENT fused program (check decode + gather + paged
            # repair + scatter merge in one dispatch, re-batched by
            # T3_REPAIR_SFB) -- miscompile safety is per fused PROGRAM
            # (docs/PERF.md "third sighting"), so it gets its own sweep
            # at the repair batch sizes the benches actually dispatch
            with jax.default_device(cpu):
                ga_out, ga_ok = pipeline.decode_stream_superframes(
                    jnp.asarray(dirty), cfg, n, sf_batch=sfb,
                    strategy="auto")
                ga_out, ga_ok = np.asarray(ga_out), bool(ga_ok)
            aout, aok = pipeline.decode_stream_superframes(
                jnp.asarray(dirty), cfg, n, sf_batch=sfb, strategy="auto")
            auto_ok = (bool(aok) == ga_ok
                       and np.array_equal(np.asarray(aout), ga_out))
            # fused-strategy dirty leg (round 5): the ONE-dispatch
            # two-phase decode (check + stable-argsort compaction +
            # bounded paged repair + scatter, pipeline._fused_auto_fn)
            # is yet another fused PROGRAM -- its own chip sweep, with a
            # window wider than the dirty set so the clean-slot padding
            # path executes too
            with jax.default_device(cpu):
                gu_out, gu_ok = pipeline.decode_stream_superframes(
                    jnp.asarray(dirty), cfg, n, sf_batch=sfb,
                    strategy="fused", repair_cap=4)
                gu_out, gu_ok = np.asarray(gu_out), bool(gu_ok)
            uout, uok = pipeline.decode_stream_superframes(
                jnp.asarray(dirty), cfg, n, sf_batch=sfb,
                strategy="fused", repair_cap=4)
            fused_ok = (bool(uok) == gu_ok
                        and np.array_equal(np.asarray(uout), gu_out))
            # full-mode leg: the v3 unconditional-chain decode (round 3)
            with jax.default_device(cpu):
                gf_out, gf_ok = pipeline.decode_stream_superframes(
                    jnp.asarray(dirty), cfg, n, sf_batch=sfb,
                    strategy="full")
                gf_out, gf_ok = np.asarray(gf_out), bool(gf_ok)
            fout, fok = pipeline.decode_stream_superframes(
                jnp.asarray(dirty), cfg, n, sf_batch=sfb, strategy="full")
            full_ok = (bool(fok) == gf_ok
                       and np.array_equal(np.asarray(fout), gf_out))
            status = ("OK" if (ndiff == 0 and dec_ok and fix_ok and auto_ok
                              and fused_ok and full_ok)
                      else "FAIL")
            bad += status == "FAIL"
            print(f"{status} sfb={sfb:<4} {name:<18} "
                  f"enc_diff={ndiff} dec_ok={bool(ok)} dec_exact={dec_ok} "
                  f"paged_fix_exact={fix_ok} auto_fix_exact={auto_ok} "
                  f"fused_fix_exact={fused_ok} full_exact={full_ok}")
            if ndiff:
                w = np.argwhere(prof != gold)
                print(f"     first wrong: {w[:3].tolist()} "
                      f"bands={np.unique(w[:, 2]).tolist()}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
