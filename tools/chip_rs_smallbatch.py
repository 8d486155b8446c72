"""Chip bisect: batch-1 k=22 word-major RS decode miscompile (sighting #4).

Round-3 VERDICT: `rs.decode_jit` (the public word-major API) at k=22,
batch 1, t=2 errors returns ok=False deterministically on the axon
backend while k=24/20/18 pass, batch 8 passes, and CPU is correct --
the per-program XLA:TPU miscompile family (docs/PERF.md).  main_bare's
"RS unit" self-test goes through exactly this entry point.

This probe (run on the live backend):
  1. reproduces the failure matrix (k x batch) for the word-major chain;
  2. bisects the failing stage by comparing each chain stage's device
     output against the CPU-computed golden (syndromes / BM sigma /
     Chien / Forney / final);
  3. times + checks the candidate fixes at the same shapes:
     a. pm-routed decode (transpose to (3, 26, B) plane-major, the
        chip-proven _correct_pm chain, transpose back);
     b. pad-B-to-8 word-major.

Usage: python tools/chip_rs_smallbatch.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from ternary_image_codec_tpu.ops import rs

    rng = np.random.default_rng(1)

    def mk_case(k, B, t, seed):
        r = np.random.default_rng(seed)
        data = r.integers(0, 27, size=(B, k)).astype(np.int8)
        code = np.asarray(rs.np_encode(data, k))
        recv = code.copy()
        for b in range(B):
            pos = r.choice(26, size=t, replace=False)
            for p in pos:
                recv[b, p] = (recv[b, p] + 1 + r.integers(0, 26)) % 27
        return data, recv

    print("=== 1. failure matrix (word-major decode_jit) ===", flush=True)
    import functools
    fails = {}
    for k in (24, 22, 20, 18):
        t = (26 - k) // 2
        for B in (1, 2, 4, 8):
            nbad = 0
            for s in range(10):
                data, recv = mk_case(k, B, t, 100 * k + 10 * B + s)
                dec, ok = rs.decode_jit(jnp.asarray(recv), k)
                if not (bool(np.all(np.asarray(ok)))
                        and np.array_equal(np.asarray(dec)[:, :k], data)):
                    nbad += 1
            fails[(k, B)] = nbad
            print(f"  k={k} B={B}: {nbad}/10 bad", flush=True)

    print("=== 2. stage bisect at k=22 B=1 ===", flush=True)
    k, B, t = 22, 1, 2
    data, recv = mk_case(k, B, t, 4221)
    rd = rs.sym_to_dig(jnp.asarray(recv))

    cpu = jax.devices("cpu")[0] if any(
        d.platform == "cpu" for d in jax.devices("cpu")) else None

    def both(fn, *args):
        """Run fn jitted on default device and on CPU; return numpy."""
        dev = np.asarray(jax.jit(fn)(*args))
        with jax.default_device(cpu):
            gold = np.asarray(jax.jit(fn)(*args))
        return dev, gold

    # stage 1: syndromes
    f_syn = lambda x: rs.syndromes_dig(x, k)
    s_dev, s_cpu = both(f_syn, rd)
    print(f"  syndromes match: {np.array_equal(s_dev, s_cpu)}", flush=True)

    # stage 2: full correct chain, then walk inner pieces if needed
    f_cor = lambda x, s: rs._correct_dig(x, s, k)
    d_dev, d_cpu = both(lambda x, s: f_cor(x, s)[0], rd, jnp.asarray(s_cpu))
    o_dev, o_cpu = both(lambda x, s: f_cor(x, s)[1], rd, jnp.asarray(s_cpu))
    print(f"  correct(data) match: {np.array_equal(d_dev, d_cpu)}; "
          f"ok dev={o_dev} cpu={o_cpu}", flush=True)

    # stage 3: BM core on CPU-syndromes
    r_ = 26 - k
    S3d = jnp.asarray(s_cpu).transpose(0, 2, 1).reshape(B, 3, r_) \
        .transpose(0, 2, 1)  # guess layout; fallback below
    try:
        f_bm = lambda s: rs._berlekamp_massey(s, r_, r_ // 2)
        sd, sc = both(f_bm, jnp.asarray(s_cpu))
        print(f"  BM sigma match: {np.array_equal(sd, sc)}", flush=True)
    except Exception as e:
        print(f"  BM probe skipped ({type(e).__name__}: {e})", flush=True)

    print("=== 3. candidate fixes at k=22 B=1 ===", flush=True)
    # (a) pm-routed
    def dec_pm(recv):
        rd = rs.sym_to_dig(recv)                     # (B, 26, 3)
        pm = rd.transpose(2, 1, 0)                   # (3, 26, B)
        d, ok = rs._correct_pm(pm, rs.syndromes_pm(pm, k), k)
        return rs.dig_to_sym(d.transpose(2, 1, 0)).astype(jnp.int8), ok
    nbad = 0
    for s in range(10):
        data, recv = mk_case(k, B, t, 777 + s)
        dec, ok = jax.jit(dec_pm)(jnp.asarray(recv))
        if not (bool(np.all(np.asarray(ok)))
                and np.array_equal(np.asarray(dec)[:, :k], data)):
            nbad += 1
    print(f"  pm-routed: {nbad}/10 bad", flush=True)

    # (a2) pm-routed with B padded to 8
    def dec_pm8(recv):
        rd = rs.sym_to_dig(recv)
        pm = jnp.pad(rd.transpose(2, 1, 0), ((0, 0), (0, 0), (0, 7)))
        d, ok = rs._correct_pm(pm, rs.syndromes_pm(pm, k), k)
        return (rs.dig_to_sym(d.transpose(2, 1, 0)[:1]).astype(jnp.int8),
                ok[:1])
    nbad = 0
    for s in range(10):
        data, recv = mk_case(k, B, t, 777 + s)
        dec, ok = jax.jit(dec_pm8)(jnp.asarray(recv))
        if not (bool(np.all(np.asarray(ok)))
                and np.array_equal(np.asarray(dec)[:, :k], data)):
            nbad += 1
    print(f"  pm-routed padB=8: {nbad}/10 bad", flush=True)

    # (b) pad-B word-major
    def dec_pad(recv):
        rp = jnp.pad(recv, ((0, 7), (0, 0)))
        d, ok = rs.decode(rp, k)
        return d[:1], ok[:1]
    nbad = 0
    for s in range(10):
        data, recv = mk_case(k, B, t, 777 + s)
        dec, ok = jax.jit(dec_pad)(jnp.asarray(recv))
        if not (bool(np.all(np.asarray(ok)))
                and np.array_equal(np.asarray(dec)[:, :k], data)):
            nbad += 1
    print(f"  word-major padB=8: {nbad}/10 bad", flush=True)

    print("=== 4. full k x B matrix for pm-routed ===", flush=True)
    for k2 in (24, 22, 20, 18):
        t2 = (26 - k2) // 2
        for B2 in (1, 2, 4, 8):
            nbad = 0
            for s in range(10):
                data, recv = mk_case(k2, B2, t2, 900 + 100 * k2 + 10 * B2 + s)
                def dpm(recv, k2=k2):
                    rd = rs.sym_to_dig(recv)
                    pm = rd.transpose(2, 1, 0)
                    d, ok = rs._correct_pm(pm, rs.syndromes_pm(pm, k2), k2)
                    return (rs.dig_to_sym(d.transpose(2, 1, 0))
                            .astype(jnp.int8), ok)
                dec, ok = jax.jit(dpm)(jnp.asarray(recv))
                if not (bool(np.all(np.asarray(ok)))
                        and np.array_equal(np.asarray(dec)[:, :k2], data)):
                    nbad += 1
            print(f"  pm k={k2} B={B2}: {nbad}/10 bad", flush=True)


if __name__ == "__main__":
    main()
