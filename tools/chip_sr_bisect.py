"""Chip bisect: which stage of the stream-rev P5 encode miscompiles?

chip_p5_verify (round 4): the stream-rev encode produces wrong wire
cells at vmap batch 128 for tiles 5x5 (Pw=5) and 25x25 (Pw=25) while
7x3 (Pw=7) and 8x4 (Pw=4) are bit-exact -- CPU is exact everywhere.
This probe stages a random st (B, n7, 3, 234) and compares chip vs CPU
for each stage and for restructured variants of the rev dots:

  s_rev    the shipped _rev_mask rev class dots (3 deltas, no mask)
  s_mask   full _rev_mask (rev + where)
  s_fold   _rev_mask + the 3 digit fold dots
  v_roll   rev dots with jnp.roll instead of pad+slice views
  v_s32    delta sum in s32, single s8 convert
  v_percls Pw separate NON-batched dots on stride-Pw views
  v_2dot   self class dot + combined-neighbor narrow class dot

Usage: python tools/chip_sr_bisect.py [--pw 5] [--batch 128]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pw", type=int, default=5)
    ap.add_argument("--w", type=int, default=5)
    ap.add_argument("--h", type=int, default=5)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--n7", type=int, default=341)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax import lax
    from ternary_image_codec_tpu.ops import pipeline_v3 as v3

    B, N7 = args.batch, args.n7
    Rsr, Pw = v3._stream_rev(args.w)
    assert Pw == args.pw, (Pw, args.pw)
    n7p = -(-N7 // Pw) * Pw
    Rj = jnp.asarray(Rsr)
    mask = jnp.asarray(v3._stream_flip_mask(N7, args.w, args.h))
    W2 = jnp.asarray(v3._fold234_enc())

    rng = np.random.default_rng(0)
    st_np = rng.integers(0, 3, size=(B, N7, 3, 234), dtype=np.int8)
    st = jnp.asarray(st_np)

    def rev_only(x):
        stp = jnp.pad(x, ((1, 1 + n7p - N7), (0, 0), (0, 0)))
        rev = sum(
            lax.dot_general(
                lax.slice_in_dim(stp, dlt, dlt + n7p, axis=0)
                .reshape(n7p // Pw, Pw, 3, 234),
                Rj[dlt], (((3,), (1,)), ((1,), (0,))),
                preferred_element_type=jnp.int32)
            .astype(jnp.int8)
            for dlt in range(3))
        return rev.transpose(1, 0, 2, 3).reshape(n7p, 3, 234)[:N7]

    def with_mask(x):
        return jnp.where(mask, rev_only(x), x)

    def with_fold(x):
        sti = with_mask(x)
        return jnp.stack(
            [lax.dot_general(sti[:, d], W2, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
             .astype(jnp.int8) for d in range(3)], axis=3)

    def v_roll(x):
        xp = jnp.pad(x, ((0, n7p - N7), (0, 0), (0, 0)))
        rev = sum(
            lax.dot_general(
                jnp.roll(xp, 1 - dlt, axis=0).reshape(n7p // Pw, Pw, 3, 234),
                Rj[dlt], (((3,), (1,)), ((1,), (0,))),
                preferred_element_type=jnp.int32)
            .astype(jnp.int8)
            for dlt in range(3))
        return rev.transpose(1, 0, 2, 3).reshape(n7p, 3, 234)[:N7]

    def v_s32(x):
        stp = jnp.pad(x, ((1, 1 + n7p - N7), (0, 0), (0, 0)))
        rev = sum(
            lax.dot_general(
                lax.slice_in_dim(stp, dlt, dlt + n7p, axis=0)
                .reshape(n7p // Pw, Pw, 3, 234),
                Rj[dlt], (((3,), (1,)), ((1,), (0,))),
                preferred_element_type=jnp.int32)
            for dlt in range(3))
        return rev.astype(jnp.int8).transpose(1, 0, 2, 3) \
            .reshape(n7p, 3, 234)[:N7]

    def v_percls(x):
        stp = jnp.pad(x, ((1, 1 + n7p - N7), (0, 0), (0, 0)))
        outs = []
        for cls in range(Pw):
            acc = 0
            for dlt in range(3):
                v = lax.slice_in_dim(stp, dlt + cls, dlt + cls + n7p - Pw + 1,
                                     axis=0)[::Pw]          # (G, 3, 234)
                acc = acc + lax.dot_general(
                    v, Rj[dlt, cls], (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
            outs.append(acc.astype(jnp.int8))
        rev = jnp.stack(outs, axis=1)        # (G, Pw, 3, 234)
        return rev.reshape(n7p, 3, 234)[:N7]

    def v_2dot(x):
        stp = jnp.pad(x, ((1, 1 + n7p - N7), (0, 0), (0, 0)))
        W = 32
        Rn = np.zeros((Pw, 2 * W, 234), dtype=np.int8)
        Rfull = np.asarray(Rsr)
        Rn[:, :W] = Rfull[0][:, 234 - W:]
        Rn[:, W:] = Rfull[2][:, :W]
        Rnj = jnp.asarray(np.swapaxes(Rn, 1, 1))
        self_r = lax.dot_general(
            lax.slice_in_dim(stp, 1, 1 + n7p, axis=0)
            .reshape(n7p // Pw, Pw, 3, 234),
            Rj[1], (((3,), (1,)), ((1,), (0,))),
            preferred_element_type=jnp.int32).astype(jnp.int8)
        nbr = jnp.concatenate(
            [lax.slice_in_dim(stp, 0, n7p, axis=0)[:, :, 234 - W:],
             lax.slice_in_dim(stp, 2, 2 + n7p, axis=0)[:, :, :W]],
            axis=2)
        nbr_r = lax.dot_general(
            nbr.reshape(n7p // Pw, Pw, 3, 2 * W), Rnj,
            (((3,), (1,)), ((1,), (0,))),
            preferred_element_type=jnp.int32).astype(jnp.int8)
        rev = (self_r + nbr_r).transpose(1, 0, 2, 3) \
            .reshape(n7p, 3, 234)[:N7]
        return rev

    cpu = jax.devices("cpu")[0]
    legs = [("s_rev", rev_only), ("s_mask", with_mask),
            ("s_fold", with_fold), ("v_roll", v_roll), ("v_s32", v_s32),
            ("v_percls", v_percls), ("v_2dot", v_2dot)]
    for name, fn in legs:
        f = jax.jit(jax.vmap(fn))
        dev = np.asarray(f(st))
        with jax.default_device(cpu):
            gold = np.asarray(jax.jit(jax.vmap(fn))(st))
        nbad = int((dev != gold).sum())
        first = np.argwhere(dev != gold)[:2].tolist() if nbad else []
        print(f"{name}: bad_cells={nbad} first={first}", flush=True)


if __name__ == "__main__":
    main()
