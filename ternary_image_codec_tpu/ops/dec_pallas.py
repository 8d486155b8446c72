"""Fused Pallas TPU kernel for the superframe CHECK decode.

One kernel instance consumes one superframe body in wire-planes layout
(9, H) and emits the extracted RAW words plus a per-superframe clean
flag, doing EVERYTHING in VMEM:

    digit unpack (f32 divmod) -> descramble (parity-select offsets)
    -> full syndrome check per band (MXU dot) -> k-column extract
    -> 13-block-periodic stream restride -> word assembly (MXU dots)

The XLA implementation of the same path (pipeline._decode_body_fn_pm2,
rs_mode="check") materializes ~2 dozen intermediates per micro-batch in
HBM; at ~40 us per materialized op per 128-superframe micro-batch that is
the dominant decode cost on clean streams (docs/PERF.md).  This kernel
replaces the chain with ONE HBM read of the body and ONE write of the
output words per superframe.

Mosaic op-set notes (probed on the v5e toolchain): lane-dim (minor)
reshapes must be 128-aligned; sublane/leading splits+merges, arbitrary
3D/4D permutations, 2D matmuls, and rank-3 LHS single-dim contractions
are supported; strided slices and multi-dim contractions are not.  The
layout plan below is built entirely from the supported set:

  body (9, H) --T--> (H, 9) --split--> (nblk, 26, 9) --perm-->
  w_cp (9, 26, nblk)  [column-phase-major: block index minor]

Descramble offsets collapse to a (27, 26) constant because 26 is even:
grid cell h = 26*blk + c has the parity of c.

Per band-k group the stream flatten j = blk*k + c is 13-block periodic
(13*k = (k/2)*26 for even k), so the restride (c, blk) -> (m, e) is one
square permutation contraction per superblock lane, and the word-grid
row index m = (k/2)*s + m' is exactly a (s-major, m'-minor) leading-dim
merge of the per-m' assembly slabs.

Scope: uniform no-beacon layouts with even per-band k (the production
streaming configs).  Beacon/P5 configs fall back to the XLA path.
Reference semantics: the in-place decode loop of
old/include/ternary_image_codec_v6_min.hpp:938-993 (check+extract).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import rs
from ..config import NUM_BANDS


def _fmod3(x):
    """Exact f32 mod-3 for small non-negative values (docs/PERF.md)."""
    return x - 3.0 * jnp.floor(x * (1.0 / 3.0))


@functools.cache
def _synd_mat24b():
    """(9, 24, 78) f32: the shared r=8 syndrome map for every band triple
    in (digit, coeff) row-flattened order (rs._matrices_pm(18)["S2"]),
    broadcast to a per-band batch for one batched MXU contraction."""
    S8 = np.asarray(rs._matrices_pm(18)["S2"], dtype=np.float32)  # (24,3,26)
    return np.broadcast_to(S8.reshape(1, 24, 78),
                           (NUM_BANDS, 24, 78)).copy()


def _perm_mat(k: int) -> np.ndarray:
    """(13k, 13k) f32 within-superblock restride: P[c*13 + t, m'*26 + e]
    = 1 iff t*k + c == m'*26 + e.  (j' = t*k + c is the in-superblock
    stream position; (m', e) its 26-word-grid coordinates.)"""
    n = 13 * k
    P = np.zeros((n, n), dtype=np.float32)
    for t in range(13):
        for c in range(k):
            P[c * 13 + t, t * k + c] = 1.0
    return P


def _assembly_mat(bands, ks) -> np.ndarray:
    """(g*78, 243) f32: Wg[(gi*3 + d)*26 + e, q] = 3^d where grid trit
    (row 3*b+d, stream block col e) feeds word-symbol q = b*27 + w
    (pipeline._unpack702_bw semantics restricted to this band group)."""
    from .pipeline import _unpack702_bw
    Wbw = np.asarray(_unpack702_bw(), dtype=np.float32)   # (27, 26, 243)
    g = len(bands)
    W = np.zeros((g * 78, 243), dtype=np.float32)
    for gi, b in enumerate(bands):
        for d in range(3):
            W[(gi * 3 + d) * 26:(gi * 3 + d) * 26 + 26] = Wbw[3 * b + d]
    return W


def supported(layout) -> bool:
    """True when the fused kernel covers this decode layout."""
    geom = layout.geom
    hdr = layout.hdr
    if hdr.beacon.enabled:
        return False
    if hdr.tile.w and hdr.tile.h:          # P5 2D-interleave
        return False
    if not all(geom.blocks[b] == geom.blocks[0] for b in range(NUM_BANDS)):
        return False
    if geom.blocks[0] <= 0:
        return False
    if geom.H != geom.blocks[0] * rs.N:
        return False
    return all(k % 2 == 0 for k in geom.ks)


@functools.cache
def check_decode_fn(layout, interpret: bool = False):
    """Build the fused check-decode for one DecodeLayout.

    Returns fn: body_T (n_sf, 9, H) int8 -> (out_T (n_sf, 9, n_out) int8,
    ok (n_sf,) bool).  Matches pipeline._decode_body_fn_pm2(layout,
    rs_mode="check", wire="planes") vmapped over superframes, with ok per
    superframe.
    """
    from . import pipeline  # deferred: pipeline gates on this module
    geom = layout.geom
    H = geom.H
    ks = geom.ks
    nblk = geom.blocks[0]
    assert H == nblk * rs.N
    S_sb = -(-nblk // 13)                  # superblocks of 13 RS blocks
    nblk_pp = 13 * S_sb
    dlens = [nblk * ks[b] for b in range(NUM_BANDS)]
    max_d = max(dlens)
    MB = -(-max_d // 26)                   # word-grid blocks (26 sym each)
    n_out = layout.n_out_words
    assert n_out <= MB * 27

    # k-groups (preserve band identity for the assembly map)
    groups = {}
    for b in range(NUM_BANDS):
        groups.setdefault(ks[b], []).append(b)
    gspecs = []
    MBp = 0
    for k, bands in sorted(groups.items()):
        Nm = k // 2                        # m'-blocks per superblock
        MBp = max(MBp, Nm * S_sb)
        gspecs.append((k, tuple(bands), Nm))
    MBp = max(MBp, MB)

    # descramble offsets depend only on row and column parity (26 is even,
    # so h = blk*26 + c has the parity of c): a (27, 26) constant field
    off_full = np.asarray(pipeline._pm_offsets(H, layout.hdr.seed, -1.0))
    off26 = np.ascontiguousarray(off_full[:, :26]).astype(np.float32)
    assert np.array_equal(off_full, np.tile(off26, (1, nblk)))

    W24b = jnp.asarray(_synd_mat24b())
    # per-band syndrome row validity: digit-major rows (3 x 8), first
    # r = 26 - k rows of each digit third are real syndromes
    rmask = np.zeros((NUM_BANDS, 24, 1), dtype=np.float32)
    for b in range(NUM_BANDS):
        r = 26 - ks[b]
        for d in range(3):
            rmask[b, d * 8:d * 8 + r] = 1.0
    consts = [jnp.asarray(off26), W24b, jnp.asarray(rmask)]
    const_specs = [
        pl.BlockSpec((27, 26), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((NUM_BANDS, 24, 78), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((NUM_BANDS, 24, 1), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    for k, bands, Nm in gspecs:
        consts.append(jnp.asarray(_perm_mat(k)))
        const_specs.append(pl.BlockSpec((13 * k, 13 * k), lambda i: (0, 0),
                                        memory_space=pltpu.VMEM))
        consts.append(jnp.asarray(_assembly_mat(bands, ks)))
        const_specs.append(pl.BlockSpec((len(bands) * 78, 243),
                                        lambda i: (0, 0),
                                        memory_space=pltpu.VMEM))

    def kernel(body_ref, off_ref, w24_ref, rmask_ref, *rest):
        grefs = rest[:2 * len(gspecs)]
        out_ref, ok_ref = rest[2 * len(gspecs):]

        # int8 sublane splits are NOT in the Mosaic op set (probed: the
        # f32 versions of every relayout below compile; the i8 reshape
        # (H, 9) -> (nblk, 26, 9) does not) -- so lift to f32 first.
        x = body_ref[0].astype(jnp.float32)                 # (9, H)
        xb = x.T.reshape(nblk, 26, NUM_BANDS)               # (nb, 26, 9)
        wcp = jnp.transpose(xb, (2, 1, 0))                  # (9, 26, nb)
        q1 = jnp.floor(wcp * (1.0 / 3.0))
        q2 = jnp.floor(wcp * (1.0 / 9.0))
        planes = jnp.stack(
            [wcp - 3.0 * q1, q1 - 3.0 * q2,
             q2 - 3.0 * jnp.floor(q2 * (1.0 / 3.0))],
            axis=1)                                         # (9, 3, 26, nb)
        p27 = planes.reshape(27, 26, nblk)
        dig = _fmod3(p27 + off_ref[...][:, :, None] + 3.0)  # (27, 26, nb)

        # full syndrome check: one batched MXU contraction for all bands
        d9 = dig.reshape(NUM_BANDS, 78, nblk)
        S = lax.dot_general(w24_ref[...], d9,
                            (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
        dirty = jnp.sum(_fmod3(S) * rmask_ref[...])
        ok_ref[0] = jnp.broadcast_to(
            (dirty == 0.0).astype(jnp.int32), (1, 128))

        # extract + restride + assemble, one k-group at a time
        OUT = jnp.zeros((MBp, 243), dtype=jnp.float32)
        for gi, (k, bands, Nm) in enumerate(gspecs):
            Pk = grefs[2 * gi][...]                         # (13k, 13k)
            Wg = grefs[2 * gi + 1][...]                     # (g*78, 243)
            g = len(bands)
            rows = [dig[3 * b:3 * b + 3] for b in bands]
            db = jnp.concatenate(rows, axis=0)              # (3g, 26, nb)
            db = db[:, :k, :]                               # (3g, k, nb)
            db = jnp.pad(db, ((0, 0), (0, 0), (0, nblk_pp - nblk)))
            z = jnp.transpose(db, (0, 2, 1))                # (3g, nbpp, k)
            z = z.reshape(3 * g, S_sb, 13, k)
            z = jnp.transpose(z, (0, 3, 2, 1))              # (3g, k, 13, S)
            z = z.reshape(3 * g, 13 * k, S_sb)              # c*13 + t
            z = jnp.transpose(z, (0, 2, 1))                 # (3g, S, 13k)
            Y = lax.dot_general(z, Pk, (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
            # Y: (3g, S_sb, 13k) with trailing index m'*26 + e.  Split
            # (m', e) as LEADING dims (lane-dim merges need 128-aligned
            # minors, which 26/234 are not) and assemble all m' blocks
            # with ONE rank-3-LHS contraction.
            Zt = jnp.transpose(Y, (0, 2, 1))                # (3g, 13k, S)
            Zt = Zt.reshape(3 * g, Nm, 26, S_sb)            # sublane split
            Zt = jnp.transpose(Zt, (1, 0, 2, 3))            # (Nm, 3g, 26, S)
            Zt = Zt.reshape(Nm, g * 78, S_sb)               # leading merge
            Zt = jnp.transpose(Zt, (0, 2, 1))               # (Nm, S, g78)
            Cg = lax.dot_general(Zt, Wg, (((2,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
            Cg = jnp.transpose(Cg, (1, 0, 2))               # (S, Nm, 243)
            Cg = Cg.reshape(S_sb * Nm, 243)                 # m = s*Nm + m'
            OUT = OUT + jnp.pad(Cg, ((0, MBp - S_sb * Nm), (0, 0)))

        O = OUT.T.reshape(NUM_BANDS, 27, MBp)               # (9, 27, MBp)
        out_ref[0] = O.astype(jnp.int8)

    def fn(body_T):
        n_sf = body_T.shape[0]
        out, ok = pl.pallas_call(
            kernel,
            grid=(n_sf,),
            in_specs=[
                pl.BlockSpec((1, NUM_BANDS, H), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ] + const_specs,
            out_specs=(
                pl.BlockSpec((1, NUM_BANDS, 27, MBp),
                             lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_sf, NUM_BANDS, 27, MBp), jnp.int8),
                jax.ShapeDtypeStruct((n_sf, 1, 128), jnp.int32),
            ),
            interpret=interpret,
        )(body_T, *consts)
        # word stream: w = m*27 + w_ib -> one small XLA epilogue relayout
        raw = jnp.swapaxes(out, 2, 3).reshape(n_sf, NUM_BANDS, MBp * 27)
        return raw[:, :, :n_out], ok[:, 0, 0] != 0

    return fn
