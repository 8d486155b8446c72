"""Blocked-grid profile pipeline ("v3"): zero full-size relayouts.

Device-trace ground truth on the round-2 fused roundtrip (docs/PERF.md)
showed ~38% of device time in XLA-inserted relayout copies at the fusion
boundaries of the v2 pipeline: the dot702 output swap, the (27, H) grid
materializations, the per-k-group extraction reshapes, and the decode
assembly transposes.  v3 removes them structurally: every stage contracts
DIRECTLY from the previous stage's natural dot output via dot_general
dimension numbers, with composite host-built constants.

The enabling identity: 13 RS blocks of k data symbols occupy exactly
k/2 26-column blocks of the data grid (13*k == 26*(k/2), k even for all
profiles k in {18, 20, 22, 24}).  With M = ceil(nblk/13) "macroblocks"
per band, every tensor keeps the static blocked shape

    (3 u, gv v, [3 digit,] M, 13 block, {k data | r parity | 26 codeword})

where band b = 3u + v and the UEP k-groups are residue classes v mod 3
(_residue_groups: uniform UEP and uep_luma_priority both qualify).  The
band axis (u, v) rides dot_general batch dims (constants are tiled), so
outputs land in wire order with no permutation.

Encode (old/include/ternary_image_codec_v6_min.hpp:1043-1169 semantics,
bit-exact vs the v2 pipeline -- tests/test_pipeline_v3.py):

  words --digits--> (27, nw) --dot702_dm--> Y (27, 26, nblk7)
    per k-group:  data  = Y . D_k   (period-(13k) permutation dot)
                  parity= Y . P_k   (D_k composed with the RS generator)
                  scramble-add (blocked period-6 constants) + 3^d pack
                  concat data|parity on the codeword axis
    concat v-groups -> (3, 3, M, 13, 26) == wire body (9, H) by reshape.

Decode (check/none/paged/full modes):

  wire (9, H) --divmod+descramble--> dig (3, 3, 3, M, 13, 26)
    syndromes: ONE r=8 lifted contraction for all bands (+ per-v row mask)
    data:      dig . E_k  (D_k transposed, c<k selection folded in)
    assembly:  the dmaj-permuted _unpack702_bw contraction -> (9, n_out).
    paged: v2's page-compacted correction (16-block pages, band-major,
    capacity C = min(g*npage, max(6, g)), slot-gather merge) runs on the
    blocked grid between extraction and assembly, bit-identical decisions;
    deltas apply to the extracted data in 26-col grid coordinates.

Eligibility: residue-class k-groups (checked by encode_supported/
decode_supported); everything else falls back to v2.  A beacon band is
supported: its column is computed separately (unscrambled RS digits ->
blocked (S, p-1)->(S, p) splice -> row-space scramble) and overwrites the
group machinery's throwaway column at assembly; non-26-multiple heights
ride a partial trailing grid block whose cells are the zero stream tail
(masked out of the syndrome check, like v2 never reading them).

P5 (2D interleave, old/.../v6_min.hpp:1083-1086,749-813) rides fused
paths, picked per tile:
  * (w | 234, h even|1): the 2-half snake-composed dots
    (_fuse_enc_const/_fuse_dec_const) -- one contraction per side.
  * (w | 234, odd h > 1): the per-flip-class fuse (_cls_consts) -- the
    same single contraction with the class axis (Ph = h/gcd(234/w, h))
    on dot batch dims.
  * (w not dividing 234, ANY h): the stream-rev path (_stream_rev) --
    one class-free dense extraction to stream planes, three SMALL
    class-batched (234, 234) reversal dots (period Pw = w/gcd(w, 234)
    <= 26 for every legal tile), an elementwise row-parity select
    (_stream_flip_mask), and the digit-plane fold dots, all in the
    (n7, 3, 234) block layout.  Round 4: replaces the retired 3-delta
    full fold (_win_consts, three FULL-SIZE class dots per side, the
    17.6 fps wall) and the Y-domain id/rev decomposition (_rev_windows,
    702x702 class dots) -- the key split is reversal SOURCES (period
    Pw, folds into small dot constants) vs row PARITY (period up to
    wh/gcd(wh, 234), stays an elementwise host mask).
T3_P5_FUSE=0 forces the round-2 stream branch (extract stream planes,
interleave on (3, L), fold back).  P5 composes with a beacon band: the
stream fold writes the interleaved round-robin stream into every band
column, and the beacon splice / throwaway-column machinery operates
downstream of it unchanged.  Chip economics (docs/PERF.md round-3/4
ledgers): each full-size class dot was ~6 ms/frame MXU-bound, so the
single-dot tiles hold 30-36 fps while the retired paths paid 3
full-size dots per side (15-18 fps).
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..config import NUM_BANDS
from . import interleave, rs, scramble
from .gf27 import _m3i, fmod3


def _groups(geom, uep, b0: int = -1):
    """Residue-class k-groups [(k, lo, hi)] or None (not v3-eligible).

    b0 >= 0: the beacon band -- its (smaller) block count is replaced by
    the uniform H//26 stand-in; the group machinery computes a throwaway
    column there and the assembly overwrites it with the real beacon
    column (see encode_fn_v3/check_decode_fn_v3)."""
    from . import pipeline as pl
    nblk_u = geom.H // rs.N
    blocks = [nblk_u if b == b0 else geom.blocks[b] for b in range(NUM_BANDS)]
    by_k = {}
    for b in range(NUM_BANDS):
        if blocks[b]:
            by_k.setdefault(geom.ks[b], []).append(b)
    return pl._residue_groups(by_k, blocks)


def _eligible(profile, tile, beacon, geom) -> bool:
    if geom.H // rs.N == 0:
        return False
    b0 = beacon.band_slot if beacon.enabled else -1
    if any(geom.usable[b] != geom.H
           for b in range(NUM_BANDS) if b != b0):
        return False
    return _groups(geom, None, b0) is not None


# ---------------------------------------------------------------------------
# host-built composite constants
# ---------------------------------------------------------------------------


@functools.cache
def _data_const(k: int):
    """D_k[(26 i, Lk J), (13 j, k c)] = 1 iff j*k + c == 26*J + i.

    Maps the data grid's 26-blocked columns (grid col p = 26*(Lk*m + J) + i)
    to RS block coordinates (block 13*m + j, coeff c) within one macroblock
    m -- the whole 26-trits/word stream to codeword-data relayout
    (old/include/ternary_image_codec_v6_min.hpp:1051-1082 + the k-chunking
    at :1101-1115) as one permutation contraction."""
    Lk = k // 2
    D = np.zeros((26, Lk, 13, k), dtype=np.int8)
    for j in range(13):
        for c in range(k):
            J, i = divmod(j * k + c, 26)
            D[i, J, j, c] = 1
    return D


@functools.cache
def _parity_const(k: int):
    """P_k[(3 d_in, 26 i, Lk J), (3 d_out, 13 j, r c')] -- D_k composed with
    the GF(3)-lifted RS(26,k) parity generator (rows k..25 of G)."""
    r = rs.N - k
    Lk = k // 2
    G2 = rs._matrices_pm(k)["G2"]                       # (78, 3, k)
    Gp = np.asarray(G2).reshape(3, rs.N, 3, k)[:, k:]   # (3 d_out, r, 3, k)
    P = np.zeros((3, 26, Lk, 3, 13, r), dtype=np.int8)
    for j in range(13):
        for c in range(k):
            J, i = divmod(j * k + c, 26)
            # parity of block j draws on data coeff c of the same block
            P[:, i, J, :, j, :] += Gp[:, :, :, c].transpose(2, 0, 1)
    return P % 3


@functools.cache
def _parity_data_const(k: int):
    """A_k[3 d_in][(k c), (3 d_out, r c')]: the GF(3)-lifted RS(26,k)
    parity generator alone (no grid extraction) -- parity digits are
    GF(3)-linear in the UNSCRAMBLED data digits, so they can be computed
    from the data dot's output instead of a second (26*Lk*3)-length grid
    contraction.  Kept as one (k)-contraction constant
    per input digit plane: a joint (3, k) contraction is the
    tiny+large-pair shape that MISCOMPILES under vmap on XLA:TPU
    (docs/PERF.md "XLA:TPU miscompile")."""
    r = rs.N - k
    G2 = rs._matrices_pm(k)["G2"]                       # (78, 3, k)
    Gp = np.asarray(G2).reshape(3, rs.N, 3, k)[:, k:]   # (d_out, c', d_in, c)
    return np.ascontiguousarray(
        Gp.transpose(2, 3, 0, 1)).astype(np.int8)       # (d_in, c, d_out, c')


@functools.cache
def _extract_const(k: int):
    """E_k[(13 j, 26 c), (Lk J, 26 i)] = 1 iff c < k and j*k + c == 26*J + i
    (decode-side D_k transpose with the systematic c<k selection folded in,
    so the codeword axis never needs a sliced copy)."""
    Lk = k // 2
    E = np.zeros((13, 26, Lk, 26), dtype=np.int8)
    for j in range(13):
        for c in range(k):
            J, i = divmod(j * k + c, 26)
            E[j, c, J, i] = 1
    return E


@functools.cache
def _fold234_enc():
    """W[(234 t), (3 u, 3 v, 26 i)] = 1 iff t == 9i + 3u + v: interleaved
    stream planes -> the blocked Y layout as one permutation dot per digit
    plane -- a transpose would materialize a (.., 3, 3)-minor layout (the
    plane-major killer, docs/PERF.md).  Kept per-plane: the joint
    ((3 d, 234 t) x (.., 3 d', ..)) single-dot form MISCOMPILES under
    vmap on XLA:TPU (wrong Y values at batch > 1; bit-exact on CPU and at
    batch 1 -- chip bisect 2026-08-18, docs/PERF.md)."""
    W = np.zeros((234, 3, 3, 26), dtype=np.int8)
    for i in range(26):
        for u in range(3):
            for v in range(3):
                W[9 * i + 3 * u + v, u, v, i] = 1
    return W


@functools.cache
def _fold234_dec():
    """W[(3 d), (3 u, 3 v, 26 i), (234 t)] = 1 iff t == 9i + 3u + v, with
    d riding the dot batch dims: blocked data grid -> stream planes."""
    W = np.zeros((3, 3, 3, 26, 234), dtype=np.int8)
    for i in range(26):
        for u in range(3):
            for v in range(3):
                W[:, u, v, i, 9 * i + 3 * u + v] = 1
    return W


@functools.cache
def _stream_const():
    """V[(27 row, 27 w), (3 dd, 234 m)] = 1 iff useful trit t = 3m + dd of
    a 702-trit word block is trit u = t % 26 of word w = t // 26, i.e.
    digit u % 3 of word-digit row u // 3 (d-major digit-plane row
    9*(u % 3) + u // 3).  Word digit planes -> symbol stream planes, the
    P5 pre-interleave extraction (old/.../v6_min.hpp:1051-1082 read as a
    stream instead of a grid)."""
    V = np.zeros((27, 27, 3, 234), dtype=np.int8)
    for m in range(234):
        for dd in range(3):
            t = 3 * m + dd
            w, u = divmod(t, 26)
            V[9 * (u % 3) + u // 3, w, dd, m] = 1
    return V


def _fuse_ok(w: int, h: int) -> bool:
    """Snake-composed P5 HALF fast path eligibility: the boustrophedon rows
    must not cross 234-symbol block boundaries (w | 234) and the per-block
    flip pattern must depend on at most the block PARITY (h even; h == 1 or
    w == 1 is the no-flip identity).  Row R = s // w flips iff (R mod h) is
    odd; for even h that is just R odd, and R = (234/w)*n7 + t//w, so the
    within-block permutation is one of two constants chosen by n7 parity (a
    single constant when 234/w is even).  w | 234 with odd h > 1 rides
    the per-flip-class fuse (_cls_consts); every 234 % w != 0 tile rides
    the stream-rev path (_stream_rev/_stream_flip_mask)."""
    return w == 1 or (w >= 1 and 234 % w == 0 and (h == 1 or h % 2 == 0))


@functools.cache
def _tau234(w: int, h: int, cls: int) -> np.ndarray:
    """Within-block composed snake: interleaved position t (in a block of
    flip-class `cls`) reads pre-interleave position tau[t].  Involution.

    Block n7 starts at global row q*n7 (q = 234/w rows per block, w | 234),
    and row R flips iff (R mod h) is odd, so the per-block pattern depends
    only on cls = n7 mod Ph with Ph = h / gcd(q, h) (h even collapses to
    block parity: (q*cls + rho) mod h keeps the parity of q*cls + rho)."""
    t = np.arange(234)
    if h == 1:
        return t
    q = 234 // w
    rho, c = np.divmod(t, w)
    flip = ((q * cls + rho) % h) % 2 == 1
    return np.where(flip, w * rho + (w - 1) - c, t)


@functools.cache
def _fuse_enc_const(w: int, h: int) -> np.ndarray:
    """VC[(2 half), (27 row, 27 wloc), (3 u, 3 v, 3 d, 26 i)]: word digit
    planes (one 27-word half of a paired 54-word block) -> the
    snake-interleaved blocked Y layout, i.e. _stream_const with the
    composed within-block snake _tau234 folded into its stream index and
    the _fold234_enc regrouping folded into its output axes.  Replaces the
    stream materialization + transpose + interleave flip/where + pad +
    fold dots of the v3 P5 stream branch with one contraction per half.

    Per-half layout (NOT one (27, 54)-contraction): a joint (27, 54) int8
    contraction MISCOMPILES under vmap on XLA:TPU (chip bisect 2026-08-19:
    4.2M wrong wire cells at batch 128, bit-exact at batch 1 and on CPU);
    the per-half (27 row, 27 wloc) joint shape is the V702 dot's, proven
    on chip (docs/PERF.md "XLA:TPU miscompile")."""
    V = np.asarray(_stream_const())                    # (27, 27, 3, 234)
    VC = np.zeros((2, 27, 27, 3, 3, 3, 26), dtype=np.int8)
    for half in range(2):
        tau = _tau234(w, h, half)
        for t in range(234):
            i, r9 = divmod(t, 9)
            u, v = divmod(r9, 3)
            VC[half, :, :, u, v, :, i] = V[:, :, :, tau[t]]
    return VC


@functools.cache
def _fuse_dec_const(w: int, h: int) -> np.ndarray:
    """CU[(2 half), (3 u, 3 v, 3 d, 26 i) = 702, (9 b, 27 w)]: blocked data
    grid -> RAW words, i.e. v2's _stream702 with the composed snake folded
    into its stream index (the deinterleave is the same involution) -- the
    decode-side mirror of _fuse_enc_const, replacing fold_dec + the
    deinterleave pass + the word-rebuild dots.

    The (u, v, d, c) axes are pre-flattened to ONE 702 contraction dim
    (consumed against a (B, u, v, d, c)-transposed grid): joint
    (3, 3, 26) int8 contractions MISCOMPILE under vmap on XLA:TPU (chip
    bisect 2026-08-19); a single non-trivial contracting dim is the
    documented safe shape (docs/PERF.md "XLA:TPU miscompile")."""
    from . import pipeline as pl
    U = np.asarray(pl._stream702()).reshape(3, 234, NUM_BANDS, 27)
    CU = np.zeros((2, 3, 3, 3, 26, NUM_BANDS, 27), dtype=np.int8)
    for half in range(2):
        tau = _tau234(w, h, half)
        for t in range(234):
            i, r9 = divmod(t, 9)
            u, v = divmod(r9, 3)
            CU[half, u, v, :, i] = U[:, tau[t]]
    return CU.reshape(2, 702, NUM_BANDS, 27)


# ---------------------------------------------------------------------------
# stream-rev P5 path (any 234 % w != 0 tile): rev/mask in the stream domain
#
# Over whole tiles the boustrophedon is "row reversal by mask": for stream
# position t with global row R = t // w (rows of width w are globally
# contiguous since tile area A = w*h is a multiple of w),
#
#     interleaved[t] = stream[t]                  if (R mod h) even
#                    = stream[w*R + (w-1) - t%w]  if (R mod h) odd
#
# and the map is an involution (deinterleave = the same operation).  The
# fused path factors into a class-free dense extraction to stream planes
# (the chip-proven (27 row, 27 wloc) V702 dot), an UNCONDITIONAL row
# reversal via three SMALL shifted-window class dots (_stream_rev:
# (234, 234) constants at period Pw = w/gcd(w, 234) <= 26 -- a reversed
# symbol moves < w <= 26 positions, at most one block over), an
# elementwise select under the host row-parity mask (_stream_flip_mask,
# the only structure whose period can reach wh/gcd(wh, 234)), then the
# digit-plane fold/rebuild dots.  Decode applies the identical rev/mask
# to the unfolded stream (same constants -- the snake is an involution).
# ---------------------------------------------------------------------------


def _cell702(m: int, d: int) -> int:
    """Flattened (u, v, d, i) cell index of stream position m, digit d
    (m = 9 i + 3 u + v -- the blocked Y / data-grid cell layout)."""
    u, v = divmod(m % 9, 3)
    return ((u * 3 + v) * 3 + d) * 26 + m // 9


@functools.cache
def _fuse_id_consts():
    """(VC_id (27, 27, 702), CU_id (702, 9, 27)): the tau=identity fused
    extraction / word-rebuild constants (the h=1 specialization of
    _fuse_enc_const/_fuse_dec_const; tile-independent)."""
    return (np.ascontiguousarray(
                np.asarray(_fuse_enc_const(1, 1))[0].reshape(27, 27, 702)),
            np.ascontiguousarray(np.asarray(_fuse_dec_const(1, 1))[0]))


def _cls_ph(w: int, h: int) -> int:
    """Number of distinct per-block flip classes for w | 234 (see
    _tau234): Ph = h / gcd(234/w, h) <= 25 for legal tiles."""
    import math
    return h // math.gcd(234 // w, h)


@functools.cache
def _cls_consts(w: int, h: int):
    """(Ph, VCS (Ph, 27, 27, 702) int8, CUS (Ph, 702, 9, 27) int8): the
    per-flip-class snake-composed fuse constants for w | 234 tiles with
    ODD h > 1 (even h collapses to 2 classes = the _fuse_enc_const half
    path).  The within-block snake tau (an involution) is folded into the
    identity extraction / word-rebuild constants per class, so the whole
    interleave costs ZERO extra contractions: encode is one dot with the
    class axis on dot batch dims (Ym[n7] = X[n7] . VCS[n7 mod Ph]), decode
    one class-batched single-702 contraction (the chip-proven
    shifted-window dot family) straight to RAW words."""
    VCid, CUid = _fuse_id_consts()
    Ph = _cls_ph(w, h)
    VCS = np.zeros((Ph, 27, 27, 702), dtype=np.int8)
    CUS = np.zeros((Ph, 702, NUM_BANDS, 27), dtype=np.int8)
    for cls in range(Ph):
        tau = _tau234(w, h, cls)
        p = np.empty(702, dtype=np.int64)
        for m in range(234):
            for d in range(3):
                p[_cell702(m, d)] = _cell702(int(tau[m]), d)
        # encode: Ym[out] = Y_id[tau(out)]; decode: the deinterleave is the
        # same involution, so word = sum_src G[src] * CUid[p[src]]
        VCS[cls] = VCid[:, :, p]
        CUS[cls] = CUid[p]
    return Ph, VCS, CUS


def _win_pa(w: int, h: int) -> int:
    """Full-fold class period for w not dividing 234: the per-block snake
    pattern (reversal targets AND row parity) depends on
    (234*n7) mod (w*h), i.e. Pa = w*h / gcd(w*h, 234) classes."""
    import math
    A5 = w * h
    return A5 // math.gcd(A5, 234)


#: decode full-fold eligibility bound: (3, Pa, 702, 9, 27) int8 decode
#: constants stay <= ~13 MB and the class dots stay near the measured
#: ~2.8 ms/frame class-dot floor.  Tiles past it (e.g. 25x25, Pa = 625)
#: ride the stream-rev decode instead.
_WIN_PA_MAX = 26


@functools.cache
def _win_dec_consts(w: int, h: int):
    """(Pa, CUS (3, Pa, 702, 9, 27) int8): 3-delta per-class FULL-FOLD
    decode constants for w not dividing 234 with Pa <= _WIN_PA_MAX:
    deinterleave (reversal AND parity select, period Pa = wh/gcd(wh,234))
    composed into the word-rebuild contraction, so decode's whole
    interleave is three class-batched single-702 dots STRAIGHT from the
    corrected data grid to RAW words -- measured at the class-dot floor
    (~8.4 ms/frame for all three, round-4 probe ledger), which no
    unfold->rev->rebuild decomposition can beat.  The ENCODE analog
    (full-size (Pa, 729, 702) class dots) was retired: its 3 dense class
    dots measured ~19.8 ms/frame vs the stream-rev encode's ~16."""
    _VCid, CUid = _fuse_id_consts()
    Pa = _win_pa(w, h)
    CUS = np.zeros((3, Pa, 702, NUM_BANDS, 27), dtype=np.int8)
    for cls in range(Pa):
        base = 234 * (cls + Pa)          # representative block, safe nbrs
        for m in range(234):
            t = base + m
            R, c = divmod(t, w)
            src = w * R + (w - 1) - c if (R % h) % 2 == 1 else t
            rel = src - base
            delta = 0 if rel < 0 else (1 if rel < 234 else 2)
            lsrc = rel + 234 - 234 * delta
            for d in range(3):
                # stream cell t of block n7 reads grid cell lsrc of
                # block n7+delta-1, so word-rebuild row cell(lsrc, d) of
                # that neighbor carries CUid's row for cell (m, d)
                CUS[delta, cls, _cell702(lsrc, d)] += \
                    CUid[_cell702(m, d)]
    return Pa, CUS


#: combined-neighbor window width for the 2-dot reversal: covers the
#: <= w-1 boundary-crossing cells per side for every legal tile (w <= 26)
_NBR_W = 32

#: class-period bound for the (234, 234) dot form: the 234-length
#: class-batched reversal dots MISCOMPILE under vmap at Pw = 25 in EVERY
#: batched variant tried (s8 chain, s32 sum, roll views -- only
#: unbatched per-class dots are clean; tools/chip_sr_bisect.py --pw 25),
#: while the 702-length class-batched family is chip-proven at Pw = 25
#: (the round-3 _rev_windows dots).  Pw <= 7 rides the cheap 234 form
#: (chip-verified at Pw = 4, 5, 7); larger periods ride the 702
#: block-diagonal form.
_REV234_PW_MAX = 7


@functools.cache
def _stream_rev2(w: int):
    """(Rself, Rnbr, Pw, form): the 2-dot form of _stream_rev -- a
    reversed symbol moves < w <= 26 positions, so the prev-block sources
    all lie in its last _NBR_W cells and the next-block sources in its
    first _NBR_W; one narrow class dot over the CONCATENATED 64-cell
    neighbor window replaces two full-size delta dots.

    form="234": Rself (Pw, 234, 234), Rnbr (Pw, 2W, 234) -- the digit
    axis free-rides.  form="702" (Pw > _REV234_PW_MAX): the same
    constants block-diagonally expanded over the 3 digit planes --
    Rself (Pw, 702, 702), Rnbr (Pw, 6W, 702) -- so the contraction is
    the chip-proven single-702 class-dot family (3x the MACs, on
    zeros)."""
    R, Pw = _stream_rev(w)
    Rn = np.zeros((Pw, 2 * _NBR_W, 234), dtype=np.int8)
    Rn[:, :_NBR_W] = R[0][:, 234 - _NBR_W:]
    Rn[:, _NBR_W:] = R[2][:, :_NBR_W]
    assert not R[0][:, :234 - _NBR_W].any()
    assert not R[2][:, _NBR_W:].any()
    if Pw <= _REV234_PW_MAX:
        # 234-form keeps the THREE-delta structure: the 2-dot
        # (self + neighbor-window) program, chip-clean at Pw = 4 and 7,
        # returns wrong cells at Pw = 5 (370k bad wire cells at batch
        # 128) -- one uniform chip-verified program beats a per-Pw zoo
        return R, None, Pw, "234"
    S7 = np.zeros((Pw, 702, 702), dtype=np.int8)
    N7_ = np.zeros((Pw, 6 * _NBR_W, 702), dtype=np.int8)
    for d in range(3):
        S7[:, 234 * d:234 * (d + 1), 234 * d:234 * (d + 1)] = R[1]
        N7_[:, 2 * _NBR_W * d:2 * _NBR_W * (d + 1),
            234 * d:234 * (d + 1)] = Rn
    return S7, N7_, Pw, "702"


@functools.cache
def _stream_rev(w: int):
    """(R (3 delta, Pw, 234, 234) int8, Pw): UNCONDITIONAL row reversal in
    the STREAM domain for w not dividing 234.

    Key factorization (round-4, replaces the 3-dense-dot full fold): the
    snake = (row reversal) selected by (row parity).  The reversal's
    SOURCE map depends on the block phase (234*n7) mod w -- period
    Pw = w / gcd(w, 234) <= 26 for every legal tile -- while the parity
    depends on (234*n7) mod (w*h) -- period Pa up to 625.  Folding BOTH
    into dot constants (the retired _win_consts) forced Pa-period
    full-size class dots (3 x ~6 ms/frame, the 17.6 fps wall); splitting
    them keeps every class-batched constant at period Pw and size
    (234, 234) (~0.16 MB/class), and the parity select becomes an
    elementwise where under a host mask (_stream_flip_mask).

        st_rev[n7] = sum_delta  st[n7 + delta - 1] . R[delta, n7 mod Pw]

    (delta 0/1/2 = previous/self/next block; a reversed symbol moves
    < w <= 26 positions, so one block over at most).  Each dot is a
    single 234-length contraction with the class axis on dot BATCH dims
    (the chip-proven shifted-window dot family); the digit axis
    free-rides.
    The map is an involution, so DECODE uses the same constants."""
    import math
    Pw = w // math.gcd(w, 234)
    R = np.zeros((3, Pw, 234, 234), dtype=np.int8)
    for cls in range(Pw):
        base = 234 * cls
        for m_out in range(234):
            t = base + m_out
            src = w * (t // w) + (w - 1) - t % w
            rel = src - base
            delta = 0 if rel < 0 else (1 if rel < 234 else 2)
            R[delta, cls, rel + 234 - 234 * delta, m_out] = 1
    return R, Pw


@functools.cache
def _stream_flip_mask(nblk: int, w: int, h: int) -> np.ndarray:
    """(nblk, 1, 234) bool: stream cell (n7, :, m) sits on an odd
    (reversed) snake row -- global row (234 n7 + m) // w, odd iff
    (row mod h) is odd.  ~80 KB host constant at bench shapes; the digit
    axis broadcasts."""
    t = 234 * np.arange(nblk)[:, None] + np.arange(234)
    return ((t // w) % h % 2 == 1)[:, None, :]


def _rev_mask(st, Rj, Pw: int, n7p: int, mask):
    """Stream-domain snake: class reversal dots + the row-parity select,
    on (nblk, 3, 234), in the per-form CHIP-VERIFIED program shape.

    st (nblk, 3, 234); Rj = (Rself, Rnbr, Pw, form) from _stream_rev2;
    mask (nblk, 1, 234) bool.  Two forms, each frozen to the exact
    program that survived the round-4 chip sweeps (this backend
    miscompiles close variants -- docs/PERF.md sightings #5a/b):

    * "234" (Pw <= 7): THREE delta dots (prev/self/next block views,
      single 234-length contraction, class axis on dot batch dims, the
      digit axis free-riding), summed in s32 with ONE s8 convert.
      Converting each dot to s8 before the sum returns wrong cells at
      Pw=5 (sighting #5a); the 2-dot self+neighbor-window variant is
      clean at Pw=4/7 but wrong at Pw=5.  Verified: Pw=4, 5, 7.
    * "702" (Pw > 7): SELF + narrow neighbor-window dots with the digit
      planes folded block-diagonally into single-702 contractions
      (3x the MACs, on zeros) -- at Pw=25 EVERY 234-length class-batched
      variant (s8, s32, roll views) returns wrong cells and only
      unbatched per-class dots or the 702 family are clean (sighting
      #5b).  Verified: Pw=25."""
    Rselfj, Rnbrj, _pw, form = Rj
    nblk = st.shape[0]
    stp = jnp.pad(st, ((1, 1 + n7p - nblk), (0, 0), (0, 0)))
    if form == "234":
        # three delta dots, s32 sum (the chip-verified 234-form program)
        rev = sum(
            lax.dot_general(
                lax.slice_in_dim(stp, dlt, dlt + n7p, axis=0)
                .reshape(n7p // Pw, Pw, 3, 234),
                Rselfj[dlt], (((3,), (1,)), ((1,), (0,))),
                preferred_element_type=jnp.int32)
            for dlt in range(3))               # (Pw, n7p/Pw, 3, 234) s32
        rev = rev.astype(jnp.int8).transpose(1, 0, 2, 3) \
            .reshape(n7p, 3, 234)[:nblk]
    else:
        self_v = lax.slice_in_dim(stp, 1, 1 + n7p, axis=0)
        nbr = jnp.concatenate(
            [lax.slice_in_dim(stp, 0, n7p, axis=0)[:, :, 234 - _NBR_W:],
             lax.slice_in_dim(stp, 2, 2 + n7p, axis=0)[:, :, :_NBR_W]],
            axis=2)                            # (n7p, 3, 2W)
        # 702 block-diagonal form (the digit planes fold into one
        # chip-proven single-702 contraction; see _stream_rev2)
        self_r = lax.dot_general(
            self_v.reshape(n7p // Pw, Pw, 702),
            Rselfj, (((2,), (1,)), ((1,), (0,))),
            preferred_element_type=jnp.int32)
        nbr_r = lax.dot_general(
            nbr.reshape(n7p // Pw, Pw, 6 * _NBR_W),
            Rnbrj, (((2,), (1,)), ((1,), (0,))),
            preferred_element_type=jnp.int32)
        rev = (self_r + nbr_r).astype(jnp.int8) \
            .transpose(1, 0, 2).reshape(n7p, 3, 234)[:nblk]
    return jnp.where(mask, rev, st)


def _np_pat(seed) -> np.ndarray:
    """Scrambler period-6 offset pattern (cell t uses pat[t % 6])."""
    return scramble.np_offsets(6, seed.a, seed.b, seed.s0)


def _off_data(seed, k: int, lo: int, hi: int) -> np.ndarray:
    """Blocked scramble offsets for the data cells of a v-group:
    (3 u, gv, 3 d, 1, 1, k); cell (h, band b) is scrambled cell 9h + b,
    offset index (9h + b) % 6 = (3*(h&1) + b) % 6 and h = 26*n + c keeps
    h&1 == c&1 -- the offsets depend only on (band, c parity)."""
    pat = _np_pat(seed)
    gv = hi - lo
    off = np.zeros((3, gv, 3, 1, 1, k), dtype=np.float32)
    for u in range(3):
        for vv in range(gv):
            b = 3 * u + lo + vv
            for c in range(k):
                off[u, vv, :, 0, 0, c] = pat[(b + 3 * (c & 1)) % 6]
    return off


def _off_parity(seed, k: int, lo: int, hi: int) -> np.ndarray:
    """(3 u, gv, 1, 3 d', 1, r) offsets for parity cells (c = k + c')."""
    pat = _np_pat(seed)
    r = rs.N - k
    gv = hi - lo
    off = np.zeros((3, gv, 1, 3, 1, r), dtype=np.float32)
    for u in range(3):
        for vv in range(gv):
            b = 3 * u + lo + vv
            for cc in range(r):
                off[u, vv, 0, :, 0, cc] = pat[(b + 3 * ((k + cc) & 1)) % 6]
    return off


def _tile_batch(C: np.ndarray, gv: int) -> np.ndarray:
    """Tile a constant over the (3 u, gv v) dot_general batch dims."""
    return np.ascontiguousarray(
        np.broadcast_to(C, (3, gv) + C.shape)).astype(np.int8)


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def encode_supported(layout) -> bool:
    cfg = layout.cfg
    return _eligible(cfg.profile, cfg.tile, cfg.beacon, layout.geom)


@functools.cache
def encode_fn_v3(layout, raw_wire: str = "words"):
    """Jitted (n, 9) RAW words [raw_wire="planes": (9, n)] -> wire planes
    (9, total_words) int8, bit-exact vs the v2 encoder."""
    from . import pipeline as pl
    cfg, geom = layout.cfg, layout.geom
    beacon = cfg.beacon
    b0 = beacon.band_slot if beacon.enabled else -1
    groups = _groups(geom, cfg.uep, b0)
    H = geom.H
    # grid blocks cover ceil(H/26) (a partial trailing block encodes the
    # zero-padded stream tail -> zero codeword == v2's zero pad cells)
    nbq = -(-H // rs.N)
    M = -(-nbq // 13)
    NB = 13 * M
    n_words = layout.n_raw_words
    # 27-word blocks feeding dot702_dm; enough for the input AND the widest
    # group's Lk*M 26-column blocks
    nblk7 = max(-(-n_words // 27), max((k // 2) * M for k, _l, _h in groups))
    P702 = pl._pack702_dm()
    hdrT = np.asarray(layout.header_words.T, dtype=np.int8)
    p5 = pl._is_p5(cfg.profile, cfg.tile)
    fuse_on = p5 and os.environ.get("T3_P5_FUSE", "1") == "1"
    p5_fuse = fuse_on and _fuse_ok(cfg.tile.w, cfg.tile.h)
    # w | 234, odd h > 1: per-flip-class fused constants (_cls_consts)
    p5_cls = fuse_on and not p5_fuse and 234 % cfg.tile.w == 0
    # w not dividing 234: the stream-rev path (_stream_rev) -- class
    # constants stay at period Pw <= 26 for EVERY such tile
    p5_sr = fuse_on and not p5_fuse and not p5_cls
    if p5_fuse:
        nblk7 += nblk7 & 1          # paired 54-word blocks for the fused dot
    if p5:
        # decoder-visible stream length; both sides permute at this length
        # (see _encode_parts_cm for the derivation).  L_out5 <= 234*nblk7:
        # the b == 0 term of the min is 9*dlens[0] <= 9*max_need <=
        # 26*9*max(Lk*M) = 234*nblk7, so the un-truncated stream always
        # covers it.
        dlens5 = [geom.blocks[b] * geom.ks[b] for b in range(NUM_BANDS)]
        L_out5 = int(min(NUM_BANDS * dlens5[b] + b for b in range(NUM_BANDS)))
        assert L_out5 <= 234 * nblk7
        V702 = jnp.asarray(_stream_const())
    if p5_fuse or p5_cls or p5_sr:
        # snake-composed fast path geometry: blocks < B0_5 come straight
        # from the fused dot (whole tiles only); blocks [B0_5, WE_5) are
        # rebuilt from the stream segment [T0_5, L_out5) (the containing
        # tile boundary) via the stream branch's machinery; blocks >= WE_5
        # are the zero pad past the stream end.
        A5 = cfg.tile.w * cfg.tile.h
        nfull5 = (L_out5 // A5) * A5
        B0_5 = nfull5 // 234
        WE_5 = -(-L_out5 // 234)
        T0_5 = (234 * B0_5 // A5) * A5
        W0_5 = T0_5 // 234
    if p5_fuse:
        VCj = jnp.asarray(_fuse_enc_const(cfg.tile.w, cfg.tile.h))
    if p5_cls:
        Ph5, VCS5, _CUS5 = _cls_consts(cfg.tile.w, cfg.tile.h)
        VCSj = jnp.asarray(VCS5)
        nblk7c = -(-nblk7 // Ph5) * Ph5   # class-dot pad (sliced back)
    if p5_sr:
        Rs5, Rn5, Pw, form5 = _stream_rev2(cfg.tile.w)
        Rsr_j = (jnp.asarray(Rs5),
                 None if Rn5 is None else jnp.asarray(Rn5), Pw, form5)
        n7p = -(-nblk7 // Pw) * Pw
        mks_j = jnp.asarray(
            _stream_flip_mask(nblk7, cfg.tile.w, cfg.tile.h))
        W2sr_j = jnp.asarray(_fold234_enc())            # (234, 3, 3, 26)
    # per-group Y dots: chip A/B 39.40 -> 40.83 fps alone, 42.37 combined
    # with parity-from-data (docs/PERF.md round-2 ledger); P5 computes Y
    # through the stream/fuse machinery instead
    ysplit = not p5
    # parity from the data words: three k-length dots on the data dot's
    # output instead of the second grid contraction + the Yg relayout
    # copy XLA inserts for it; chip A/B 39.40 -> 41.16 alone
    par_data = True
    if ysplit:
        P6 = np.ascontiguousarray(
            np.asarray(P702).reshape(3, 3, 3, 26, 27, 27))
        Pg_split = {(lo, hi): jnp.asarray(
            P6[:, lo:hi].reshape(-1, 27, 27), dtype=jnp.int8)
            for _k, lo, hi in groups}
        Pg_b0 = (jnp.asarray(P6[b0 // 3, b0 % 3].reshape(-1, 27, 27),
                             dtype=jnp.int8) if b0 >= 0 else None)
    # mod-3 reduction dots accumulate int32 (f32 accumulation measured
    # neutral -- the s32->f32 convert was already fused, docs/PERF.md)
    PT = jnp.int32

    consts = []
    for k, lo, hi in groups:
        gv = hi - lo
        # parity-from-data only for r = 26-k >= 4: the k=24 (r=2) data-path
        # parity dot MISCOMPILES on XLA:TPU when combined with the ysplit
        # group dots (chip bisect 2026-08-19, tools/chip_v3_verify.py:
        # wrong parity cells at vmap batch 4+, bit-exact on CPU and with
        # either knob alone; k=22/20 are chip-clean) -- k=24 keeps the
        # proven grid contraction
        pd_k = par_data and rs.N - k >= 4
        consts.append((
            k, lo, hi, pd_k,
            jnp.asarray(_tile_batch(_data_const(k), gv)),
            (jnp.asarray(_parity_data_const(k)) if pd_k
             else jnp.asarray(_tile_batch(_parity_const(k), gv))),
            jnp.asarray(_off_data(cfg.seed, k, lo, hi)),
            jnp.asarray(_off_parity(cfg.seed, k, lo, hi)),
        ))

    if b0 >= 0:
        # beacon band: its column is computed separately (unscrambled RS
        # digits -> blocked splice -> row-space scramble) and overwrites
        # the group machinery's throwaway column at assembly.  The splice
        # is pure reshape algebra: payload row j sits at r = j + j//(p-1)
        # + 1, i.e. stream blocked (S, p-1) + a leading beacon column
        # gives the (S, p) row grid (old/.../v6_min.hpp beacon insertion).
        u0, v0 = b0 // 3, b0 % 3
        k0 = geom.ks[b0]
        Lk0 = k0 // 2
        blocks0 = geom.blocks[b0]
        M0 = -(-blocks0 // 13) if blocks0 else 0
        Bk0 = Lk0 * M0
        p = beacon.words_period
        S = -(-H // p)
        SL = S * (p - 1)
        bsym_dig = np.asarray(
            [geom.beacon_sym % 3, (geom.beacon_sym // 3) % 3,
             (geom.beacon_sym // 9) % 3], dtype=np.int8)
        patb = _np_pat(cfg.seed)
        # row-space offsets (S, p): 0 at the beacon column (t == 0,
        # unscrambled), pat[(9r + b0) % 6] at payload rows r = s*p + t
        offb = np.zeros((S, p), dtype=np.float32)
        rr = np.arange(S * p).reshape(S, p)
        if p > 1:
            offb[:, 1:] = patb[(3 * (rr[:, 1:] % 2) + b0) % 6]
        Dk0 = jnp.asarray(_data_const(k0)) if blocks0 else None
        Pk0 = jnp.asarray(_parity_const(k0)) if blocks0 else None
        offb_j = jnp.asarray(offb)
        bsym_j = jnp.asarray(bsym_dig)

    def fn(raw_words):
        # D-major digit planes (27, n) [row 9d + b_w]: three elementwise
        # planes CONCAT along the leading axis -- no minor-dim stack
        # (_pack702_dm's row convention; see _encode_parts_pm._digits_dm).
        # Pad the 9-row WORD planes before digit extraction: a post-digits
        # pad costs a full extra (27, n) HBM pass (v3 trace: pad.94 was as
        # expensive as the dot702 contraction itself).
        w9 = raw_words if raw_wire == "planes" else raw_words.T   # (9, n)
        w9 = jnp.pad(w9, ((0, 0), (0, nblk7 * 27 - w9.shape[1])))
        s = w9.astype(jnp.float32)
        q1 = jnp.floor(s * (1.0 / 3.0))
        q2 = jnp.floor(s * (1.0 / 9.0))
        pl_dig = jnp.concatenate(
            [s - 3.0 * q1, q1 - 3.0 * q2,
             q2 - 3.0 * jnp.floor(q2 * (1.0 / 3.0))],
            axis=0).astype(jnp.int8)                       # (27, 27*nblk7)
        X3 = pl_dig.reshape(27, nblk7, 27)
        parts = []
        if p5_fuse or p5_cls or p5_sr:
            if p5_fuse:
                # snake-composed P5: one contraction PER BLOCK-PAIR HALF
                # from the word digit planes straight to the interleaved
                # blocked Y (the within-block snake rides the per-half
                # constant, _fuse_ok); only the final partial tile /
                # stream-end blocks are rebuilt through the stream
                # machinery on a tiny segment.  Each dot is the V702
                # (27 row, 27 wloc)-joint shape -- the single (27, 54)
                # form miscompiles under vmap (_fuse_enc_const).
                X4 = pl_dig.reshape(27, nblk7 // 2, 2, 27)
                Ym = jnp.stack(
                    [lax.dot_general(X4[:, :, hf], VCj[hf],
                                     (((0, 2), (0, 1)), ((), ())),
                                     preferred_element_type=jnp.int32)
                     for hf in range(2)], axis=1)
                Ym = Ym.astype(jnp.int8).reshape(nblk7, 3, 3, 3, 26)
            elif p5_cls:
                # per-flip-class fuse (w | 234, odd h > 1): ONE dot with
                # the class axis on dot batch dims -- the snake rides the
                # per-class constant (_cls_consts), so no rev/select pass
                # and no extra contraction vs the half path.  The class
                # pad blocks are zero words (sliced back off below).
                Xc = (jnp.pad(pl_dig, ((0, 0), (0, (nblk7c - nblk7) * 27)))
                      if nblk7c > nblk7 else pl_dig)
                X5 = Xc.reshape(27, nblk7c // Ph5, Ph5, 27)
                Ymc = lax.dot_general(X5, VCSj,
                                      (((0, 3), (1, 2)), ((2,), (0,))),
                                      preferred_element_type=jnp.int32)
                Ym = Ymc.astype(jnp.int8).transpose(1, 0, 2) \
                    .reshape(nblk7c, 702)[:nblk7] \
                    .reshape(nblk7, 3, 3, 3, 26)
            else:
                # stream-rev path (any w not dividing 234): ONE dense
                # class-free extraction to stream planes (the chip-proven
                # (27 row, 27 wloc) V702 shape), three SMALL class-batched
                # (234, 234) reversal dots over prev/self/next block views
                # (_stream_rev, period Pw <= 26; disjoint support -> exact
                # s8 sum), an elementwise row-parity select
                # (_stream_flip_mask), then the 3 digit-plane fold dots --
                # everything stays in the (n7, 3, 234) block layout (no
                # (3, L) transpose, no minor-w lax.rev).
                st = lax.dot_general(X3, V702,
                                     (((0, 2), (0, 1)), ((), ())),
                                     preferred_element_type=jnp.int32) \
                    .astype(jnp.int8)                  # (n7, 3, 234)
                sti = _rev_mask(st, Rsr_j, Pw, n7p, mks_j)
                Ym = jnp.stack(
                    [lax.dot_general(sti[:, d], W2sr_j,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32)
                     .astype(jnp.int8) for d in range(3)],
                    axis=3)                        # (n7, 3, 3, 3d, 26)
            py = [Ym[:B0_5]] if B0_5 else []
            if WE_5 > B0_5:
                st = lax.dot_general(X3[:, W0_5:WE_5], V702,
                                     (((0, 2), (0, 1)), ((), ())),
                                     preferred_element_type=jnp.int32)
                st = st.astype(jnp.int8).transpose(1, 0, 2) \
                    .reshape(3, (WE_5 - W0_5) * 234)
                st = st[:, T0_5 - 234 * W0_5:L_out5 - 234 * W0_5]
                il = interleave.interleave(st, cfg.tile.w, cfg.tile.h)
                suf = il[:, 234 * B0_5 - T0_5:]
                suf = jnp.pad(
                    suf,
                    ((0, 0), (0, 234 * (WE_5 - B0_5) - suf.shape[1])))
                suf3 = suf.reshape(3, WE_5 - B0_5, 234)
                W2 = jnp.asarray(_fold234_enc())
                py.append(jnp.stack(
                    [lax.dot_general(suf3[d], W2,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32)
                     .astype(jnp.int8) for d in range(3)], axis=3))
            if WE_5 < nblk7:
                py.append(jnp.zeros((nblk7 - WE_5, 3, 3, 3, 26),
                                    jnp.int8))
            Y = jnp.concatenate(py, axis=0) if len(py) > 1 else py[0]
        elif p5:
            # P5: extract the symbol stream planes (one 702-period
            # permutation dot), interleave on (3, L) (whole tiles are
            # a reshape+row-flip, ops/interleave.py), then fold the
            # permuted stream straight into the blocked Y layout --
            # stream index 234*n7 + 9i + b at band b = 3u + v
            st = lax.dot_general(X3, V702, (((0, 2), (0, 1)), ((), ())),
                                 preferred_element_type=jnp.int32)
            st = st.astype(jnp.int8).transpose(1, 0, 2) \
                .reshape(3, 234 * nblk7)               # (3 d, L)
            st = interleave.interleave(st[:, :L_out5],
                                       cfg.tile.w, cfg.tile.h)
            st = jnp.pad(st, ((0, 0), (0, 234 * nblk7 - L_out5)))
            st3 = st.reshape(3, nblk7, 234)
            W2 = jnp.asarray(_fold234_enc())
            Y = jnp.stack(
                [lax.dot_general(st3[d], W2, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
                 .astype(jnp.int8) for d in range(3)],
                axis=3)                                # (n7, u, v, d, i)
        elif ysplit:
            # one dot PER GROUP against a pre-sliced
            # P702 (the group's v-range of the 702 output axis) so no
            # full (n7, 702) grid ever materializes -- an A/B against
            # the relayout copy XLA still inserts between the single
            # big dot and the group slices (copy.96, ~65 ms / 48
            # frames in the 2026-08-19 trace).  Emitting the blocked
            # (M, Lk, ...) shape directly from each group dot was
            # tried and REGRESSED 43.4 -> 39.8 fps (the blocked dot
            # output forces worse tile layouts than the reshape it
            # saves; docs/PERF.md round-2 ledger)
            Yg_all = {}
            for (lo_g, hi_g), Pg in Pg_split.items():
                Yg = lax.dot_general(X3, Pg,
                                     (((0, 2), (1, 2)), ((), ())),
                                     preferred_element_type=jnp.int32)
                Yg_all[(lo_g, hi_g)] = Yg.astype(jnp.int8) \
                    .reshape(nblk7, 3, hi_g - lo_g, 3, 26)
            if b0 >= 0 and blocks0:
                Yb0 = lax.dot_general(X3, Pg_b0,
                                      (((0, 2), (1, 2)), ((), ())),
                                      preferred_element_type=jnp.int32)
                Yb0 = Yb0.astype(jnp.int8).reshape(nblk7, 3, 26)
            Y = None
        for k, lo, hi, pd_k, Dk, Pk, offD, offP in consts:
            Lk = k // 2
            Bk = Lk * M
            Yg = (Yg_all[(lo, hi)] if ysplit
                  else Y[:, :, lo:hi])             # (n7, 3, gv, 3, 26)
            Yg = (jnp.pad(Yg, ((0, Bk - nblk7),) + ((0, 0),) * 4)
                  if Bk > nblk7 else Yg[:Bk])
            Yg = Yg.reshape(M, Lk, 3, hi - lo, 3, 26)
            # data: (3u, gv, M, 3d, 13, k)
            data = lax.dot_general(Yg, Dk,
                                   (((5, 1), (2, 3)), ((2, 3), (0, 1))),
                                   preferred_element_type=PT)
            sd = fmod3(data.astype(jnp.float32)
                       + offD.swapaxes(2, 3)).astype(jnp.int8)
            wd = sd[:, :, :, 0] + 3 * sd[:, :, :, 1] + 9 * sd[:, :, :, 2]
            if pd_k:
                # unscrambled data digits: D_k is a permutation, so
                # the data dot's output already IS the trit (0..2)
                ud = data.astype(jnp.int8)
                # parity: (3u, gv, M, 13, 3d', r) -- one k-contraction
                # per input digit plane (safe dot shape), summed
                par = sum(
                    lax.dot_general(ud[:, :, :, d], Pk[d],
                                    (((4,), (0,)), ((), ())),
                                    preferred_element_type=PT)
                    for d in range(3))
                sp = fmod3(par.astype(jnp.float32)
                           + offP.transpose(0, 1, 2, 4, 3, 5)) \
                    .astype(jnp.int8)
                wp = (sp[..., 0, :] + 3 * sp[..., 1, :]
                      + 9 * sp[..., 2, :])
            else:
                # parity: (3u, gv, M, 3d', 13, r)
                par = lax.dot_general(
                    Yg, Pk, (((1, 4, 5), (4, 2, 3)), ((2, 3), (0, 1))),
                    preferred_element_type=PT)
                sp = fmod3(par.astype(jnp.float32)
                           + offP).astype(jnp.int8)
                wp = (sp[:, :, :, 0] + 3 * sp[:, :, :, 1]
                      + 9 * sp[:, :, :, 2])
            parts.append(jnp.concatenate([wd, wp], axis=-1))
        body = jnp.concatenate(parts, axis=1)      # (3, 3, M, 13, 26)
        if b0 >= 0:
            if blocks0:
                Yg0 = Yb0 if ysplit else Y[:, u0, v0]  # (n7, 3, 26)
                Yg0 = (jnp.pad(Yg0, ((0, Bk0 - nblk7), (0, 0), (0, 0)))
                       if Bk0 > nblk7 else Yg0[:Bk0])
                Yg0 = Yg0.reshape(M0, Lk0, 3, 26)
                d0 = lax.dot_general(Yg0, Dk0,
                                     (((3, 1), (0, 1)), ((), ())),
                                     preferred_element_type=PT)
                sd0 = fmod3(d0.astype(jnp.float32)).astype(jnp.int8)
                p0 = lax.dot_general(Yg0, Pk0,
                                     (((1, 2, 3), (2, 0, 1)), ((), ())),
                                     preferred_element_type=PT)
                sp0 = fmod3(p0.astype(jnp.float32)).astype(jnp.int8)
                cw = jnp.concatenate([sd0, sp0], axis=-1)
                stream = cw.transpose(1, 0, 2, 3) \
                    .reshape(3, M0 * 13 * 26)[:, :blocks0 * 26]
            else:
                stream = jnp.zeros((3, 0), dtype=jnp.int8)
            stream = jnp.pad(stream,
                             ((0, 0), (0, SL - blocks0 * 26)))
            col = jnp.concatenate(
                [jnp.broadcast_to(bsym_j[:, None, None], (3, S, 1)),
                 stream.reshape(3, S, p - 1)], axis=2)
            col = fmod3(col.astype(jnp.float32)
                        + offb_j).astype(jnp.int8)
            w0 = (col[0] + 3 * col[1] + 9 * col[2]).reshape(S * p)
            w0 = jnp.pad(w0[:H], (0, NB * 26 - H)).reshape(M, 13, 26)
            body = body.at[u0, v0].set(w0)
        bodyT = body.reshape(NUM_BANDS, NB * 26)[:, :H]
        return jnp.concatenate([jnp.asarray(hdrT), bodyT], axis=1)

    return fn


# ---------------------------------------------------------------------------
# decode (check / none)
# ---------------------------------------------------------------------------


def decode_supported(layout, rs_mode: str) -> bool:
    hdr = layout.hdr
    if rs_mode in ("paged", "full") and hdr.beacon.enabled:
        return False  # beacon-band repair keeps the v2 per-band machinery
    return (rs_mode in ("check", "none", "paged", "full")
            and _eligible(hdr.profile, hdr.tile, hdr.beacon, layout.geom))


@functools.cache
def check_decode_fn_v3(layout, rs_mode: str = "check"):
    """Wire-planes body (9, H) -> (out planes (9, n_out), ok scalar),
    matching _decode_body_fn(wire="planes") bit-exactly for clean AND
    corrupted streams (ok semantics: every block's syndromes are zero)."""
    from . import pipeline as pl
    hdr, geom = layout.hdr, layout.geom
    beacon = hdr.beacon
    b0 = beacon.band_slot if beacon.enabled else -1
    groups = _groups(geom, hdr.uep, b0)
    H = geom.H
    nblk_u = H // rs.N           # full codewords per uniform band
    nbq = -(-H // rs.N)          # grid blocks incl. the partial tail
    M = -(-nbq // 13)
    NB = 13 * M
    max_d = max(geom.blocks[b] * geom.ks[b] for b in range(NUM_BANDS))
    MB = -(-max_d // 26)
    n_out = layout.n_out_words

    pat = np.asarray(_np_pat(hdr.seed), dtype=np.float32)
    b9 = np.arange(NUM_BANDS)
    off_even = jnp.asarray(pat[b9 % 6])
    off_odd = jnp.asarray(pat[(3 + b9) % 6])
    # one r=8 syndrome dot serves every band (trimming it to the groups'
    # max r measured NEUTRAL -- the dot was already DMA-hidden, so the
    # T3_V3_SROWS knob was retired; docs/PERF.md round-2 ledger)
    srows = 8
    S8 = jnp.asarray(
        np.asarray(rs._matrices_pm(18)["S2"])
        .reshape(3, 8, 3, rs.N)[:, :srows]
        .reshape(3 * srows, 3, rs.N), dtype=jnp.int8)   # (3*srows, 3, 26)
    # per-(u, v) syndrome row mask: band 3u+v checks its group's r = 26-k
    # rows; the beacon band position is fully masked (its column has its
    # own row geometry -- checked separately below)
    rmask = np.zeros((3, srows, 3, 3, 1, 1), dtype=bool)
    for k, lo, hi in groups:
        rmask[:, :rs.N - k, :, lo:hi] = True
    if b0 >= 0:
        rmask[:, :, b0 // 3, b0 % 3] = False
    # block-range mask: v2's check covers exactly the 16-ceil page region
    # [0, nblk_p) per band -- when nblk_u is already a 16-multiple and
    # H % 26 != 0, the partial tail block (dead stream-pad cells, never
    # read back) lies OUTSIDE it and is deliberately unchecked there;
    # match that block range exactly (test_beacon_v3_bit_exact caught the
    # divergence on a (sf=300, 13x7, beacon) config in round 3)
    nblk_pg = max(-(-(H // rs.N) // 16) * 16, 16)
    bk_i = 13 * np.arange(M)[:, None] + np.arange(13)
    rmask = rmask & (bk_i < nblk_pg)
    rmask = jnp.asarray(rmask)
    C_bw = np.asarray(pl._unpack702_bw())
    i27 = np.arange(27)
    C_dm_np = C_bw[3 * (i27 % NUM_BANDS) + i27 // NUM_BANDS]
    # blocked-assembly constant: the (d, u, v) row factors split out so the
    # final contraction consumes the group outputs directly -- the flat
    # variant's merge-to-8710/re-split-to-(MB, 26) reshapes materialized
    # (~57 ms / 32 frames in the v3 trace; its T3_V3_ASM knob is retired)
    C_dm5 = jnp.asarray(C_dm_np.reshape(3, 3, 3, *C_dm_np.shape[1:]))
    extract = [(k, lo, hi, jnp.asarray(_extract_const(k)))
               for k, lo, hi in groups]
    # Folded descramble (check/none modes): the wire divmod digits stay
    # UNdescrambled; the per-cell scramble offsets -- data-independent --
    # fold through the linear syndrome/extraction stages into small
    # host-built output-side constants.  Drops the (9, NB*26) offset
    # where/mul/sub from the hot digit-grid fusion (the offsets were the
    # only reason the grid pass touched f32 broadcast state).  The paged
    # path keeps the descrambled grid (its correction machinery reads it
    # pervasively).  Chip A/B 42.39 -> 43.88 (docs/PERF.md).
    fold_scr = rs_mode in ("check", "none")
    if fold_scr:
        h9 = np.arange(NB * 26)
        off_np = np.where((h9 & 1) == 0, pat[b9[:, None] % 6],
                          pat[(3 + b9[:, None]) % 6]) * (h9 < H)  # (9, cells)
        off_b = off_np.reshape(NUM_BANDS, M, 13, 26)
        S8d = np.asarray(S8).sum(axis=1)                 # (3*srows, 26)
        # The dense syndrome offset (-S8d . off) mod 3 is (3, srows, 3,
        # 3, M, 13) f32 (~0.3 MB) -- but block offsets only come in THREE
        # regimes: every fully-in-range block (26 bk + 25 < H) shares one
        # value per (row, band) since the cell offsets are a pure parity
        # pattern, the single partial block (bk == H // 26, if H % 26)
        # has its own masked sum, and blocks past H contribute zero.  Ship
        # the two (3, srows, 3, 3) constants + (M, 13) regime masks and
        # select AROUND the data (see off_fold below for why a where).
        c26 = np.arange(26)
        pat_e9, pat_o9 = pat[b9 % 6], pat[(3 + b9) % 6]
        bkf, part = H // 26, H % 26
        _sumpar = lambda cmask: (
            (-(np.outer((S8d * (cmask & ((c26 & 1) == 0))).sum(1), pat_e9)
               + np.outer((S8d * (cmask & ((c26 & 1) == 1))).sum(1),
                          pat_o9))) % 3)                 # (3*srows, 9)
        OffS_base = _sumpar(np.ones(26, dtype=bool))
        OffS_tail = _sumpar(c26 < part)
        dense = np.zeros((3 * srows, NUM_BANDS, M * 13))
        dense[:, :, :bkf] = OffS_base[:, :, None]
        if part:
            dense[:, :, bkf] = OffS_tail
        assert np.array_equal(
            dense.reshape(-1, NUM_BANDS, M, 13),
            (-np.einsum("tc,bmjc->tbmj", S8d, off_b)) % 3)
        bk_i = np.arange(M * 13).reshape(M, 13)
        mkS_full = jnp.asarray(bk_i < bkf)
        mkS_part = jnp.asarray(bk_i == bkf) if part else None
        OffS_base = jnp.asarray(
            OffS_base.reshape(3, srows, 3, 3, 1, 1).astype(np.float32))
        OffS_tail = jnp.asarray(
            OffS_tail.reshape(3, srows, 3, 3, 1, 1).astype(np.float32))
        # The dense per-group extraction offset OffE (3, gv, M, Lk, 26)
        # f32 (~0.2 MB/group) was re-fetched from HBM into VMEM on EVERY
        # micro-batch step (trace: the two slice-start ops on it were 22%
        # of device time).  It factors exactly: with k even, the parity
        # of the wire cell h = (13m + j)*26 + c feeding output cell
        # (J, i) -- (j, c) = divmod(26J + i, k) -- equals parity(i), so
        # the offset value depends only on (band, parity(i)), and the
        # (m, J, i) structure is just the h < H in-range mask.  Ship the
        # (3, gv, 26) parity constant + (M, Lk, 26) bool mask (~10 KB,
        # VMEM-resident) and combine them AROUND the data (a where) so
        # XLA cannot constant-fold them back into the dense product.
        off_fold = []
        for k, lo, hi, _E in extract:
            assert k % 2 == 0
            Lk = k // 2
            gv = hi - lo
            bands = 3 * np.arange(3)[:, None] + lo + np.arange(gv)
            i26 = np.arange(26)
            OffP = np.where((i26 & 1) == 0, pat[bands[..., None] % 6],
                            pat[(3 + bands[..., None]) % 6]) \
                .astype(np.float32)                          # (3, gv, 26)
            j_, c_ = np.divmod(26 * np.arange(Lk)[:, None] + i26, k)
            msk = ((13 * np.arange(M)[:, None, None] + j_) * 26 + c_
                   < H)                                      # (M, Lk, 26)
            dense = (OffP[:, :, None, None, :]
                     * msk[None, None].astype(np.float32))
            chk = np.stack([[off_b[3 * u + lo + vv][:, j_, c_]
                             for vv in range(gv)] for u in range(3)])
            assert np.array_equal(dense, chk.astype(np.float32))
            off_fold.append((jnp.asarray(3.0 - OffP[:, :, None, None, :]),
                             jnp.asarray(msk)))
        if b0 >= 0:
            off_col = jnp.asarray(off_np[b0, :H].astype(np.float32))
    p5 = pl._is_p5(hdr.profile, hdr.tile)
    if p5:
        dlens5 = [geom.blocks[b] * geom.ks[b] for b in range(NUM_BANDS)]
        L_out5 = int(min(NUM_BANDS * dlens5[b] + b for b in range(NUM_BANDS)))
        assert L_out5 <= 234 * MB
        N7w = -(-n_out // 27)
        # v2's P5 assembly constant, (9 r, 27 w)-shaped for the blocked dot
        U702 = jnp.asarray(
            np.asarray(pl._stream702()).reshape(3, 234, NUM_BANDS, 27))
    dfuse_on = p5 and os.environ.get("T3_P5_FUSE", "1") == "1"
    p5_fuse = dfuse_on and _fuse_ok(hdr.tile.w, hdr.tile.h)
    # w | 234, odd h > 1: per-flip-class fused constants (_cls_consts)
    p5_cls = dfuse_on and not p5_fuse and 234 % hdr.tile.w == 0
    # w not dividing 234, small class period: decode rides the full-fold
    # CUW class dots (measured at the class-dot floor; _win_dec_consts)
    p5_win = (dfuse_on and not p5_fuse and not p5_cls
              and _win_pa(hdr.tile.w, hdr.tile.h) <= _WIN_PA_MAX)
    # w not dividing 234, large Pa: the stream-rev decode
    p5_sr = dfuse_on and not p5_fuse and not p5_cls and not p5_win
    # the fused dot consumes block PAIRS: pad the grid to an even block
    # count (the extra block is zero stream tail, never read back)
    MBa = MB + (MB & 1) if p5_fuse else MB
    if p5_fuse or p5_cls or p5_win or p5_sr:
        A5 = hdr.tile.w * hdr.tile.h
        nfull5 = (L_out5 // A5) * A5
        B0_5 = nfull5 // 234
        WE_5 = -(-L_out5 // 234)
        T0_5 = (234 * B0_5 // A5) * A5
        W0_5 = T0_5 // 234
        # single-plane (u,v,c) -> t fold for the tail segment (the d axis
        # of _fold234_dec is identical planes; it rides the flattened rows)
        F2j = jnp.asarray(np.asarray(_fold234_dec())[0].reshape(234, 234))
    if p5_fuse:
        CUj = jnp.asarray(_fuse_dec_const(hdr.tile.w, hdr.tile.h))
    if p5_cls:
        Ph5, _VCS5, CUS5 = _cls_consts(hdr.tile.w, hdr.tile.h)
        CUSj = jnp.asarray(CUS5)
        MBc = -(-MBa // Ph5) * Ph5        # class-dot pad (sliced back)
    if p5_win:
        Pa5, CUW5 = _win_dec_consts(hdr.tile.w, hdr.tile.h)
        CUWj = jnp.asarray(CUW5)
        MBw = -(-MBa // Pa5) * Pa5        # class-dot pad (sliced back)
    if p5_sr:
        # stream-rev decode (mirror of encode): unfold the data grid to
        # stream planes with the single-plane F2j dot, apply the SAME
        # reversal class dots + parity mask (the snake is an involution),
        # rebuild RAW words with the U702 digit dots
        Rs5d, Rn5d, Pw, form5d = _stream_rev2(hdr.tile.w)
        Rsr_dj = (jnp.asarray(Rs5d),
                  None if Rn5d is None else jnp.asarray(Rn5d), Pw, form5d)
        MBp = -(-MBa // Pw) * Pw
        mksd_j = jnp.asarray(
            _stream_flip_mask(MBa, hdr.tile.w, hdr.tile.h))
    # paged repair replicates v2's page geometry exactly (16-block pages
    # over the band's ceil-to-16 block count) so correction decisions --
    # including beyond-capacity overflow -- are bit-identical
    nblk_p = max(-(-nblk_u // 16) * 16, 16)
    PT = jnp.int32

    if b0 >= 0:
        u0, v0 = b0 // 3, b0 % 3
        k0 = geom.ks[b0]
        Lk0, r0 = k0 // 2, rs.N - k0
        blocks0 = geom.blocks[b0]
        M0 = -(-blocks0 // 13) if blocks0 else 0
        p = beacon.words_period
        Sb_ = -(-H // p)
        SLb = Sb_ * (p - 1)
        Ek0 = jnp.asarray(_extract_const(k0)) if blocks0 else None

    def fn(body_T):                                        # (9, H)
        # pad the 9-row wire BEFORE divmod/descramble (1/3 the bytes of
        # padding the 27-row digit stack); offsets are zero past H so the
        # padded cells descramble to zero = valid codewords
        wT = jnp.pad(body_T, ((0, 0), (0, NB * 26 - H))).astype(jnp.float32)
        q1 = jnp.floor(wT * (1.0 / 3.0))
        q2 = jnp.floor(wT * (1.0 / 9.0))
        planes = (wT - 3.0 * q1, q1 - 3.0 * q2,
                  q2 - 3.0 * jnp.floor(q2 * (1.0 / 3.0)))
        if fold_scr:
            # UNdescrambled digits; offsets fold into OffS_c / off_fold /
            # off_col at the (linear) consumers below
            dig = jnp.stack([p.astype(jnp.int8) for p in planes],
                            axis=0).reshape(3, 3, 3, M, 13, 26)
        else:
            h_even = (jnp.arange(NB * 26, dtype=jnp.int32) & 1) == 0
            in_h = jnp.arange(NB * 26, dtype=jnp.int32) < H
            off = jnp.where(h_even[None, :], off_even[:, None],
                            off_odd[:, None]) \
                * in_h[None, :].astype(jnp.float32)
            dig = jnp.stack(
                [fmod3(p - off + 3.0).astype(jnp.int8) for p in planes],
                axis=0).reshape(3, 3, 3, M, 13, 26)        # (d, u, v, M, j, c)
        S_pg = None
        oks = []
        if rs_mode == "none":
            ok = jnp.asarray(True)
        elif rs_mode in ("paged", "full"):
            S_pg = lax.dot_general(S8, dig, (((1, 2), (0, 5)), ((), ())),
                                   preferred_element_type=PT)
            S_pg = fmod3(S_pg.astype(jnp.float32)).astype(jnp.int8) \
                .reshape(3, srows, 3, 3, M, 13)
            ok = None                                      # set after the loop
        else:
            S = lax.dot_general(S8, dig, (((1, 2), (0, 5)), ((), ())),
                                preferred_element_type=PT)
            S = S.astype(jnp.float32).reshape(3, srows, 3, 3, M, 13)
            # folded descramble: add the offsets' syndrome contribution
            # ((-S8 . off) mod 3) -- regime-selected small constants (see
            # the fold build above), data inside the wheres so XLA can't
            # fold them back into the dense (.., M, 13) constant
            if fold_scr:
                St = (jnp.where(mkS_part, S + OffS_tail, S)
                      if mkS_part is not None else S)
                S = jnp.where(mkS_full, S + OffS_base, St)
            S = fmod3(S)                                   # (d', r8, u, v, ...)
            # uniform bands: exactly the blocks v2's 16-ceil page region
            # covers are checked (rmask carries the [0, nblk_pg) block
            # range -- see the rmask build for the tail-cell edge case)
            ok = ~jnp.any((S != 0.0) & rmask)
        outs = []
        for gi, (k, lo, hi, Ek) in enumerate(extract):
            Lk = k // 2
            dg = dig[:, :, lo:hi]                          # (3, 3, gv, M, 13, 26)
            pg = lax.dot_general(dg, Ek, (((4, 5), (0, 1)), ((), ())),
                                 preferred_element_type=jnp.int32)
            if fold_scr:
                # folded descramble: the extraction is a permutation, so
                # each output cell subtracts its own cell's offset.  The
                # offset = parity constant x in-range mask (see the
                # off_fold build above); 3 - off keeps fmod3's operand
                # non-negative, and the where keeps the two small
                # constants from constant-folding into the dense product
                op_, mk_ = off_fold[gi]
                pgf = pg.astype(jnp.float32)
                pg = fmod3(jnp.where(mk_, pgf + op_, pgf))
            pg = pg.astype(jnp.int8)                       # (3, 3, gv, M, Lk, 26)
            # merge only (M, Lk) -> grid block B = m*Lk + J; the 26
            # stays a separate axis end-to-end (no flatten/re-split)
            pf = pg.reshape(3, 3, hi - lo, M * Lk, 26)
            pf = (pf[:, :, :, :MBa] if M * Lk >= MBa
                  else jnp.pad(pf, ((0, 0),) * 3
                               + ((0, MBa - M * Lk), (0, 0))))
            if rs_mode == "paged":
                # page-compacted correction on the blocked grid,
                # replicating _decode_body_fn's v2 paged machinery
                # byte-for-byte (same band-major page order, capacity,
                # slot-gather merge, ok semantics) -- only the pre
                # (divmod/descramble), extraction, and assembly around
                # it take the cheap v3 structure
                gv = hi - lo
                g = 3 * gv
                r = rs.N - k
                npage = nblk_p // 16
                dgb = dg.transpose(1, 2, 0, 3, 4, 5) \
                    .reshape(3, gv, 3, NB, 26)         # (u, v, d, blk, c)
                dgb = (jnp.pad(dgb, ((0, 0),) * 3
                               + ((0, nblk_p - NB), (0, 0)))
                       if nblk_p > NB else dgb[:, :, :, :nblk_p])
                Ug = dgb.reshape(g, 3, npage, 16, 26)
                Sg = S_pg[:, :r, :, lo:hi].reshape(3, r, 3, gv, NB)
                Sg = (jnp.pad(Sg, ((0, 0),) * 4 + ((0, nblk_p - NB),))
                      if nblk_p > NB else Sg[..., :nblk_p])
                Sg = Sg.reshape(3, r, g, nblk_p)
                dirty = jnp.any(Sg.reshape(3 * r, g, nblk_p) != 0,
                                axis=0)
                C = min(g * npage, max(6, g))
                pdirty = jnp.any(dirty.reshape(g, npage, 16), axis=2) \
                    .reshape(-1)                       # (g*npage,)
                pidx = jnp.sort(jnp.where(pdirty,
                                          jnp.arange(g * npage),
                                          g * npage))[:C]
                psafe = jnp.where(pidx < g * npage, pidx, 0)
                bb = psafe // npage
                pp = psafe - bb * npage
                g_rd = Ug[bb, :, pp]                   # (C, 3, 16, 26)
                g_rd = g_rd.transpose(1, 3, 0, 2) \
                    .reshape(3, rs.N, C * 16)
                Sv = Sg.transpose(2, 0, 1, 3) \
                    .reshape(g, 3, r, npage, 16)[bb, :, :, pp] \
                    .transpose(1, 2, 0, 3).reshape(3, r, C * 16)
                d_c, ok_c = rs._correct_pm(g_rd, Sv, k)
                delta_g = _m3i(d_c - g_rd[:, :k])
                rank = jnp.cumsum(pdirty.astype(jnp.int32)) - 1
                slot = jnp.clip(rank, 0, C - 1)
                use_corr = pdirty & (rank < C)
                dpages = delta_g.reshape(3, k, C, 16) \
                    .transpose(2, 0, 3, 1).reshape(C, 3, 16 * k)
                delta = jnp.where(use_corr[:, None, None],
                                  dpages[slot], jnp.int8(0)) \
                    .reshape(g, npage, 3, 16 * k).transpose(0, 2, 1, 3) \
                    .reshape(g, 3, nblk_p * k)
                ok_pages = ok_c.reshape(C, 16)[slot]
                okb = jnp.where(use_corr[:, None], ok_pages,
                                (~dirty).reshape(g * npage, 16))
                oks.append(okb.reshape(-1))
                # deltas re-blocked from (blk, k) coords to the 26-col
                # grid stream; corrections past the full codewords are
                # dropped like v2's [:nblk_u] stream truncation
                dstream = jnp.pad(
                    delta[:, :, :nblk_u * k],
                    ((0, 0), (0, 0), (0, MBa * 26 - nblk_u * k)))
                dpf = dstream.reshape(3, gv, 3, MBa, 26) \
                    .transpose(2, 0, 1, 3, 4)          # (d, u, v, MB, c)
                pf = _m3i(pf + dpf)
            elif rs_mode == "full":
                # unconditional BM/Chien/Forney over EVERY block of the
                # group (adversarially dense damage, v2 full semantics:
                # the chain runs on all nblk_p page-padded blocks and ok
                # covers them all); the correction lands as a delta on
                # the already-extracted blocked data, like paged
                gv = hi - lo
                g = 3 * gv
                r = rs.N - k
                dgb = dg.transpose(1, 2, 0, 3, 4, 5) \
                    .reshape(3, gv, 3, NB, 26)         # (u, v, d, blk, c)
                dgb = (jnp.pad(dgb, ((0, 0),) * 3
                               + ((0, nblk_p - NB), (0, 0)))
                       if nblk_p > NB else dgb[:, :, :, :nblk_p])
                g_rd = dgb.reshape(g, 3, nblk_p, 26) \
                    .transpose(1, 3, 0, 2).reshape(3, rs.N, g * nblk_p)
                Sg = S_pg[:, :r, :, lo:hi].reshape(3, r, 3, gv, NB)
                Sg = (jnp.pad(Sg, ((0, 0),) * 4 + ((0, nblk_p - NB),))
                      if nblk_p > NB else Sg[..., :nblk_p])
                Sv = Sg.reshape(3, r, g * nblk_p)
                d_c, ok_c = rs._correct_pm(g_rd, Sv, k)
                oks.append(ok_c)
                delta = _m3i(d_c - g_rd[:, :k]) \
                    .reshape(3, k, g, nblk_p).transpose(2, 0, 3, 1) \
                    .reshape(g, 3, nblk_p * k)
                dstream = jnp.pad(
                    delta[:, :, :nblk_u * k],
                    ((0, 0), (0, 0), (0, MBa * 26 - nblk_u * k)))
                dpf = dstream.reshape(3, gv, 3, MBa, 26) \
                    .transpose(2, 0, 1, 3, 4)
                pf = _m3i(pf + dpf)
            outs.append(pf)
        if rs_mode in ("paged", "full"):
            ok = jnp.all(jnp.concatenate(oks))
        M5 = jnp.concatenate(outs, axis=2)             # (3, 3, 3, MB, 26)
        if b0 >= 0:
            # beacon band: inverse splice (drop the beacon column of
            # the (S, p) row grid), check/extract its own codewords,
            # overwrite the group machinery's throwaway column
            if blocks0:
                bcol = dig[:, u0, v0].reshape(3, NB * 26)[:, :H]
                if fold_scr:
                    # descramble just this column (the folded grid is
                    # raw digits); pilot cells keep a junk offset but
                    # the (S, p)[:, 1:] payload slice below drops them
                    bcol = fmod3(bcol.astype(jnp.float32)
                                 + (3.0 - off_col)).astype(jnp.int8)
                bcol = jnp.pad(bcol, ((0, 0), (0, Sb_ * p - H)))
                bstr = bcol.reshape(3, Sb_, p)[:, :, 1:] \
                    .reshape(3, SLb)[:, :blocks0 * 26]
                bcw = jnp.pad(
                    bstr, ((0, 0), (0, M0 * 13 * 26 - blocks0 * 26))) \
                    .reshape(3, M0, 13, 26)
                if rs_mode != "none":
                    Sb = lax.dot_general(S8, bcw,
                                         (((1, 2), (0, 3)), ((), ())),
                                         preferred_element_type=PT)
                    Sb = fmod3(Sb.astype(jnp.float32)) \
                        .reshape(3, srows, M0, 13)
                    bblk_ok = (lax.broadcasted_iota(
                        jnp.int32, (M0, 13), 0) * 13
                        + lax.broadcasted_iota(
                            jnp.int32, (M0, 13), 1)) < blocks0
                    ok = ok & ~jnp.any(
                        (Sb[:, :r0] != 0.0) & bblk_ok)
                pf0 = lax.dot_general(bcw, Ek0,
                                      (((2, 3), (0, 1)), ((), ())),
                                      preferred_element_type=jnp.int32) \
                    .astype(jnp.int8).reshape(3, M0 * Lk0, 26)
                pf0 = (pf0[:, :MBa] if M0 * Lk0 >= MBa
                       else jnp.pad(pf0, ((0, 0), (0, MBa - M0 * Lk0),
                                          (0, 0))))
            else:
                pf0 = jnp.zeros((3, MBa, 26), dtype=jnp.int8)
            M5 = M5.at[:, u0, v0].set(pf0)
        if p5_fuse or p5_cls or p5_win or p5_sr:
            # snake-composed P5: single-702-contraction dots from the
            # (B, u, v, d, c)-transposed data grid straight to RAW words
            # -- the deinterleave is folded into CUj (_fuse_dec_const)
            # for half-eligible tiles, or applied as the stream-domain
            # rev/mask (_stream_rev/_stream_flip_mask -- the snake is an
            # involution, so the SAME constants as encode) between the
            # unfold and rebuild dots; the final partial
            # tile / stream-end word blocks are rebuilt through the
            # stream machinery on a tiny grid segment.  Joint (3, 3, 26)
            # contractions miscompile under vmap (_fuse_dec_const);
            # one grid transpose buys the safe single-dim shape.
            M5g = M5.transpose(3, 1, 2, 0, 4)      # (B, u, v, d, c)
            if p5_fuse:
                M5t = M5g.reshape(MBa // 2, 2, 702)
                wm = jnp.stack(
                    [lax.dot_general(M5t[:, hf], CUj[hf],
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32)
                     for hf in range(2)])          # (2, MBa/2, 9, 27)
                main_T_full = (lambda: wm.astype(jnp.int8)
                               .transpose(2, 1, 0, 3)
                               .reshape(NUM_BANDS, MBa * 27))
            elif p5_cls:
                # per-flip-class fuse: one class-batched single-702
                # contraction (the chip-proven shifted-window dot family)
                # straight to RAW words -- the deinterleave (the same
                # involution) rides CUS (_cls_consts)
                Gc = M5g.reshape(MBa, 702)
                if MBc > MBa:
                    Gc = jnp.pad(Gc, ((0, MBc - MBa), (0, 0)))
                G5 = Gc.reshape(MBc // Ph5, Ph5, 702)
                wmc = lax.dot_general(G5, CUSj,
                                      (((2,), (1,)), ((1,), (0,))),
                                      preferred_element_type=jnp.int32)
                main_T_full = (lambda: wmc.astype(jnp.int8)
                               .transpose(2, 1, 0, 3)
                               .reshape(NUM_BANDS, MBc * 27)
                               [:, :MBa * 27])
            elif p5_win:
                # 3-delta full-fold word rebuild: three class-batched
                # single-702 contractions over prev/self/next grid views
                # (_win_dec_consts; disjoint support -> exact s8 sum) --
                # measured AT the class-dot floor, kept over the
                # stream-rev decode for Pa <= _WIN_PA_MAX
                Gw = jnp.pad(M5g.reshape(MBa, 702),
                             ((1, MBw - MBa + 1), (0, 0)))
                wmw = sum(
                    lax.dot_general(
                        lax.slice_in_dim(Gw, dlt, dlt + MBw, axis=0)
                        .reshape(MBw // Pa5, Pa5, 702),
                        CUWj[dlt], (((2,), (1,)), ((1,), (0,))),
                        preferred_element_type=jnp.int32)
                    .astype(jnp.int8)
                    for dlt in range(3))          # (Pa, MBw/Pa, 9, 27)
                main_T_full = (lambda: wmw
                               .transpose(2, 1, 0, 3)
                               .reshape(NUM_BANDS, MBw * 27)
                               [:, :MBa * 27])
            else:
                # stream-rev decode (mirror of the encode branch): unfold
                # to stream planes (single-234 F2j contraction, d free),
                # the SAME small reversal class dots + parity mask (the
                # snake is an involution), then the U702 rebuild dots --
                # all in the (B, 3, 234) block-leading layout (the block
                # axis stays leading so a batched caller can merge it
                # with the micro-batch axis for full-M class dots).
                st = lax.dot_general(
                    M5g.transpose(0, 3, 1, 2, 4).reshape(MBa, 3, 234),
                    F2j, (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32) \
                    .astype(jnp.int8)              # (MBa, 3, 234)
                sd = _rev_mask(st, Rsr_dj, Pw, MBp, mksd_j)
                wm = sum(
                    lax.dot_general(sd[:, d], U702[d],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
                    for d in range(3)).astype(jnp.int8)    # (MBa, 9, 27)
                main_T_full = (lambda: wm.transpose(1, 0, 2)
                               .reshape(NUM_BANDS, MBa * 27))
            outs_w = []
            nb_main = min(B0_5, N7w)
            if nb_main:
                outs_w.append(main_T_full()[:, :27 * nb_main])
            if N7w > B0_5:
                Msg = M5g[W0_5:WE_5].transpose(3, 0, 1, 2, 4) \
                    .reshape(3 * (WE_5 - W0_5), 234)
                seg = lax.dot_general(
                    Msg, F2j, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32) \
                    .astype(jnp.int8).reshape(3, (WE_5 - W0_5) * 234)
                seg = seg[:, T0_5 - 234 * W0_5:L_out5 - 234 * W0_5]
                sde = interleave.deinterleave(seg, hdr.tile.w,
                                              hdr.tile.h)
                suf = sde[:, 234 * B0_5 - T0_5:]
                TL5 = 234 * (N7w - B0_5)
                suf = (suf[:, :TL5] if suf.shape[1] >= TL5
                       else jnp.pad(suf,
                                    ((0, 0), (0, TL5 - suf.shape[1]))))
                stw = suf.reshape(3, N7w - B0_5, 234)
                wt = sum(
                    lax.dot_general(stw[d], U702[d],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
                    for d in range(3)).astype(jnp.int8)
                outs_w.append(wt.transpose(1, 0, 2)
                              .reshape(NUM_BANDS, (N7w - B0_5) * 27))
            out_T = (jnp.concatenate(outs_w, axis=1)
                     if len(outs_w) > 1 else outs_w[0])[:, :n_out]
            return out_T, ok
        if p5:
            # P5: unfold the data grid back to stream planes (index
            # 234*n7 + 9i + 3u + v), deinterleave on (3, L), rebuild
            # the RAW words with the 702-period contraction
            st = lax.dot_general(M5, jnp.asarray(_fold234_dec()),
                                 (((1, 2, 4), (1, 2, 3)), ((0,), (0,))),
                                 preferred_element_type=jnp.int32) \
                .astype(jnp.int8).reshape(3, 234 * MB)
            st = interleave.deinterleave(st[:, :L_out5],
                                         hdr.tile.w, hdr.tile.h)
            st = (jnp.pad(st, ((0, 0), (0, 234 * N7w - L_out5)))
                  if 234 * N7w > L_out5 else st[:, :234 * N7w])
            stw = st.reshape(3, N7w, 234)
            # one dot per digit plane, summed: the joint
            # ((3 d, 234 t)) contraction MISCOMPILES under vmap on
            # XLA:TPU (see _fold234_enc)
            wout5 = sum(
                lax.dot_general(stw[d], U702[d],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
                for d in range(3)).astype(jnp.int8)    # (N7w, 9, 27)
            out_T = wout5.transpose(1, 0, 2) \
                .reshape(NUM_BANDS, N7w * 27)[:, :n_out]
            return out_T, ok
        wout = lax.dot_general(C_dm5, M5,
                               (((0, 1, 2, 3), (0, 1, 2, 4)), ((), ())),
                               preferred_element_type=jnp.int32) \
            .astype(jnp.int8)                          # (243, MB)
        out_T = wout.reshape(NUM_BANDS, 27, MB).transpose(0, 2, 1) \
            .reshape(NUM_BANDS, MB * 27)[:, :n_out]
        return out_T, ok

    return fn
