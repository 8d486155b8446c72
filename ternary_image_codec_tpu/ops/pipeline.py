"""Superframe profile pipeline: RAW words <-> RS-protected profile words.

This is the codec's `encode_profile_from_raw` / `decode_profile_to_raw`
(old/include/ternary_image_codec_v6_min.hpp:1043-1169, 995-1041), rebuilt
TPU-first:

* Every stage is a static-shape tensor op: the 26-trit repack is a reshape,
  band mapping and beacon placement are precomputed gather index vectors,
  RS encode/decode are batched mod-3 matmuls (ops/rs.py), scrambling is a
  closed-form offset add (ops/scramble.py), and 2D interleave is a
  precomputed permutation (ops/interleave.py).
* Pipelines are specialized per (config, frame size): all index vectors are
  computed on the host once, and the jitted function is cached per layout.
  This is the idiomatic XLA treatment of the reference's data-dependent
  control flow.

Canonical layout note (divergence from the reference, recorded in
SURVEY.md section 0 and docs/DIVERGENCES.md): the reference's encoder and
decoder disagree with each other -- the encoder concatenates RS-coded bands
band-major and splices the header stream mid-word, while the decoder
expects band b in symbol slot b of each word (per the UEP spec,
old/documentation.txt:54-61) and reads the header as 6 whole words.  Since
the two were never mutually testable (the reference RS encoder is broken),
this rebuild implements the *spec-consistent* layout, matching the
reference DECODER's conventions:

  word 0..5   : 52 header symbols (2x RS(26,18)) + 2 zero pad
  word 6..6+H : body grid, H rows x 9 slots; band b occupies column b;
                beacon cells at (row % period == 0, col == band_slot) carry
                the (unscrambled) beacon symbol; each band's RS codeword
                stream fills its column top-down, skipping beacon cells;
                trailing cells that cannot hold a full 26-symbol codeword
                are zero fill.

Scrambler state advances over every body cell in row-major order (exactly
the reference decoder's descramble_words_inplace, old/.../v6_min.hpp:938-947);
beacon cells are left unscrambled (sync markers stay detectable), matching
the reference encoder's insertion of plain beacon symbols.
"""
from __future__ import annotations

import dataclasses
import functools
import os
import warnings
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..config import (BeaconPayload, EncoderConfig, NUM_BANDS, ProfileID,
                      SuperframeHeader, encode_beacon_symbol, rs_params_for)
from . import header as header_mod
from . import interleave, rs, scramble, subword

HEADER_WORDS = 6
HEADER_SYMS = 52
_PROFILE_KS = (24, 22, 20, 18)  # band_profile index 0..3 -> k


class PerformanceWarning(UserWarning):
    """A configuration is legal but measured far off this backend's
    throughput frontier (e.g. P5 tiles whose width does not divide 234,
    docs/PERF.md round-4 frontier analysis)."""


def env_repair_sfb(default: int) -> int:
    """Parse the T3_REPAIR_SFB repair-micro-batch override (shared by the
    auto-strategy dispatcher and bench.py so a malformed value fails with
    the same explanatory message at every consumer)."""
    try:
        r_sfb = int(os.environ.get("T3_REPAIR_SFB", "0"))
    except ValueError as e:
        raise ValueError(
            "T3_REPAIR_SFB must be an integer (repair micro-batch "
            f"size): {e}") from None
    return r_sfb if r_sfb > 0 else default


def _band_k(uep_idx: int) -> int:
    return _PROFILE_KS[uep_idx % 4]


def _beacon_rows(H: int, period: int) -> np.ndarray:
    if period <= 0:
        return np.zeros(0, dtype=np.int64)
    return np.arange(0, H, period)


def _band_lens(n_sy: int) -> np.ndarray:
    """Round-robin band lengths: band b gets symbols b, b+9, b+18, ..."""
    b = np.arange(NUM_BANDS)
    return (n_sy - b + NUM_BANDS - 1) // NUM_BANDS


@dataclasses.dataclass(frozen=True, eq=False)
class _GridGeom:
    """Shared encode/decode geometry of the body grid for one config + H.

    Pure arithmetic — no O(H) host arrays; all row/cell index vectors are
    computed on device from iota inside the jitted functions."""

    H: int
    ks: Tuple[int, ...]                 # per-band RS k
    usable: Tuple[int, ...]             # payload capacity per column
    blocks: Tuple[int, ...]             # full RS codewords per column
    beacon_sym: int


def _grid_geom(uep, beacon, H: int, beacon_sym: int) -> _GridGeom:
    ks, usable, blocks = [], [], []
    n_beacon_rows = (-(-H // beacon.words_period)
                     if beacon.enabled and beacon.words_period > 0 else 0)
    for b in range(NUM_BANDS):
        k = _band_k(uep.band_profile[b])
        ks.append(k)
        u = H - n_beacon_rows if (beacon.enabled and b == beacon.band_slot) else H
        usable.append(u)
        blocks.append(u // rs.N)
    return _GridGeom(H, tuple(ks), tuple(usable), tuple(blocks), beacon_sym)


# ---------------------------------------------------------------------------
# encode layout
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True, eq=False)
class EncodeLayout:
    cfg: EncoderConfig
    n_raw_words: int
    n_sy: int
    geom: _GridGeom
    header_words: np.ndarray     # (6, 9) int8 precomputed header words
    total_words: int


def _min_height(lens, uep, beacon) -> int:
    """Smallest H whose per-column capacity fits every band's codewords."""
    need_blocks = [int(-(-lens[b] // _band_k(uep.band_profile[b]))) for b in range(NUM_BANDS)]
    H = max((nb * rs.N for nb in need_blocks), default=0)
    if not beacon.enabled:
        return H
    if beacon.words_period == 1 and need_blocks[beacon.band_slot] > 0:
        # every row of the beacon band carries the beacon symbol: zero
        # payload capacity -- no height can fit this band's data (the
        # search below would loop forever)
        raise ValueError(
            "beacon words_period=1 leaves the beacon band with zero "
            "payload capacity; use a period >= 2 or an empty stream")
    while True:
        g = _grid_geom(uep, beacon, H, 0)
        if all(g.blocks[b] >= need_blocks[b] for b in range(NUM_BANDS)):
            return H
        H += 1


def _encode_header_words(cfg: EncoderConfig, frame_seq: int = 0) -> np.ndarray:
    hdr = SuperframeHeader(
        profile=cfg.profile, uep=cfg.uep, tile=cfg.tile, seed=cfg.seed,
        beacon=cfg.beacon, subword=cfg.subword, centered=cfg.centered,
        coset=cfg.coset, frame_seq=frame_seq)
    syms = header_mod.pack(hdr)
    A = np.zeros(18, dtype=np.int64)
    B = np.zeros(18, dtype=np.int64)
    A[:] = syms[:18]
    B[:9] = syms[18:27]
    encA = rs.np_encode(A, 18)
    encB = rs.np_encode(B, 18)
    out = np.zeros(HEADER_WORDS * NUM_BANDS, dtype=np.int8)
    out[:26] = encA
    out[26:52] = encB
    return out.reshape(HEADER_WORDS, NUM_BANDS)


@functools.cache
def build_encode_layout(cfg: EncoderConfig, n_raw_words: int,
                        frame_seq: int = 0) -> EncodeLayout:
    if cfg.beacon.enabled:
        if not (0 < cfg.beacon.words_period <= 26):
            # the header stores min(period, 26) (old/.../v6_min.hpp:267), so
            # periods > 26 cannot round-trip; reject instead of corrupting.
            raise ValueError("beacon words_period must be in 1..26")
        if not (0 <= cfg.beacon.band_slot < NUM_BANDS):
            raise ValueError("beacon band_slot must be in 0..8")
    if _is_p5(cfg.profile, cfg.tile) and not (cfg.tile.w <= 26
                                              and cfg.tile.h <= 26):
        # the header stores tile w, h mod 27 -- ONE GF(27) symbol each
        # (ops/header.py slots 7, 8; reference layout) -- so dims > 26
        # cannot round-trip: the reference's own P5 exemplar
        # (old/src/main.cpp, tile 64x64) re-parses as tile 10x10 and
        # deinterleaves the stream with the wrong permutation (valid
        # codewords, scrambled data).  Reject instead of corrupting
        # (docs/DIVERGENCES.md).
        raise ValueError(
            "P5 tile dims must be 1..26 (one header symbol each)")
    if _is_p5(cfg.profile, cfg.tile) and 234 % cfg.tile.w != 0:
        # Measured perf cliff, not a correctness issue: when w does not
        # divide 234 (the stream symbols per wire block), tile rows cross
        # block boundaries and the boustrophedon cannot fold into the
        # single fused interleave dot -- every such tile is capped at
        # ~19-20 fps on-chip vs 30-36 fps for w | 234 tiles (~0.55x;
        # docs/PERF.md round-4 frontier analysis: the ~2.5-3 ms/frame
        # class-dot floor x >= 2 dots x 2 sides is architectural on this
        # backend).  Burst-spreading quality depends on tile AREA and
        # aspect, not on w | 234 (a wire-format accident), so an
        # equal-area divisor tile serves wherever the requested one would.
        divs = (2, 3, 6, 9, 13, 18, 26)      # divisors of 234 that are <= 26
        near = sorted(divs, key=lambda d: abs(d - cfg.tile.w))[:2]
        alts = ", ".join(f"{d}x{cfg.tile.h}" for d in sorted(near))
        warnings.warn(
            f"P5 tile {cfg.tile.w}x{cfg.tile.h}: width does not divide 234, "
            f"so the fused interleave path does not apply -- measured "
            f"~0.55x throughput (~19-20 fps vs 30-36 on-chip, docs/PERF.md). "
            f"For >= 30 fps pick a w|234 tile of similar area/aspect, "
            f"e.g. {alts}.",
            PerformanceWarning, stacklevel=2)
    if any(bp % 4 == 3 for bp in cfg.uep.band_profile):
        # The header stores one trit per band (band_profile % 3,
        # old/.../v6_min.hpp:219-228), so per-band P4 (index 3) cannot be
        # transported: the reference silently turns it into P1 on decode.
        # Reject instead of corrupting (docs/DIVERGENCES.md).
        raise ValueError(
            "UEP band profile 3 (P4) is not transportable in the superframe "
            "header (1 trit/band); use P1..P3 per band")
    n_sy = -(-26 * n_raw_words // 3)
    lens = _band_lens(n_sy)
    H = _min_height(lens, cfg.uep, cfg.beacon)
    bsym = encode_beacon_symbol(BeaconPayload(
        cfg.profile, cfg.superframe_words % 5, 0))
    geom = _grid_geom(cfg.uep, cfg.beacon, H, bsym)

    return EncodeLayout(
        cfg=cfg, n_raw_words=n_raw_words, n_sy=n_sy, geom=geom,
        header_words=_encode_header_words(cfg, frame_seq),
        total_words=HEADER_WORDS + H)


def _beacon_payload_rows(usable: int, period: int):
    """Device index vector: j-th non-beacon row is r = j + j//(p-1) + 1
    (rows with r % p == 0 carry the beacon)."""
    j = jnp.arange(usable, dtype=jnp.int32)
    return j + j // (period - 1) + 1


def _grouped_rs(items, op, axis: int = 0):
    """Run rs.encode/rs.decode once per distinct k over concatenated blocks.

    items: list of (tag, blocks_array, k) with the block axis at `axis`
    (0 for the coeff-minor layout, -1/1 for plane-major).  Returns dict
    tag -> op result slice, preserving per-item block order.  Tuple results
    are sliced per element; a 1D element (the ok flags) is sliced on its
    only axis regardless of `axis`.
    """
    by_k = {}
    for tag, arr, k in items:
        by_k.setdefault(k, []).append((tag, arr))
    out = {}

    def slc(r, start, n):
        ax = 0 if r.ndim == 1 else axis
        idx = [slice(None)] * r.ndim
        idx[ax] = slice(start, start + n)
        return r[tuple(idx)]

    for k, group in by_k.items():
        cat = jnp.concatenate([a for _, a in group], axis=axis)
        res = op(cat, k)
        is_tuple = isinstance(res, tuple)
        start = 0
        for tag, a in group:
            n = a.shape[axis]
            if is_tuple:
                out[tag] = tuple(slc(r, start, n) for r in res)
            else:
                out[tag] = slc(res, start, n)
            start += n
    return out


@functools.cache
def _pack702():
    """Encode-direction 702-period permutation: one block = 27 RAW words
    (27 word-local trits each, spare trit 26 dropped) -> 26 grid columns x
    27 rows.  P[r*26 + i, 27*w + t] = 1 iff 26*w + t == 27*i + r (t < 26).

    Lets the whole 26-trits/word -> (27, m) grid relayout
    (old/include/ternary_image_codec_v6_min.hpp:1051-1082) run as ONE MXU
    contraction instead of an XLA reshape/transpose chain."""
    P = np.zeros((702, 729), dtype=np.int8)
    for i in range(26):
        for r in range(27):
            w, t = divmod(27 * i + r, 26)
            P[r * 26 + i, 27 * w + t] = 1
    return P


@functools.cache
def _pack702_dm():
    """_pack702 for D-MAJOR digit planes: one block = 27 RAW words as a
    (27, 27) tile [row 9d+b = digit d of symbol b, col = word in block] ->
    26 grid columns x 27 rows.  P[r*26+i, 9*(t%3) + t//3, w] = 1 iff
    26*w + t == 27*i + r (t < 26) -- same output row ordering as
    _pack702, so the downstream grid relayout / RS stages are unchanged.

    Exists so the encoder can extract digits as three (9, sf) planes
    CONCATENATED along the leading axis instead of a (sf, 9, 3)-minor
    stack: that stack's 128-lane tile padding measured ~29 ms of the
    57 ms round-1 encode (prefix probe E0, docs/PERF.md)."""
    P = np.zeros((702, 27, 27), dtype=np.int8)
    for i in range(26):
        for r in range(27):
            w, t = divmod(27 * i + r, 26)
            P[r * 26 + i, 9 * (t % 3) + t // 3, w] = 1
    return P


@functools.cache
def _unpack702_bw():
    """_unpack702 with the word axis reordered to (band, word): last axis
    index b*27 + w instead of w*9 + b, so the decode assembly dot can emit
    wire-planes (9, MB*27) with only a minor-dims transpose."""
    C = _unpack702()
    idx = np.arange(27 * NUM_BANDS)
    return C[:, :, (idx % 27) * NUM_BANDS + idx // 27]


@functools.cache
def _stream702():
    """Stream-plane -> wire-words contraction for the P5 decode assembly:
    one block = 234 stream symbols (702 trits) -> 27 words x 9 symbols,
    from the (3, L) stream-plane layout (digit d of stream symbol i).
    K[d, i, b*27 + w] = 3^dd where stream trit 3i + d is trit 3b + dd of
    word w in the block."""
    K = np.zeros((3, 234, 243), dtype=np.int8)
    for i in range(234):
        for d in range(3):
            T = 3 * i + d
            w, t = divmod(T, 26)
            b, dd = divmod(t, 3)
            K[d, i, b * 27 + w] = 3 ** dd
    return K


@functools.cache
def _unpack702():
    """Inverse direction fused with the trit->symbol pack: one grid-column
    block (27 rows x 26 cols) -> 27 words x 9 symbols.  C[r, i, w*9 + b] =
    3^d where the grid trit (r, i) is trit 3b+d of word w in the block."""
    C = np.zeros((27, 26, 243), dtype=np.int8)
    for r in range(27):
        for i in range(26):
            tau = 27 * i + r
            w, t = divmod(tau, 26)
            b, d = divmod(t, 3)
            C[r, i, w * 9 + b] = 3 ** d
    return C


def _pm_offsets(H: int, seed, sign: float):
    """Scrambler offsets for the (27, H) plane-major body grid.

    Cell (h, band b) is the (h*9+b)-th scrambled cell; the offset sequence
    has period 6 (ops/scramble.py), and (9h+b) mod 6 = (3*(h&1) + b) mod 6,
    so the whole (27, H) offset field is a parity select between two static
    per-row constants -- no big iota arithmetic."""
    pat = scramble.offsets(6, seed.a, seed.b, seed.s0, dtype=jnp.float32)
    b_of_row = np.arange(27) // 3
    even_idx = np.asarray(b_of_row % 6)
    odd_idx = np.asarray((3 + b_of_row) % 6)
    A = pat[even_idx] * sign                      # (27,)
    Bv = pat[odd_idx] * sign
    h_even = (jnp.arange(H, dtype=jnp.int32) & 1) == 0
    return jnp.where(h_even[None, :], A[:, None], Bv[:, None])  # (27, H)


def _is_p5(profile, tile) -> bool:
    return profile == ProfileID.P5_RS26_22_2D and bool(tile.w and tile.h)


def _residue_groups(by_k, blocks):
    """[(k, v_lo, v_hi)] when the k-groups partition the 9 bands into
    contiguous residue classes mod 3 (uep_luma_priority: {0,3,6} + rest;
    uniform UEP: one group) with equal block counts.

    Band 3u + v lives at row (u, v, d) of the (3, 3, 3, ...) band split,
    so a residue-class group tensor is a reshape+SLICE (v_lo:v_hi) -- no
    device row gather -- and group pieces concatenated along the v axis
    come back in true band order with no permutation.  Returns None when
    the pattern doesn't hold (callers fall back to the per-band path)."""
    if sorted(b for bands in by_k.values() for b in bands) != list(range(9)):
        return None
    if len({blocks[b] for b in range(9)}) != 1:
        return None
    out = []
    for k, bands in by_k.items():
        vs = sorted({b % 3 for b in bands})
        if vs != list(range(vs[0], vs[-1] + 1)):
            return None
        if sorted(bands) != sorted(3 * u + v for u in range(3) for v in vs):
            return None
        out.append((k, vs[0], vs[-1] + 1))
    out.sort(key=lambda t: t[1])
    if [v for _k, lo, hi in out for v in range(lo, hi)] != [0, 1, 2]:
        return None
    return out


@functools.cache
def _encode_parts(layout: EncodeLayout, raw_wire: str = "words"):
    """Encode split into (to_cols, rs_stage, build_words) for stage-level
    profiling (tools/profile_stages.py --encode-stages); _encode_fn composes
    them into the one fused jit the pipeline ships.

    Dispatches to the plane-major implementation (digit axis leading, word
    axis minor -- measured ~16x cheaper HBM tiling, tools/hbm_probe.py).
    The P5 2D-interleave profile shares it (the symbol permutation runs on
    the stream-plane (3, L) layout inside to_cols).

    raw_wire="planes": to_cols takes (9, n) RAW planes instead of (n, 9)
    words -- a word-major int8 input pads its 9-lane minor 14x on every
    read; streaming callers that can produce planes skip that entirely.

    Returns (to_cols, rs_stage, build_words, fmt): fmt "pm" build_words
    emits wire-planes (9, total_words); fmt "cm" emits (total_words, 9)."""
    return _encode_parts_pm(layout, raw_wire) + ("pm",)


@functools.cache
def _encode_parts_cm(layout: EncodeLayout, raw_wire: str = "words"):
    """Round-1 coeff-minor encode, kept as the independent TEST ORACLE for
    the stream spec (tests/test_pipeline.py A/Bs it against the production
    plane-major path) -- not dispatched in production."""
    cfg, geom = layout.cfg, layout.geom
    n_sy = layout.n_sy
    beacon = cfg.beacon

    # stream length the decoder will reconstruct (see build_decode_layout);
    # the stream is padded to this length BEFORE the P5 interleave so both
    # sides permute at the same length (the reference never got this
    # symmetric -- its P5 path was untestable, docs/DIVERGENCES.md).
    dlens = [geom.blocks[b] * geom.ks[b] for b in range(NUM_BANDS)]
    L_out = int(min(9 * dlens[b] + b for b in range(NUM_BANDS)))
    assert L_out >= n_sy
    needs = [geom.blocks[b] * geom.ks[b] for b in range(NUM_BANDS)]
    max_need = max(needs) if needs else 0

    bsym_dig = np.asarray([geom.beacon_sym % 3, (geom.beacon_sym // 3) % 3,
                           (geom.beacon_sym // 9) % 3], dtype=np.int8)

    def to_cols(raw_words):
        # Digit-native flow: the 26 useful trits of each word ARE the digit
        # planes of the GF27 symbol stream -- symbols are never packed until
        # the final wire words.  (Every pack/unpack was a full HBM pass.)
        if raw_wire == "planes":
            raw_words = raw_words.T
        # 1) words -> trits -> (n_sy, 3) symbol digits (pad tail with 0)
        t = subword.words_to_trits(raw_words)[..., :26].reshape(-1)
        pad = 3 * n_sy - t.shape[0]
        if pad:
            t = jnp.pad(t, (0, pad))
        dig = t.reshape(n_sy, 3)
        # 2) optional 2D interleave (P5) -- permutes symbol positions
        if cfg.profile == ProfileID.P5_RS26_22_2D and cfg.tile.w and cfg.tile.h:
            dig = jnp.pad(dig, ((0, L_out - n_sy), (0, 0)))
            dig = interleave.interleave(dig.T, cfg.tile.w, cfg.tile.h).T
            dig = jnp.pad(dig, ((0, NUM_BANDS * max_need - L_out), (0, 0)))
        else:
            dig = jnp.pad(dig, ((0, NUM_BANDS * max_need - n_sy), (0, 0)))
        # 3) round-robin band split = one reshape: cols[:, b] = dig[b::9]
        return dig.reshape(max_need, NUM_BANDS, 3)

    def rs_stage(cols):
        # per-band RS encode (digit-native), one matmul per distinct k
        enc = _grouped_rs(
            [(b, cols[:needs[b], b].reshape(geom.blocks[b], geom.ks[b], 3),
              geom.ks[b]) for b in range(NUM_BANDS) if geom.blocks[b]],
            rs.encode_dig)
        return tuple(enc[b] for b in range(NUM_BANDS) if geom.blocks[b])

    def build_words(enc_tuple):
        enc, i = {}, 0
        for b in range(NUM_BANDS):
            if geom.blocks[b]:
                enc[b] = enc_tuple[i]
                i += 1
        # 4) build the body grid column by column (beacon via closed form)
        out_cols = []
        for b in range(NUM_BANDS):
            stream = (enc[b].reshape(-1, 3) if geom.blocks[b]
                      else jnp.zeros((0, 3), dtype=jnp.int8))
            stream = jnp.pad(
                stream, ((0, geom.usable[b] - stream.shape[0]), (0, 0)))
            if beacon.enabled and b == beacon.band_slot:
                if beacon.words_period == 1:
                    col = jnp.broadcast_to(jnp.asarray(bsym_dig),
                                           (geom.H, 3))
                else:
                    r = jnp.arange(geom.H, dtype=jnp.int32)
                    is_b = r % beacon.words_period == 0
                    payload_idx = jnp.clip(
                        r - r // beacon.words_period - 1, 0,
                        max(geom.usable[b] - 1, 0))
                    col = jnp.where(is_b[:, None], jnp.asarray(bsym_dig),
                                    stream[payload_idx])
            else:
                col = stream  # usable == H
            out_cols.append(col)
        grid = jnp.stack(out_cols, axis=1)          # (H, 9, 3)
        # 5) scramble payload cells (digit add); state advances every cell.
        flat = grid.reshape(-1, 3)
        keep = None
        if beacon.enabled:
            r = jnp.arange(geom.H, dtype=jnp.int32)
            keep_rows = ~(r % max(beacon.words_period, 1) == 0)
            col_hot = jnp.arange(NUM_BANDS) == beacon.band_slot
            keep = (~((~keep_rows)[:, None] & col_hot[None, :])).reshape(-1)
        flat = scramble.scramble_dig(flat, cfg.seed.a, cfg.seed.b,
                                     cfg.seed.s0, 1.0, keep)
        # 6) pack to wire symbols ONCE
        f = flat.astype(jnp.int8)
        body = (f[:, 0] + 3 * f[:, 1] + 9 * f[:, 2]).reshape(geom.H,
                                                             NUM_BANDS)
        return jnp.concatenate(
            [jnp.asarray(layout.header_words, dtype=jnp.int8), body], axis=0)

    return to_cols, rs_stage, build_words


@functools.cache
def _encode_parts_pm(layout: EncodeLayout, raw_wire: str = "words"):
    """Plane-major encode: grids are (27, H) [row = 3*band + digit], RS
    blocks are (3, nblk, 26) -- every materialized tensor keeps a large
    axis in the TPU lane dimension (see rs.py "plane-major" notes)."""
    from .gf27 import fmod3
    cfg, geom = layout.cfg, layout.geom
    n_sy = layout.n_sy
    beacon = cfg.beacon
    needs = [geom.blocks[b] * geom.ks[b] for b in range(NUM_BANDS)]
    max_need = max(needs) if needs else 0
    active = [b for b in range(NUM_BANDS) if geom.blocks[b]]

    bsym_dig = np.asarray([geom.beacon_sym % 3, (geom.beacon_sym // 3) % 3,
                           (geom.beacon_sym // 9) % 3], dtype=np.int8)

    p5 = _is_p5(cfg.profile, cfg.tile)
    if p5:
        # decoder-visible stream length; both sides permute at this length
        # (see _encode_parts_cm for the derivation)
        dlens5 = [geom.blocks[b] * geom.ks[b] for b in range(NUM_BANDS)]
        L_out5 = int(min(NUM_BANDS * dlens5[b] + b for b in range(NUM_BANDS)))
        assert L_out5 >= n_sy

    def _digits27(raw_words):
        # words (sf, 9) -> word-major trit planes (sf, 27): trit 3b + d of
        # word w is digit d of symbol b (exact f32 divmod, docs/PERF.md)
        if raw_wire == "planes":
            raw_words = raw_words.T
        s = raw_words.astype(jnp.float32)
        q1 = jnp.floor(s * (1.0 / 3.0))
        q2 = jnp.floor(s * (1.0 / 9.0))
        return jnp.stack([s - 3.0 * q1, q1 - 3.0 * q2,
                          q2 - 3.0 * jnp.floor(q2 * (1.0 / 3.0))],
                         axis=-1).astype(jnp.int8).reshape(-1, 27)

    def to_cols(raw_words):
        # words -> (27, max_need) grid: trit 27j + 3b + d of the useful-trit
        # stream is digit d of stream symbol 9j + b, so the grid is the
        # 26-trits/word stream re-strided to 27 rows -- the whole 26<->27
        # re-stride is ONE 702-period permutation contraction on the MXU
        # (blocks of 27 words -> 26 grid columns, mirror of the
        # decode-side _unpack702).
        t27 = _digits27(raw_words)                             # (sf, 27)
        if p5:
            # P5: interleave the symbol stream in stream-plane (3, L)
            # layout -- whole tiles are a reshape+row-flip, no gather
            # (ops/interleave.py); then fold to the (27, m) grid.
            flat = t27[:, :26].reshape(-1)
            flat = jnp.pad(flat, (0, 3 * L_out5 - flat.shape[0]))
            st = flat.reshape(L_out5, 3).T                     # (3, L)
            st = interleave.interleave(st, cfg.tile.w, cfg.tile.h)
            st = jnp.pad(st,
                         ((0, 0), (0, NUM_BANDS * max_need - L_out5)))
            return st.reshape(3, max_need, NUM_BANDS) \
                .transpose(2, 0, 1).reshape(27, max_need)
        if max_need == 0:
            flat = t27[:, :26].reshape(-1)
            flat = jnp.pad(flat, (0, 27 * max_need - flat.shape[0]))
            return flat.reshape(max_need, 27).T                # (27, m)
        nblk7 = -(-max_need // 26)
        t27 = jnp.pad(t27, ((0, nblk7 * 27 - t27.shape[0]), (0, 0)))
        X2 = t27.reshape(nblk7, 729)                           # view: 27w+t
        Y = lax.dot_general(jnp.asarray(_pack702()), X2,
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)  # (702, nblk7)
        grid = Y.astype(jnp.int8).reshape(27, 26, nblk7) \
            .swapaxes(1, 2).reshape(27, 26 * nblk7)
        return grid[:, :max_need]

    bc_band = beacon.band_slot if beacon.enabled else -1
    by_k = {}
    for b in active:
        if b != bc_band:
            by_k.setdefault(geom.ks[b], []).append(b)

    def _rs_one(Ug, k, nblk, g):
        """(g, 3, nblk, k) data -> (g, 3, nblk, 26) codewords."""
        from jax import lax as _lax
        from .gf27 import fmod3
        M = rs._matrices_pm(k)
        y = _lax.dot_general(jnp.asarray(M["G2"], dtype=jnp.int8), Ug,
                             (((1, 2), (1, 3)), ((), ())),
                             preferred_element_type=jnp.int32)
        y = fmod3(y.astype(jnp.float32)).astype(jnp.int8)
        return y.reshape(3, rs.N, g, nblk).transpose(2, 0, 3, 1)

    def rs_stage(cols):
        """Group-level RS encode: one dot_general per distinct k over the
        grid's band rows directly (non-beacon bands share the same block
        count) -- no per-band slicing/concat chains."""
        enc = {}
        for k, bands in by_k.items():
            nblk = geom.blocks[bands[0]]
            rows = np.asarray([3 * b + d for b in bands for d in range(3)])
            Ug = cols[rows, :nblk * k].reshape(len(bands), 3, nblk, k)
            cw = _rs_one(Ug, k, nblk, len(bands))  # (g, 3, nblk, 26)
            for gi, b in enumerate(bands):
                enc[b] = cw[gi]
        if bc_band in active:
            b = bc_band
            data = cols[3 * b:3 * b + 3, :needs[b]] \
                .reshape(3, geom.blocks[b], geom.ks[b])
            enc[b] = rs.encode_pm_blocks(data, geom.ks[b])
        return tuple(enc[b] for b in active)      # (3, nblk, 26) per band

    def _beacon_col(stream, r):
        """(3, usable) payload stream -> the beacon band's (3, H) column."""
        b = bc_band
        stream = jnp.pad(
            stream, ((0, 0), (0, geom.usable[b] - stream.shape[1])))
        if beacon.words_period == 1:
            return jnp.broadcast_to(jnp.asarray(bsym_dig)[:, None],
                                    (3, geom.H))
        is_b = r % beacon.words_period == 0
        payload_idx = jnp.clip(
            r - r // beacon.words_period - 1, 0,
            max(geom.usable[b] - 1, 0))
        return jnp.where(is_b[None, :], jnp.asarray(bsym_dig)[:, None],
                         stream[:, payload_idx])

    def _finish(grid, r):
        """Scramble + pack a (27, H) grid (rows 3b + d); emits wire-planes
        (9, total) in band order."""
        off = _pm_offsets(geom.H, cfg.seed, 1.0)
        scr = fmod3(grid.astype(jnp.float32) + off + 3.0).astype(jnp.int8)
        if beacon.enabled:
            row_hot = np.arange(27) // 3 == beacon.band_slot
            is_b = r % max(beacon.words_period, 1) == 0
            scr = jnp.where(jnp.asarray(row_hot)[:, None] & is_b[None, :],
                            grid, scr)
        # wire-planes layout (9, total): the word axis stays minor -- a
        # (total, 9) write pads 9 -> 128 lanes (14x HBM bytes)
        body_T = scr[0::3] + 3 * scr[1::3] + 9 * scr[2::3]  # (9, H)
        return jnp.concatenate(
            [jnp.asarray(layout.header_words.T, dtype=jnp.int8), body_T],
            axis=1)                                           # (9, total)

    def build_words(enc_tuple):
        r = jnp.arange(geom.H, dtype=jnp.int32)
        enc = dict(zip(active, enc_tuple))
        out_cols = []
        for b in range(NUM_BANDS):
            stream = (enc[b].reshape(3, -1) if geom.blocks[b]
                      else jnp.zeros((3, 0), dtype=jnp.int8))
            if beacon.enabled and b == beacon.band_slot:
                col = _beacon_col(stream, r)
            else:
                col = jnp.pad(
                    stream,
                    ((0, 0), (0, geom.usable[b] - stream.shape[1])))
            out_cols.append(col)
        grid = jnp.concatenate(out_cols, axis=0)          # (27, H)
        return _finish(grid, r)

    return to_cols, rs_stage, build_words


@functools.cache
def _encode_fn(layout: EncodeLayout, wire: str = "words",
               raw_wire: str = "words"):
    """Jitted single-superframe encode.  wire="words": (n, 9) -> (total, 9)
    (the public contract); wire="planes": -> (9, total) with no final
    transpose (the streaming hot path).  raw_wire="planes": input is
    (9, n) RAW planes (see _encode_parts).

    Eligible configs (no beacon, not P5, residue-class k-groups) take the
    blocked-grid v3 path (ops/pipeline_v3.py) -- bit-exact, structurally
    free of the v2 chain's relayout copies; T3_PIPE_V3=0 forces v2."""
    if os.environ.get("T3_PIPE_V3", "1") == "1":
        from . import pipeline_v3
        if pipeline_v3.encode_supported(layout):
            fn3 = pipeline_v3.encode_fn_v3(layout, raw_wire)

            def fnv(raw_words):
                out = fn3(raw_words)
                return out if wire == "planes" else out.T

            return jax.jit(fnv)
    to_cols, rs_stage, build_words, fmt = _encode_parts(layout, raw_wire)

    def fn(raw_words):
        out = build_words(rs_stage(to_cols(raw_words)))
        if (fmt == "pm") != (wire == "planes"):
            out = out.T
        return out

    return jax.jit(fn)


def encode_profile_from_raw(raw_words, cfg: EncoderConfig, frame_seq: int = 0):
    """RAW words (n, 9) int8 -> profile words (6 + H, 9) int8.

    RAW_MODE passes words through unchanged (old/.../v6_min.hpp:1045-1049).
    """
    raw_words = jnp.asarray(raw_words)
    if cfg.profile == ProfileID.RAW_MODE:
        return raw_words
    layout = build_encode_layout(cfg, int(raw_words.shape[0]), frame_seq)
    return _encode_fn(layout)(raw_words)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True, eq=False)
class DecodeLayout:
    hdr: SuperframeHeader
    H: int
    geom: _GridGeom
    L_out: int
    n_out_words: int


@functools.cache
def build_decode_layout(hdr: SuperframeHeader, H: int) -> DecodeLayout:
    bsym = 0  # decoder never reads beacon cell contents
    geom = _grid_geom(hdr.uep, hdr.beacon, H, bsym)
    # decoded data stream lengths per band
    dlens = [geom.blocks[b] * geom.ks[b] for b in range(NUM_BANDS)]
    # re-round-robin: out[i] = band_data[i % 9][i // 9]; band b can supply
    # indices i % 9 == b only while i // 9 < dlens[b], so
    L_out = int(min(9 * dlens[b] + b for b in range(NUM_BANDS)))
    n_out_words = (L_out * 3) // 26
    return DecodeLayout(hdr=hdr, H=H, geom=geom, L_out=L_out,
                        n_out_words=n_out_words)


def decode_header_from_words(words) -> Tuple[Optional[SuperframeHeader], bool]:
    """First 6 words -> decoded header, or (None, False).

    old/include/ternary_image_codec_v6_min.hpp:918-937 (6 words -> 54 syms,
    2x RS(26,18) decode, CRC-12 check, unpack).
    """
    w = np.asarray(words)
    if w.shape[0] < HEADER_WORDS:
        return None, False
    sy = w[:HEADER_WORDS].reshape(-1)
    blocks = jnp.asarray(np.stack([sy[:26], sy[26:52]]))
    data, ok = rs.decode_jit(blocks, 18)
    if not bool(np.all(np.asarray(ok))):
        return None, False
    data = np.asarray(data)
    syms = np.concatenate([data[0][:18], data[1][:9]])
    if not header_mod.check(syms):
        return None, False
    return header_mod.unpack(syms), True


@functools.cache
def _decode_parts(layout: DecodeLayout):
    """Split body decode into (pre, post, meta, fmt):

      pre(body_words (H, 9))  -> tuple of per-band RS block arrays, one per
                                 *active* band -- (3, 26, nblk_b) in the
                                 plane-major format ("pm", the default) or
                                 (nblk_b, 26, 3) in the coeff-minor fallback
                                 ("cm", used by the P5 2D profile);
      meta                     = tuple of (band, nblk, k) aligned with pre's
                                 outputs (static per layout);
      post(decoded)            -> out words (n_out_words, 9), where decoded
                                 is the same-format tuple of data digits.

    Both pre and post are vmap-safe; the RS decode between them is NOT part
    of either, so callers choose the chain strategy (paged / full).
    """
    if (layout.hdr.profile == ProfileID.P5_RS26_22_2D
            and layout.hdr.tile.w and layout.hdr.tile.h):
        return _decode_parts_cm(layout)
    return _decode_parts_pm(layout)


@functools.cache
def _decode_parts_pm(layout: DecodeLayout):
    """Plane-major decode pre/post (see _encode_parts_pm for the layout)."""
    from .gf27 import fmod3
    hdr, geom = layout.hdr, layout.geom
    beacon = hdr.beacon
    dlens = [geom.blocks[b] * geom.ks[b] for b in range(NUM_BANDS)]
    max_d = max(dlens) if dlens else 0
    meta = tuple((b, geom.blocks[b], geom.ks[b])
                 for b in range(NUM_BANDS) if geom.blocks[b])

    def pre(body_T):
        # wire-planes input (9, H): no transpose, no padded-lane read.
        # Descramble happens per digit plane BEFORE the stack, so every
        # materialized tensor is int8 (an f32 (27, H) intermediate across
        # the stack/reshape boundary was 4x the HBM bytes).
        wT = body_T.astype(jnp.float32)                  # (9, H)
        q1 = jnp.floor(wT * (1.0 / 3.0))
        q2 = jnp.floor(wT * (1.0 / 9.0))
        planes = (wT - 3.0 * q1, q1 - 3.0 * q2,
                  q2 - 3.0 * jnp.floor(q2 * (1.0 / 3.0)))
        off = _pm_offsets(geom.H, hdr.seed, -1.0)        # (27, H) rows 3b+d
        dig = jnp.stack(
            [fmod3(p + off[d::3] + 3.0).astype(jnp.int8)
             for d, p in enumerate(planes)], axis=1
        ).reshape(27, geom.H)                            # rows 3b + d
        outs = []
        for b, nblk, _k in meta:
            band = dig[3 * b:3 * b + 3]                  # (3, H)
            if beacon.enabled and b == beacon.band_slot:
                rows = _beacon_payload_rows(geom.usable[b],
                                            beacon.words_period)
                band = band[:, rows]
            # block-minor layout: NO transpose (the rs *_pm_bk entry
            # points contract (digit, coeff) in place via dot_general)
            outs.append(band[:, :nblk * rs.N].reshape(3, nblk, rs.N))
        return tuple(outs)                               # (3, nblk, 26)

    def post(decoded):
        streams, i = [], 0
        for b in range(NUM_BANDS):
            if geom.blocks[b] == 0:
                streams.append(jnp.zeros((3, max_d), dtype=jnp.int8))
                continue
            d = decoded[i]                               # (3, nblk, k)
            i += 1
            s = d.reshape(3, -1)                         # (3, dlens[b])
            streams.append(jnp.pad(s, ((0, 0), (0, max_d - dlens[b]))))
        M27 = jnp.concatenate(streams, axis=0)           # (27, max_d)
        # trit 27j + 3b + d is digit d of out-stream symbol 9j + b: the
        # round-robin merge is ONE transpose + flat regroup to 26/word
        flat = M27.T.reshape(-1)
        t = flat[:layout.n_out_words * 26].reshape(layout.n_out_words, 26)
        # words in wire-planes (9, n_out): one MXU contraction with the
        # static trit->symbol matrix (P26[j, b] = 3^(j%3) iff j//3 == b;
        # word symbol 8 gets only trits 24,25 -- the 27th trit is 0)
        P26 = np.zeros((26, NUM_BANDS), dtype=np.int8)
        for j in range(26):
            P26[j, j // 3] = 3 ** (j % 3)
        wT = lax.dot_general(jnp.asarray(P26), t.astype(jnp.int8),
                             (((0,), (1,)), ((), ())),
                             preferred_element_type=jnp.int32)
        return wT.astype(jnp.int8)                       # (9, n_out)

    return pre, post, meta, "pm"


@functools.cache
def _decode_parts_cm(layout: DecodeLayout):
    hdr, geom = layout.hdr, layout.geom
    beacon = hdr.beacon
    dlens = [geom.blocks[b] * geom.ks[b] for b in range(NUM_BANDS)]
    max_d = max(dlens) if dlens else 0
    meta = tuple((b, geom.blocks[b], geom.ks[b])
                 for b in range(NUM_BANDS) if geom.blocks[b])

    def pre(body_words):
        # unpack wire symbols to digit planes ONCE; everything below is
        # digit-native (no further pack/unpack passes)
        s = body_words.reshape(-1).astype(jnp.float32)
        q1 = jnp.floor(s * (1.0 / 3.0))
        q2 = jnp.floor(s * (1.0 / 9.0))
        dig = jnp.stack([s - 3.0 * q1, q1 - 3.0 * q2, q2], axis=-1)
        dig = scramble.scramble_dig(dig, hdr.seed.a, hdr.seed.b,
                                    hdr.seed.s0, -1.0)
        grid = dig.reshape(geom.H, NUM_BANDS, 3)
        # per-band payload columns; beacon rows skipped via closed form
        outs = []
        for b, nblk, _k in meta:
            col = grid[:, b]
            if beacon.enabled and b == beacon.band_slot:
                rows = _beacon_payload_rows(geom.usable[b],
                                            beacon.words_period)
                col = col[rows]
            outs.append(col[:nblk * rs.N].reshape(nblk, rs.N, 3))
        return tuple(outs)

    def post(decoded):
        datas, i = [], 0
        for b in range(NUM_BANDS):
            if geom.blocks[b] == 0:
                datas.append(jnp.zeros((max_d, 3), dtype=jnp.int8))
                continue
            d = decoded[i]
            i += 1
            datas.append(jnp.pad(d.reshape(-1, 3),
                                 ((0, max_d - dlens[b]), (0, 0))))
        # re-round-robin merge = transpose: out[i] = band_data[i % 9][i // 9]
        dsy = jnp.stack(datas, axis=1).reshape(-1, 3)[:layout.L_out]
        if hdr.profile == ProfileID.P5_RS26_22_2D and hdr.tile.w and hdr.tile.h:
            dsy = interleave.deinterleave(dsy.T, hdr.tile.w, hdr.tile.h).T
        # symbol digits ARE the trit stream: regroup 26 trits/word + zero pad
        t = dsy.reshape(-1)[:layout.n_out_words * 26]
        t = t.reshape(layout.n_out_words, 26)
        t = jnp.concatenate(
            [t, jnp.zeros((layout.n_out_words, 1), dtype=t.dtype)], axis=-1)
        return subword.trits_to_words(t)

    return pre, post, meta, "cm"


@functools.cache
def _decode_body_fn(layout: DecodeLayout, rs_mode: str = "paged",
                    wire: str = "words"):
    """Single-superframe body decode (vmap-safe).

    wire="words": body (H, 9) -> out (n_out, 9) (public contract);
    wire="planes": body (9, H) -> out (9, n_out) (streaming hot path --
    no boundary transposes, no 9-lane padded reads/writes).

    rs_mode="paged" (default): the BM/Chien/Forney chain runs only on
    dirty pages of blocks (a few per superframe even under heavy scattered
    corruption; clean superframes skip ~all of it; > capacity dirty pages
    in one band-group flags ok=False, fail-safe).  rs_mode="full": the
    unconditional chain on every block, for adversarially dense corruption.
    rs_mode="check": integrity verification only -- syndromes set the ok
    flags but nothing is corrected (cheap scrubbing of stored streams).
    rs_mode="none": trust the stream, skip the RS stage entirely (ok=True;
    fastest read path for storage already protected end-to-end).

    P5 shares the plane-major decoder (its deinterleave runs on the
    stream-plane layout in the assembly stage).
    """
    if os.environ.get("T3_PIPE_V3", "1") == "1":
        from . import pipeline_v3
        # paged repair stays on the v2 machinery by default: the v3 paged
        # path is bit-exact (tests/test_pipeline_v3.py) but measured
        # SLOWER on the chip dirty-stream bench (27.0 vs ~28.9 dirty fps,
        # docs/PERF.md); T3_PAGED_V3=1 selects it for A/B.  Full-mode
        # (unconditional chain) rides v3 by default since round 3; the
        # chip A/B measured it NEUTRAL vs v2 (91.2 vs 90.6 ms/frame
        # decode-only, tools/full_mode_bench.py -- the BM/Chien/Forney
        # chain both share dominates).  T3_FULL_V3=0 forces v2 for A/B.
        v3_ok = pipeline_v3.decode_supported(layout, rs_mode) and (
            rs_mode != "paged"
            or os.environ.get("T3_PAGED_V3", "0") == "1") and (
            rs_mode != "full"
            or os.environ.get("T3_FULL_V3", "1") == "1")
        if v3_ok:
            fn3 = pipeline_v3.check_decode_fn_v3(layout, rs_mode)

            def fnv(body):
                if wire == "planes":
                    return fn3(body)
                out_T, ok = fn3(body.T)
                return out_T.T, ok

            return jax.jit(fnv)
    return _decode_body_fn_pm2(layout, rs_mode, wire)


@functools.cache
def _decode_body_fn_cm(layout: DecodeLayout, rs_mode: str, wire: str):
    """Round-1 coeff-minor decode, kept as the independent TEST ORACLE
    for the stream spec (tests/test_pipeline.py) -- not dispatched in
    production."""
    pre, post, meta, _fmt = _decode_parts_cm(layout)
    op = ((lambda c, k: rs.decode_dig_paged(c, k, page=32))
          if rs_mode == "paged" else rs.decode_dig)

    def fn(body):
        if wire == "planes":
            body = body.T
        blocks = pre(body)
        dec = _grouped_rs(
            [(i, blk, meta[i][2]) for i, blk in enumerate(blocks)], op)
        decoded = tuple(dec[i][0] for i in range(len(meta)))
        oks = [dec[i][1] for i in range(len(meta))]
        ok_all = jnp.all(jnp.concatenate(oks)) if oks else jnp.asarray(True)
        out = post(decoded)
        if wire == "planes":
            out = out.T
        return out, ok_all

    return jax.jit(fn)


@functools.cache
def _decode_body_fn_pm2(layout: DecodeLayout, rs_mode: str, wire: str):
    """Plane-major decode, op-count-minimized structure ("v2").

    The per-op cost on this backend is fixed-ish (~40 us/materialized op
    per 128-superframe micro-batch, tools/hbm_probe.py --chain), so the
    structure minimizes distinct materialized ops rather than just bytes:

      * ONE digit grid (27, H) [3 ops];
      * ONE r=8 syndrome contraction for ALL uniform bands at once
        (syndromes are k-independent: S_j = sum c_i alpha^(ji); a band
        with r_b < 8 just reads its first r_b rows);
      * paging + chain + sparse delta at band-GROUP level (only gathered
        dirty pages ever leave the grid);
      * stream assembly reads the grid slices + fused delta adds.

    A beacon band has its own row geometry and takes the per-band gather
    path (configs without a beacon -- the default -- skip it entirely).
    """
    from .gf27 import _m3i, fmod3
    hdr, geom = layout.hdr, layout.geom
    beacon = hdr.beacon
    p5 = _is_p5(hdr.profile, hdr.tile)
    H = geom.H
    dlens = [geom.blocks[b] * geom.ks[b] for b in range(NUM_BANDS)]
    max_d = max(dlens) if dlens else 0
    bc_band = beacon.band_slot if beacon.enabled else -1
    nblk_u = H // rs.N  # uniform (non-beacon) bands: usable == H
    # pad the grid so 16-block pages always tile the block axis (padded
    # cells descramble to zero = valid codewords; offsets masked past H)
    nblk_p = max(-(-nblk_u // 16) * 16, 16)
    H_p = max(H, nblk_p * rs.N)
    # k-groups over uniform bands
    by_k = {}
    for b in range(NUM_BANDS):
        if b != bc_band and geom.blocks[b]:
            by_k.setdefault(geom.ks[b], []).append(b)
    # one r=8 syndrome matrix serves every band (trimming it to the
    # groups' max r measured NEUTRAL on chip -- docs/PERF.md)
    srows = 8
    S8 = np.asarray(rs._matrices_pm(18)["S2"]) \
        .reshape(3, 8, 3, rs.N)[:, :srows] \
        .reshape(3 * srows, 3, rs.N)                     # (3*srows, 3, 26)

    def fn_planes(body_T):                               # (9, H)
        wT = jnp.pad(body_T, ((0, 0), (0, H_p - H))).astype(jnp.float32)
        q1 = jnp.floor(wT * (1.0 / 3.0))
        q2 = jnp.floor(wT * (1.0 / 9.0))
        planes = (wT - 3.0 * q1, q1 - 3.0 * q2,
                  q2 - 3.0 * jnp.floor(q2 * (1.0 / 3.0)))
        off = _pm_offsets(H, hdr.seed, -1.0)
        off = jnp.pad(off, ((0, 0), (0, H_p - H)))  # zero offsets past H
        dig = jnp.stack(
            [fmod3(p + off[d::3] + 3.0).astype(jnp.int8)
             for d, p in enumerate(planes)], axis=1).reshape(27, H_p)
        U = dig.reshape(NUM_BANDS, 3, H_p)[:, :, :nblk_p * rs.N] \
            .reshape(NUM_BANDS, 3, nblk_p, rs.N)
        if rs_mode != "none":
            S_all = lax.dot_general(
                jnp.asarray(S8, dtype=jnp.int8), U,
                (((1, 2), (1, 3)), ((), ())),
                preferred_element_type=jnp.int32)        # (24, 9, nblk)
            S_all = fmod3(S_all.astype(jnp.float32)).astype(jnp.int8) \
                .reshape(3, srows, NUM_BANDS, nblk_p)
        streams = [None] * NUM_BANDS
        oks = []
        # T3_RS_MIXED=1: defer every k-group's compacted pages into ONE
        # mixed-k BM/Chien/Forney instance (rs._correct_pm_mixed) instead
        # of one chain per group -- bit-exact per block, but DISPROVEN on
        # the chip dirty bench (the rmax/kmax padding tax exceeds the
        # per-group dispatch overhead it removes, docs/PERF.md); the knob
        # stays as a lever for workloads with more k-groups.
        mixed_rs = (os.environ.get("T3_RS_MIXED", "0") == "1"
                    and rs_mode == "paged" and len(by_k) > 1)
        mixed_defer = []                 # (r, g_rd, Sv, Cp, finish)

        for k, bands in by_k.items():
            r = 26 - k
            g = len(bands)
            barr = np.asarray(bands)
            if rs_mode == "none":
                for b in bands:
                    streams[b] = U[b][:, :nblk_u, :k].reshape(3, -1)
                continue
            Sg = S_all[:, :r][:, :, barr]            # (3, r, g, nblk)
            if rs_mode == "check":
                dirty = jnp.any(Sg.reshape(3 * r, g, nblk_p) != 0, axis=0)
                oks.append((~dirty).reshape(-1))
                for b in bands:
                    streams[b] = U[b][:, :nblk_u, :k].reshape(3, -1)
                continue
            if rs_mode != "paged":
                # full chain over every block of the group
                g_rd = U[barr].transpose(1, 3, 0, 2) \
                    .reshape(3, rs.N, g * nblk_p)
                d_g, ok_g = rs._correct_pm(
                    g_rd, Sg.reshape(3, r, g * nblk_p), k)
                data = d_g.reshape(3, k, g, nblk_p)
                for gi, b in enumerate(bands):
                    streams[b] = data[:, :, gi, :nblk_u] \
                        .transpose(0, 2, 1).reshape(3, -1)
                oks.append(ok_g)
                continue
            dirty = jnp.any(Sg.reshape(3 * r, g, nblk_p) != 0, axis=0)
            page = 16
            npage = nblk_p // page
            # capacity >= one dirty page per band of the group, so damage
            # touching every band (e.g. a corrupted row) stays correctable
            C = min(g * npage, max(6, g))
            pdirty = jnp.any(dirty.reshape(g, npage, page), axis=2) \
                .reshape(-1)                             # (g*npage,)
            pidx = jnp.sort(jnp.where(pdirty, jnp.arange(g * npage),
                                      g * npage))[:C]
            valid = pidx < g * npage
            psafe = jnp.where(valid, pidx, 0)
            bb = psafe // npage
            pp = psafe - bb * npage
            Ug = U[barr].reshape(g, 3, npage, page, rs.N)
            g_rd = Ug[bb, :, pp]                         # (C, 3, page, 26)
            g_rd = g_rd.transpose(1, 3, 0, 2).reshape(3, rs.N, C * page)
            Sv = Sg.transpose(2, 0, 1, 3) \
                .reshape(g, 3, r, npage, page)[bb, :, :, pp] \
                .transpose(1, 2, 0, 3).reshape(3, r, C * page)
            def _finish(d_g, ok_g, *, k=k, g=g, bands=bands, barr=barr,
                        dirty=dirty, pdirty=pdirty, npage=npage, page=page,
                        C=C, g_rd=g_rd):
                delta_g = _m3i(d_g - g_rd[:, :k])
                # slot-gather the sparse delta back over the group's pages
                rank = jnp.cumsum(pdirty.astype(jnp.int32)) - 1
                slot = jnp.clip(rank, 0, C - 1)
                use_corr = pdirty & (rank < C)
                dpages = delta_g.reshape(3, k, C, page) \
                    .transpose(2, 0, 3, 1).reshape(C, 3, page * k)
                delta = jnp.where(use_corr[:, None, None], dpages[slot],
                                  jnp.int8(0)) \
                    .reshape(g, npage, 3, page * k).transpose(0, 2, 1, 3) \
                    .reshape(g, 3, nblk_p, k)
                ok_pages = ok_g.reshape(C, page)[slot]   # (g*npage, page)
                okb = jnp.where(use_corr[:, None], ok_pages,
                                (~dirty).reshape(g * npage, page))
                oks.append(okb.reshape(-1))
                for gi, b in enumerate(bands):
                    base = U[b][:, :, :k]                # (3, nblk_p, k)
                    streams[b] = _m3i(base + delta[gi])[:, :nblk_u] \
                        .reshape(3, -1)

            if mixed_rs:
                mixed_defer.append((r, g_rd, Sv, C * page, _finish))
                continue
            d_g, ok_g = rs._correct_pm(g_rd, Sv, k)      # (3, k, Cp)
            _finish(d_g, ok_g)
        if mixed_defer:
            rmax = max(rec[0] for rec in mixed_defer)
            cat_rd = jnp.concatenate([rec[1] for rec in mixed_defer],
                                     axis=2)
            cat_S = jnp.concatenate(
                [jnp.pad(rec[2], ((0, 0), (0, rmax - rec[0]), (0, 0)))
                 for rec in mixed_defer], axis=2)
            r_cat = np.concatenate(
                [np.full(rec[3], rec[0], dtype=np.int32)
                 for rec in mixed_defer])
            fixed_cat, ok_cat = rs._correct_pm_mixed(
                cat_rd, cat_S, jnp.asarray(r_cat), rmax)
            off = 0
            for r_g, g_rd_g, _Sv, Cp, finish in mixed_defer:
                finish(fixed_cat[:, :26 - r_g, off:off + Cp],
                       ok_cat[off:off + Cp])
                off += Cp
        # beacon band: its rows skip the beacon cells -> per-band gather
        if bc_band >= 0 and geom.blocks[bc_band]:
            nblk, k = geom.blocks[bc_band], geom.ks[bc_band]
            band = dig[3 * bc_band:3 * bc_band + 3]
            rows = _beacon_payload_rows(geom.usable[bc_band],
                                        beacon.words_period)
            band = band[:, rows][:, :nblk * rs.N].reshape(3, nblk, rs.N)
            if rs_mode == "none":
                bc_stream = band[:, :, :k].reshape(3, -1)
            elif rs_mode == "check":
                Sb = rs.syndromes_pm_bk(band, k)
                oks.append(~jnp.any(
                    Sb.reshape(-1, nblk) != 0, axis=0))
                bc_stream = band[:, :, :k].reshape(3, -1)
            else:
                d_b, ok_b = rs.decode_paged_pm_bk(band, k, page=16,
                                                  max_dirty_pages=4) \
                    if rs_mode == "paged" else rs.decode_pm_bk(band, k)
                bc_stream = d_b.reshape(3, -1)
                oks.append(ok_b)
            streams[bc_band] = bc_stream
        # assemble (27, max_d) and regroup to words: the lane-crossing
        # 27-grid-trits -> 26-trit-words regroup FUSED with the trit->
        # symbol pack is one MXU contraction per 702-trit period
        # (_unpack702) -- no flat/reshape relayout chain
        max_dp = -(-max(max_d, 1) // 26) * 26
        MB = max_dp // 26
        parts = []
        for b in range(NUM_BANDS):
            s = (streams[b] if streams[b] is not None
                 else jnp.zeros((3, 0), dtype=jnp.int8))
            parts.append(jnp.pad(s,
                                 ((0, 0), (0, max_dp - s.shape[1]))))
        M27 = jnp.concatenate(parts, axis=0)             # (27, max_dp)
        if p5:
            # P5: fold the grid to stream-planes (3, L), deinterleave
            # (reshape+row-flip for whole tiles), then ONE contraction
            # regroups 234 stream symbols -> 27 words (_stream702)
            st = M27.reshape(NUM_BANDS, 3, max_dp).transpose(1, 2, 0) \
                .reshape(3, NUM_BANDS * max_dp)[:, :layout.L_out]
            st = interleave.deinterleave(st, hdr.tile.w, hdr.tile.h)
            nb27 = -(-layout.L_out // 234)
            st = jnp.pad(st, ((0, 0), (0, nb27 * 234 - layout.L_out)))
            wT = lax.dot_general(jnp.asarray(_stream702()),
                                 st.reshape(3, nb27, 234),
                                 (((0, 1), (0, 2)), ((), ())),
                                 preferred_element_type=jnp.int32) \
                .astype(jnp.int8)                        # (243, nb27)
            out_T = wT.reshape(NUM_BANDS, 27, nb27).transpose(0, 2, 1) \
                .reshape(NUM_BANDS, nb27 * 27)[:, :layout.n_out_words]
        else:
            # contract (row, in-block col) in place -- the operand
            # transpose rides the dot_general dimension numbers instead
            # of a materialized relayout; the (band, word) output
            # ordering leaves only a minor-dims transpose to wire-planes
            wT = lax.dot_general(jnp.asarray(_unpack702_bw()),
                                 M27.reshape(27, MB, 26),
                                 (((0, 1), (0, 2)), ((), ())),
                                 preferred_element_type=jnp.int32) \
                .astype(jnp.int8)                        # (243, MB)
            out_T = wT.reshape(NUM_BANDS, 27, MB).transpose(0, 2, 1) \
                .reshape(NUM_BANDS, MB * 27)[:, :layout.n_out_words]
        ok_all = (jnp.all(jnp.concatenate(oks)) if oks
                  else jnp.asarray(True))
        return out_T, ok_all

    def fn(body):
        if wire == "planes":
            return fn_planes(body)
        out_T, ok = fn_planes(body.T)
        return out_T.T, ok

    return jax.jit(fn)


# ---------------------------------------------------------------------------
# superframe streaming (bounded-size superframes, reference default 8192
# words -- EncoderConfig.superframe_words, old/.../v6_min.hpp:869)
# ---------------------------------------------------------------------------


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def _header_validator(layout, sf_hdr, rs_mode: str,
                      hdr_all_pages: bool = False):
    """Shared superframe-header validation for the stream decoders.

    Returns validate(hdrs (n, 9, 6) wire slabs) -> (n,) bool.  check mode:
    scrub semantics -- an intact header is a compile-time constant for the
    config, so equality against the 6 expected wire words suffices (any
    damage flags the superframe; the auto strategy's paged repair then
    RS-decodes it).  Other modes: on-device RS(26,18) decode of both
    header blocks + corrected-payload match (the reference decodes every
    superframe header, old/.../v6_min.hpp:918-937).

    hdr_all_pages=True sizes the paged header chain to cover EVERY header
    page: required for the two-phase phase-2 repair dispatch (batch = 100%
    flagged superframes; >8 dirty pages per dispatch is the NORM under a
    header-damage channel -- round-4 bug c6d00bc) and for the public
    non-check decode strategies, whose contract is reference parity (every
    superframe header decodes unconditionally, old/.../v6_min.hpp:918-937;
    pinned by test_stream_mass_header_corruption).  False keeps
    decode_paged_pm_bk's sparse-damage default cap, so private
    mostly-clean stream pairs don't widen the static correction gather."""
    if rs_mode == "check":
        hdr_wire_T = np.asarray(layout.header_words.T, dtype=np.int8)

        def validate(hdrs):
            return jnp.all(hdrs == jnp.asarray(hdr_wire_T), axis=(1, 2))
        return validate

    from .gf27 import np_sym_to_dig
    hdr_syms = header_mod.pack(sf_hdr)
    expA = np.asarray(hdr_syms[:18], dtype=np.int64)
    expB = np.concatenate([hdr_syms[18:27], np.zeros(9, dtype=np.int64)])
    exp_pm = np.stack([np_sym_to_dig(expA).T, np_sym_to_dig(expB).T],
                      axis=1).astype(np.int8)    # (3, 2, 18)

    def validate(hdrs):
        n = hdrs.shape[0]
        # header symbols word-major: (9, 6) slab -> (6, 9) -> 54
        sy = hdrs.swapaxes(1, 2).reshape(n, HEADER_WORDS * NUM_BANDS)
        blocks = jnp.concatenate([sy[:, :26], sy[:, 26:52]], axis=0) \
            .astype(jnp.float32)                 # (2n, 26)
        q1 = jnp.floor(blocks * (1.0 / 3.0))
        q2 = jnp.floor(blocks * (1.0 / 9.0))
        dig = jnp.stack([blocks - 3.0 * q1, q1 - 3.0 * q2,
                         q2 - 3.0 * jnp.floor(q2 * (1.0 / 3.0))],
                        axis=0).astype(jnp.int8)  # (3, 2n, 26)
        # paged: intact PAGES skip the r=8 chain (the dirty-page gather
        # selects them out), but the chain's static gathered width is
        # C*page, so capacity C is a compile-time cost knob.  Repair
        # dispatch (100% flagged batch): C = npage, every page covered
        # (the sparse cap false-flagged correctable headers at >8 dirty
        # pages -- round-4 20%-dirty failure: 404 damaged headers ->
        # 13 pages, 5 beyond cap -> 218 false flags).  Direct paged
        # streams: the sparse default max(8, npage/8) keeps the static
        # chain narrow on mostly-clean input.
        npage_h = -(-dig.shape[1] // 64)
        hdr_dig, ok_h = rs.decode_paged_pm_bk(
            dig, 18, page=64,
            max_dirty_pages=npage_h if hdr_all_pages else None)
        exp = jnp.broadcast_to(jnp.asarray(exp_pm)[:, :, None, :],
                               (3, 2, n, 18)).reshape(3, 2 * n, 18)
        return (ok_h & jnp.all(hdr_dig == exp, axis=(0, 2))) \
            .reshape(2, n).all(axis=0)
    return validate


@functools.cache
def _stream_fns(cfg: EncoderConfig, sf_batch: int, rs_mode: str = "paged",
                ok_per_sf: bool = False, raw_wire: str = "words",
                hdr_all_pages: bool = False):
    """Build the jitted stream encode/decode pair for one config.

    ok_per_sf=False (default): dec_stream returns (raw, ok_scalar).
    ok_per_sf=True: dec_stream returns (raw, ok (n_sf,)) -- per-superframe
    flags (body blocks AND header match), so the two-phase auto decode can
    re-dispatch the corrector on ONLY the dirty superframes.

    hdr_all_pages=True: widen the header validator's page capacity to
    cover every page (see _header_validator) -- set by the two-phase
    phase-2 repair dispatch and the public non-check strategies.

    raw_wire="planes": enc_stream takes (n_sf, 9, sf_words) RAW planes --
    callers that can stage the input plane-major skip the 14x-padded
    read of a 9-lane-minor word array (docs/PERF.md)."""
    if rs_mode == "legacy":    # historical alias (pre-paged full chain)
        rs_mode = "full"
    layout = build_encode_layout(cfg, cfg.superframe_words)
    enc_one = _encode_fn(layout, wire="planes", raw_wire=raw_wire)
    sf_hdr = SuperframeHeader(
        profile=cfg.profile, uep=cfg.uep, tile=cfg.tile, seed=cfg.seed,
        beacon=cfg.beacon, subword=cfg.subword, centered=cfg.centered,
        coset=cfg.coset)
    dlayout = build_decode_layout(sf_hdr, layout.total_words - HEADER_WORDS)

    def _rebatch(x):
        # pad the superframe axis to a multiple of sf_batch (repeat last)
        # so lax.map sees equal micro-batches; callers slice back.
        n = x.shape[0]
        nb = _ceil_div(n, sf_batch)
        pad = nb * sf_batch - n
        if pad:
            x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)
        return x.reshape(nb, sf_batch, *x.shape[1:])

    @jax.jit
    def enc_stream(chunks):
        # (n_sf, sf_words, 9) -> (n_sf, 9, total); raw_wire="planes":
        # input is (n_sf, 9, sf_words)
        n = chunks.shape[0]
        out = lax.map(jax.vmap(enc_one), _rebatch(chunks))
        return out.reshape(-1, NUM_BANDS, layout.total_words)[:n]

    # per-superframe decode under vmap (measured fastest structure); the
    # RS chain strategy (paged / full) is selected inside _decode_body_fn
    dec_body = jax.vmap(_decode_body_fn(dlayout, rs_mode, wire="planes"))

    # fused Pallas check decode: the whole verify+extract path as ONE
    # VMEM-resident kernel per superframe (ops/dec_pallas.py) -- replaces
    # the ~2 dozen HBM-materialized intermediates of the XLA chain
    dec_fused = None
    if rs_mode == "check" and os.environ.get("T3_DEC_IMPL", "xla") == "pallas":
        from . import dec_pallas
        if dec_pallas.supported(dlayout):
            dec_fused = dec_pallas.check_decode_fn(
                dlayout, interpret=jax.default_backend() == "cpu")

    # header validation: check mode byte-compares the constant wire words
    # (scrub); other modes RS-decode both header blocks on device and
    # require the corrected payload to match the caller's config --
    # catching header corruption beyond t=4 errors AND config mismatch,
    # instead of silently trusting the caller (_header_validator)
    validate_hdrs = _header_validator(layout, sf_hdr, rs_mode,
                                      hdr_all_pages=hdr_all_pages)

    @jax.jit
    def dec_stream(words):  # (n_sf, 9, total) -> ((n_sf, 9, out_words), ok)
        n = words.shape[0]
        if dec_fused is not None:
            raw, ok = dec_fused(words[:, :, HEADER_WORDS:])
        else:
            raw, ok = lax.map(dec_body, _rebatch(words[:, :, HEADER_WORDS:]))
            raw = raw.reshape(-1, NUM_BANDS, dlayout.n_out_words)[:n]
            ok = ok.reshape(-1)[:n]                 # (n,) per superframe
        hdr_sf = validate_hdrs(words[:, :, :HEADER_WORDS])
        if ok_per_sf:
            return raw, ok & hdr_sf
        return raw, jnp.all(ok) & jnp.all(hdr_sf)

    return layout, dlayout, enc_stream, dec_stream


def roundtrip_stream_fn(cfg: EncoderConfig, sf_batch: int,
                        rs_mode: str = "check", raw_wire: str = "words",
                        fold=None, feed=None):
    """Fused encode->decode verify roundtrip over a superframe stream.

    The write-verify scrub shape (the stream analog of the reference's
    selftest_api_roundtrip, old/.../v6_min.hpp:1208-1230): each lax.map
    micro-batch encodes AND check-decodes its superframes in one fused
    body, so the wire words live only in VMEM -- they are never
    materialized to HBM (the separate enc/dec streams each pay a full
    HBM pass over ~170 MB of profile words per 8K frame).  Only the RAW
    output, the per-superframe ok flags, and the 6-word header slabs
    (for the hoisted header validation) reach HBM, and the map step
    count halves versus running the two streams back to back.

    Returns a jitted fn: chunks (n_sf, sf, 9) [raw_wire="planes":
    (n_sf, 9, sf)] -> (raw (n_sf, 9, out_words), ok (n_sf,) bool).

    fold: optional per-superframe reducer ((9, out_words) int8 -> array).
    When given, the decoded planes are folded INSIDE the map body (they
    never reach HBM -- e.g. a checksum or a quality metric) and the fn
    returns (folded (n_sf, ...), ok) instead of the raw planes.

    feed: optional (src, make) pair for device-synthesized inputs: the
    returned fn takes per-superframe aux arrays (leading dim = stream
    length) instead of chunks, and the map body builds each chunk as
    make(src, *aux_row) -- e.g. a row gather + variant add fused into
    the encoder's first read, so a long synthetic stream never occupies
    HBM (bench.py stages ~150 MB instead of gigabytes per dispatch).
    """
    layout = build_encode_layout(cfg, cfg.superframe_words)
    enc_one = _encode_fn(layout, wire="planes", raw_wire=raw_wire)
    sf_hdr = SuperframeHeader(
        profile=cfg.profile, uep=cfg.uep, tile=cfg.tile, seed=cfg.seed,
        beacon=cfg.beacon, subword=cfg.subword, centered=cfg.centered,
        coset=cfg.coset)
    dlayout = build_decode_layout(sf_hdr, layout.total_words - HEADER_WORDS)
    dec_one = _decode_body_fn(dlayout, rs_mode, wire="planes")
    validate_hdrs = _header_validator(layout, sf_hdr, rs_mode)

    def sf_body(c):
        w = enc_one(c)                               # (9, total) in VMEM
        out, ok = dec_one(w[:, HEADER_WORDS:])
        if fold is not None:
            out = fold(out)
        return out, ok, w[:, :HEADER_WORDS]

    if feed is not None:
        src, make = feed
        src = jnp.asarray(src)
        body = jax.vmap(lambda *aux: sf_body(make(src, *aux)))
    else:
        body = jax.vmap(sf_body)

    def _rebatch(x):
        n = x.shape[0]
        nb = _ceil_div(n, sf_batch)
        pad = nb * sf_batch - n
        if pad:
            x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)
        return x.reshape(nb, sf_batch, *x.shape[1:])

    # micro-batch loop = plain lax.map (scan-unrolling it was DISPROVEN on
    # chip: live VMEM temps bloat across unrolled steps, docs/PERF.md)
    _map = lax.map

    def _post(n, out, ok, hdrs):
        out = (out.reshape(-1, NUM_BANDS, dlayout.n_out_words)
               if fold is None else out.reshape((-1,) + out.shape[2:]))[:n]
        ok = ok.reshape(-1)[:n]
        hdrs = hdrs.reshape(-1, NUM_BANDS, HEADER_WORDS)[:n]
        # hoisted header validation (same contract as _stream_fns.dec_stream)
        return out, ok & validate_hdrs(hdrs)

    if feed is not None:
        @jax.jit
        def roundtrip(*aux):
            n = aux[0].shape[0]
            out, ok, hdrs = _map(lambda t: body(*t),
                                 tuple(_rebatch(a) for a in aux))
            return _post(n, out, ok, hdrs)
    else:
        @jax.jit
        def roundtrip(chunks):
            out, ok, hdrs = _map(body, _rebatch(chunks))
            return _post(chunks.shape[0], out, ok, hdrs)

    return roundtrip


def encode_stream_superframes(raw_words, cfg: EncoderConfig,
                              sf_batch: int = 64):
    """RAW words -> (n_sf, total_words, 9) profile words, one bounded
    superframe per cfg.superframe_words RAW words.

    lax.map over vmapped micro-batches: peak memory is O(sf_batch
    superframes) regardless of frame size; the micro-batch keeps the RS
    matmuls MXU-sized.  The tail superframe is zero-padded (decoders recover
    exactly n_raw words from the caller's count).

    The device hot path works in wire-planes (n_sf, 9, total) -- word axis
    minor, no 9-lane tile padding (docs/PERF.md); this wrapper transposes
    once at the boundary for the public word-major contract.  Perf-critical
    callers use _stream_fns directly and stay in planes.
    """
    raw_words = jnp.asarray(raw_words)
    n = int(raw_words.shape[0])
    sf = cfg.superframe_words
    n_sf = _ceil_div(n, sf)
    pad = n_sf * sf - n
    if pad:
        raw_words = jnp.concatenate(
            [raw_words, jnp.zeros((pad, NUM_BANDS), dtype=raw_words.dtype)])
    chunks = raw_words.reshape(n_sf, sf, NUM_BANDS)
    _layout, _dl, enc, _dec = _stream_fns(cfg, sf_batch)
    return enc(chunks).swapaxes(1, 2)


@functools.cache
def _repair_merge_fn(cfg: EncoderConfig, sf_batch: int):
    """Fused phase-2 repair for the two-phase auto decode: gather the
    flagged superframes, run the paged corrector, scatter the fixed
    decodes over the phase-1 output, and reduce the repair ok flags --
    all in ONE dispatch (each eager step would pay the ~25 ms tunnel
    dispatch floor separately, docs/PERF.md)."""
    _l, _d, _enc, dec_fix = _stream_fns(cfg, sf_batch, rs_mode="paged",
                                        ok_per_sf=True, hdr_all_pages=True)

    @jax.jit
    def repair_merge(raw_T, words_T, bad):
        fix_T, ok_fix = dec_fix(words_T[bad])
        return raw_T.at[bad].set(fix_T), jnp.all(ok_fix)

    return repair_merge


@functools.cache
def _fused_auto_fn(cfg: EncoderConfig, sf_batch: int, repair_cap: int):
    """ONE-dispatch two-phase decode: check + device-compacted repair.

    The host-branch auto strategy (decode_stream_superframes) serializes
    phase 1 -> D2H of the ok flags -> argwhere -> H2D -> phase-2 dispatch;
    on the remote-tunnel chip that boundary costs a full pipeline drain
    plus a second ~25 ms dispatch floor PER STREAM even when only a
    handful of superframes are dirty (docs/PERF.md machine constants).
    This variant keeps the branch ON DEVICE: a stable argsort of the
    phase-1 ok flags compacts the flagged superframe indices to the
    front, the paged corrector runs over a FIXED repair_cap-slot window
    gathered from those indices, and the fixes scatter back over the
    phase-1 output -- check + repair as one program, no host round-trip.

    Semantics vs auto: identical for <= repair_cap dirty superframes
    (padding slots hold CLEAN superframes whose paged re-decode is
    idempotent, exactly like auto's repeat-last index padding); MORE
    than repair_cap dirty superframes fails safe (ok=False) instead of
    auto's unbounded host-side re-dispatch.  Clean streams pay the
    repair window's chain cost (auto pays nothing) -- but on the TPU
    backend that window measured CHEAPER than the jit-boundary relayout
    copies the single-program structure eliminates (dirty decode 30.3
    -> 45.6 fps, ratio over the check-only clean dispatch 0.955,
    docs/PERF.md round-5), so "fused" is the fast choice there even
    for clean streams.  On CPU it measures ~8% slower than check-only;
    auto stays the portable default.

    NOTE on input staging: this fn takes ONE flat superframe axis.  If
    the stream lives as (frames, n_sf, ...) with those dims non-adjacent
    in the staged layout, reshaping to flat materializes a loop-of-
    slices relayout (~42 ms per 8x2025 set on chip) -- keep the axes
    and run the same structure with 2-D index gather/scatter instead
    (bench.py dec_fused_frames; docs/PERF.md round-5).
    """
    _l, _d, _enc, dec_check = _stream_fns(cfg, sf_batch, rs_mode="check",
                                          ok_per_sf=True)
    _l2, _d2, _e2, dec_fix = _stream_fns(cfg, repair_cap, rs_mode="paged",
                                         ok_per_sf=True, hdr_all_pages=True)

    @jax.jit
    def dec_fused(words_T):            # (n_sf, 9, total) wire planes
        raw_T, ok_sf = dec_check(words_T)
        nbad = jnp.sum(~ok_sf)
        # stable ascending sort of the bool flags puts flagged (False)
        # superframes first, in stream order; a slice of the index
        # vector is the compacted dirty set (static shape, no host)
        order = jnp.argsort(ok_sf, stable=True)
        idx = order[:repair_cap]       # clamps to n_sf when cap > n_sf
        fix_T, ok_fix = dec_fix(words_T[idx])
        raw_T = raw_T.at[idx].set(fix_T)
        # flagged slots must repair ok; padding slots are clean
        # superframes (paged decode returns ok=True); overflow fails safe
        return raw_T, jnp.all(ok_fix) & (nbad <= idx.shape[0])

    return dec_fused


def decode_stream_superframes(words, cfg: EncoderConfig, n_raw: int,
                              sf_batch: int = 64, strategy: str = "auto",
                              repair_cap: int | None = None):
    """(n_sf, total_words, 9) profile words -> (n_raw, 9) RAW words + ok.

    Each superframe decodes to n_out_words >= superframe_words; only the
    first superframe_words per chunk are payload (the rest is RS-block
    padding), so slice per-chunk before flattening.  (Boundary transposes
    into/out of the wire-planes device layout; see
    encode_stream_superframes.)

    strategy="auto" (default) is the production two-phase decode: phase 1
    verifies + extracts in one dispatch (rs_mode="check" -- a full
    syndrome check of every block, no correction machinery; headers are
    byte-compared against the config's constant wire words) and returns
    per-superframe dirty flags; phase 2 dispatches the page-compacted
    corrector on ONLY the flagged superframes (host-level gather), so a
    single flipped trit costs one small repair dispatch, not a full
    re-decode of the stream.  Correctable header damage is flagged by
    phase 1 and repaired by phase 2's RS header decode -- ok end to end,
    same as before, without every clean superframe paying the chain.  Intact streams -- the overwhelmingly common
    case -- never pay for correction.  The branch lives on the HOST: a
    device-side lax.cond was measured SLOWER than just always correcting
    (docs/PERF.md).  strategy="paged"/"full"/"check"/"none" force a
    single-phase decode with that rs_mode.

    strategy="fused" runs BOTH phases in ONE dispatch with the branch on
    device (_fused_auto_fn): the phase-1 flags are compacted by a stable
    argsort and the paged corrector runs over a fixed repair_cap-slot
    window (default env_repair_sfb(sf_batch)).  Same answers as auto up
    to repair_cap dirty superframes; beyond that it fails safe
    (ok=False) instead of re-dispatching unboundedly.  It removes the
    phase-1 -> host -> phase-2 serialization (a pipeline drain plus a
    second ~25 ms tunnel dispatch floor) AND the two-program
    structure's jit-boundary relayout copies; the repair window's
    chain runs even when the stream turns out clean, but on the TPU
    backend the window measured CHEAPER than the relayouts it
    eliminates (dirty decode 30.3 -> 45.6 fps vs auto; 0.955x the
    check-only clean dispatch -- docs/PERF.md round-5), so on TPU
    prefer "fused" for any stream whose dirty rate fits the window.
    "auto" remains the portable default (on CPU the window costs ~8%
    extra).
    """
    words = jnp.asarray(words)
    words_T = jnp.swapaxes(words, 1, 2)
    if strategy == "auto":
        _l, _d, _enc, dec_check = _stream_fns(cfg, sf_batch,
                                              rs_mode="check",
                                              ok_per_sf=True)
        raw_T, ok_sf = dec_check(words_T)
        bad = np.flatnonzero(~np.asarray(ok_sf))
        ok = jnp.asarray(bad.size == 0)
        if bad.size:
            # phase 2: ONE fused dispatch gathers the dirty superframes,
            # runs the page-compacted corrector, and scatters the fixes
            # back -- the eager gather / repair / scatter / all() chain it
            # replaces paid a ~25 ms tunnel dispatch floor PER STEP
            # (docs/PERF.md machine constants).  The index vector is
            # host-padded to a multiple of r_sfb (the repair micro-batch;
            # repeat last) so the fused program's shape -- and its compile
            # -- is quantized to micro-batch multiples, exactly like
            # _rebatch pads data; duplicate scatter indices write
            # identical decodes.
            # Repair micro-batch: the paged corrector pays a per-op-
            # instance floor (~40 us/op/step, docs/PERF.md), so its cost
            # scales with the lax.map STEP count -- quantize the dirty
            # set to its own (smaller) batch so a handful of flagged
            # superframes compiles and runs a single small step instead
            # of a full sf_batch-wide one.
            r_sfb = env_repair_sfb(sf_batch)
            nb_pad = _ceil_div(bad.size, r_sfb) * r_sfb
            bad_p = np.concatenate(
                [bad, np.repeat(bad[-1:], nb_pad - bad.size)])
            raw_T, ok = _repair_merge_fn(cfg, r_sfb)(
                raw_T, words_T, jnp.asarray(bad_p))
    elif strategy == "fused":
        cap = repair_cap if repair_cap else env_repair_sfb(sf_batch)
        raw_T, ok = _fused_auto_fn(cfg, sf_batch, cap)(words_T)
    else:
        _l, _d, _enc, dec = _stream_fns(
            cfg, sf_batch, rs_mode=strategy,
            hdr_all_pages=strategy != "check")
        raw_T, ok = dec(words_T)
    raw = raw_T[:, :, :cfg.superframe_words].swapaxes(1, 2) \
        .reshape(-1, NUM_BANDS)[:n_raw]
    return raw, ok


def decode_profile_to_raw(words, raw_mode: bool = False):
    """Profile words -> (raw_words, header, ok).

    Mirrors decode_profile_to_raw (old/.../v6_min.hpp:995-1041) with
    host-side header decode + config-specialized jitted body decode.
    """
    words = jnp.asarray(words)
    if raw_mode:
        return words, None, True
    hdr, ok = decode_header_from_words(np.asarray(words))
    if not ok:
        return None, None, False
    H = int(words.shape[0]) - HEADER_WORDS
    layout = build_decode_layout(hdr, H)
    raw, body_ok = _decode_body_fn(layout)(words[HEADER_WORDS:])
    return raw, hdr, bool(body_ok)
