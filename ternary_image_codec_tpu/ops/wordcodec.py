"""RAW pixel <-> Word27 codecs.

Two selectable word codecs, as decided in SURVEY.md section 7 (the reference
has two incompatible Word27 ABIs across its trees; we keep both as modes):

* word9  -- 2 pixels per word, 9 GF27 symbols: Y 5 trits + (Cb+40) 4 trits +
            (Cr+40) 4 trits per pixel, spare trit T[26]=0.
            (old/include/ternary_image_codec_v6_min.hpp:665-747)
* word13 -- 1 pixel per word, uint32 holding the 13-trit integer
            code = Y + 243*(Cb+40 + 81*(Cr+40)).
            (src/ternary_image_codec_v6_min.cpp:44-155)

Quantized pixel streams are (n, 3) int32 arrays [Yq, Cbq, Crq] with
Yq in [0,242], Cbq/Crq in [-40,40].  Everything is elementwise/reshape math
(VPU-friendly).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import SubwordMode
from .subword import trits_to_words, words_to_trits

POW3_4 = 81
POW3_5 = 243


def _digits(v, n):
    v = v.astype(jnp.int32)
    out = []
    for _ in range(n):
        out.append(v % 3)
        v = v // 3
    return jnp.stack(out, axis=-1)


def _undig(t):
    w = jnp.asarray([3 ** i for i in range(t.shape[-1])], dtype=jnp.int32)
    return jnp.sum(t.astype(jnp.int32) * w, axis=-1)


# ---------------------------------------------------------------------------
# word9: 2 px / word
# ---------------------------------------------------------------------------


def quant_to_words9(q):
    """(n, 3) quant pixels -> (ceil(n/2), 9) GF27 words.

    Odd tails are padded with a default pixel (Yq=0, Cbq=0, Crq=0), matching
    encode_raw_pixels_to_words (old/.../v6_min.hpp:723-734).
    """
    q = jnp.asarray(q).astype(jnp.int32)
    n = q.shape[0]
    if n % 2:
        pad = jnp.zeros((1, 3), dtype=jnp.int32)
        q = jnp.concatenate([q, pad], axis=0)
    a, b = q[0::2], q[1::2]

    def px_trits(p):
        return jnp.concatenate([
            _digits(p[:, 0], 5),            # Yq: 5 trits
            _digits(p[:, 1] + 40, 4),       # Cbq+40: 4 trits
            _digits(p[:, 2] + 40, 4),       # Crq+40: 4 trits
        ], axis=-1)                          # (m, 13)

    t = jnp.concatenate([px_trits(a), px_trits(b),
                         jnp.zeros((a.shape[0], 1), dtype=jnp.int32)], axis=-1)
    return trits_to_words(t)


def words9_to_quant(words, n_pixels=None):
    """(m, 9) words -> (2m, 3) quant pixels (optionally truncated)."""
    t = words_to_trits(jnp.asarray(words))  # (m, 27)

    def px(tr):
        return jnp.stack([
            _undig(tr[:, 0:5]),
            _undig(tr[:, 5:9]) - 40,
            _undig(tr[:, 9:13]) - 40,
        ], axis=-1)

    a = px(t[:, 0:13])
    b = px(t[:, 13:26])
    q = jnp.stack([a, b], axis=1).reshape(-1, 3)
    if n_pixels is not None:
        q = q[:n_pixels]
    return q


# ---------------------------------------------------------------------------
# word13: 1 px / word (uint32)
# ---------------------------------------------------------------------------


def quant_to_words13(q):
    """(n, 3) quant pixels -> (n,) uint32 13-trit codes.

    Defensive clamps per pack13_from_quant (src/ternary_image_codec_v6_min
    .cpp:62-78).
    """
    q = jnp.asarray(q).astype(jnp.int32)
    Y = jnp.clip(q[:, 0], 0, 242)
    Cb = jnp.clip(q[:, 1] + 40, 0, 80)
    Cr = jnp.clip(q[:, 2] + 40, 0, 80)
    return (Y + POW3_5 * (Cb + POW3_4 * Cr)).astype(jnp.uint32)


def words13_to_quant(codes):
    """(n,) uint32 codes -> (n, 3) quant pixels
    (src/ternary_image_codec_v6_min.cpp:81-94)."""
    c = jnp.asarray(codes).astype(jnp.int32)
    Y = jnp.minimum(c % POW3_5, 242)
    block = c // POW3_5
    Cb = jnp.clip(block % POW3_4 - 40, -40, 40)
    Cr = jnp.clip(block // POW3_4 - 40, -40, 40)
    return jnp.stack([Y, Cb, Cr], axis=-1)


# ---------------------------------------------------------------------------
# fused plane-major ingest/egress (the streaming e2e hot path)
#
# RGB pixels -> word9 planes and back as ONE fused elementwise chain in
# exact f32 arithmetic: integer % and // lower to real division on the TPU
# VPU (measured ~60x slower, docs/PERF.md "float32 trit arithmetic"), and
# the (n, 3)/(n, 9) minor-dim layouts of the generic API pad their tiny
# minor axes to 128 lanes on every pass.  Inputs/outputs are PLANE-major:
# RGB (3, 2, m) uint8 [channel, pixel-parity, word] and words (9, m) int8
# -- the pair split is host staging, exactly like raw_wire="planes".
# Bit-exact vs the generic rgb_to_quant/quant_to_words9 path
# (tests/test_wordcodec.py) incl. the C++ double-lround fixups.
# ---------------------------------------------------------------------------


def _f32_floordiv(num, den: float):
    """Exact floor(num / den) for f32-exact integer num >= 0: the f32
    reciprocal multiply may land one ulp either side of an exact quotient,
    so apply a one-step +-1 correction (docs/PERF.md float-trit rule)."""
    c = jnp.floor(num * jnp.float32(1.0 / den))
    rem = num - c * jnp.float32(den)
    c = c + (rem >= jnp.float32(den)) - (rem < 0)
    return c


def _floordiv3_small(v):
    """floor(v / 3) for integer f32 v in [0, 2186] -- the uncorrected
    reciprocal multiply is EXACT on this domain (exhaustively verified
    for dens 3/9/27 up to 2186, docs/PERF.md round-5), so the +-1
    correction's 4 extra ops per divmod are dead weight in the
    ingest/egress digit chains (13 resp. 27 divmods per pixel pair)."""
    return jnp.floor(v * jnp.float32(1.0 / 3.0))


def _dig_nocorr(v, n):
    """n base-3 digits of integer f32 v in [0, 2186], LSD first."""
    out = []
    for _ in range(n):
        q3 = _floordiv3_small(v)
        out.append(v - 3.0 * q3)
        v = q3
    return out


def _lround_ratio_f32(n, p: int, q: int):
    """Exact f32 lround(n * p / q) (round half away from zero) for integer
    f32 n with |2*p*n + q| well inside f32's exact-integer range."""
    mag = _f32_floordiv(2.0 * p * jnp.abs(n) + q, 2 * q)
    return jnp.where(n < 0, -mag, mag)


def ingest9_planes(rgb):
    """(3, 2, m) uint8 planar RGB -> (9, m) int8 word9 planes.

    The full reference ingest math -- BT.601 RGB->YCbCr with lround
    (include/io_image.hpp:66-93), quantization (:80-99), and the 2px/word
    trit pack (old/.../v6_min.hpp:693-747) -- as one fused f32 chain."""
    from . import quant as qt
    x = jnp.asarray(rgb).astype(jnp.float32)          # (3, 2, m)
    r, g, b = x[0], x[1], x[2]                        # (2, m) each
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    # lround_f32 + clip.  y/cb/cr are provably >= 0 for u8 inputs (the
    # BT.601 rows' negative coefficients sum to -0.5, so cb/cr >= 128 -
    # 127.5 = 0.5), so lround == floor(v + 0.5) -- the v < 0 arm of the
    # reference's lround is dead here (bit-exactness pinned by the
    # golden-oracle tests in tests/test_image_bridge.py)
    rnd = lambda v: jnp.clip(jnp.floor(v + 0.5), 0.0, 255.0)
    y, cb, cr = rnd(y), rnd(cb), rnd(cr)
    yq = jnp.clip(_lround_ratio_f32(y, 242, 255), 0.0, 242.0)
    cbq = jnp.clip(_lround_ratio_f32(cb - 128.0, 40, 128), -40.0, 40.0) + 40.0
    crq = jnp.clip(_lround_ratio_f32(cr - 128.0, 40, 128), -40.0, 40.0) + 40.0
    # 13 trits per pixel: Yq 5, Cbq+40 4, Crq+40 4 (f32 divmod chains;
    # domain <= 242 -> correction-free divmods, see _dig_nocorr)
    t = _dig_nocorr(yq, 5) + _dig_nocorr(cbq, 4) + _dig_nocorr(crq, 4)
    # word symbol s = t[3s] + 3 t[3s+1] + 9 t[3s+2] over the 27-trit pair
    # layout [a 0..12 | b 13..25 | 0]; trit j of pixel-parity e is t[j][e]
    t27 = [t[j][0] for j in range(13)] + [t[j][1] for j in range(13)] \
        + [jnp.zeros_like(t[0][0])]
    syms = [t27[3 * s] + 3.0 * t27[3 * s + 1] + 9.0 * t27[3 * s + 2]
            for s in range(9)]
    return jnp.stack(syms, axis=0).astype(jnp.int8)   # (9, m)


def egress9_planes(wplanes):
    """(9, m) int8 word9 planes -> (3, 2, m) uint8 planar RGB (the fused
    reverse bridge: trit unpack, dequantization with the C++ double-lround
    fixups, YCbCr->RGB -- include/io_image.hpp:94-124 semantics)."""
    from . import quant as qt
    w = jnp.asarray(wplanes).astype(jnp.float32)      # (9, m)
    t27 = []
    for s in range(9):
        v = w[s]                       # syms <= 26: correction-free divs
        q1 = _floordiv3_small(v)
        q2 = _floordiv3_small(q1)
        t27 += [v - 3.0 * q1, q1 - 3.0 * q2, q2]
    def undig(ts):
        acc = ts[0]
        for i, tt in enumerate(ts[1:], 1):
            acc = acc + float(3 ** i) * tt
        return acc
    outs = []
    for base in (0, 13):                              # pixel a / b
        yq = undig(t27[base:base + 5])
        cbq = undig(t27[base + 5:base + 9]) - 40.0
        crq = undig(t27[base + 9:base + 13]) - 40.0
        y = _lround_ratio_f32(yq, 255, 242)
        for n_in, n_out in zip(qt._Y_FIX_IN, qt._Y_FIX_OUT):
            y = jnp.where(yq == float(n_in), jnp.float32(n_out), y)
        cb = _lround_ratio_f32(cbq, 128, 40)
        cr = _lround_ratio_f32(crq, 128, 40)
        for n_in, n_out in zip(qt._C_FIX_IN, qt._C_FIX_OUT):
            cb = jnp.where(cbq == float(n_in), jnp.float32(n_out), cb)
            cr = jnp.where(crq == float(n_in), jnp.float32(n_out), cr)
        y = jnp.clip(y, 0.0, 255.0)
        cb = jnp.clip(128.0 + cb, 0.0, 255.0) - 128.0
        cr = jnp.clip(128.0 + cr, 0.0, 255.0) - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        rnd = lambda v: jnp.clip(jnp.where(v < 0, -jnp.floor(0.5 - v),
                                           jnp.floor(v + 0.5)), 0.0, 255.0)
        outs.append([rnd(r), rnd(g), rnd(b)])
    return jnp.stack([jnp.stack([outs[0][c], outs[1][c]], axis=0)
                      for c in range(3)], axis=0).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# subword-validating API parity (src/ternary_image_codec_v6_min.cpp:104-155)
# ---------------------------------------------------------------------------


def encode_raw_pixels_to_words_subword(q, sub: SubwordMode, codec: str = "word13"):
    if not isinstance(sub, SubwordMode):
        raise ValueError(f"invalid subword mode: {sub!r}")
    return quant_to_words13(q) if codec == "word13" else quant_to_words9(q)


def decode_raw_words_to_pixels_subword(words, sub: SubwordMode,
                                       codec: str = "word13", n_pixels=None):
    if not isinstance(sub, SubwordMode):
        raise ValueError(f"invalid subword mode: {sub!r}")
    if codec == "word13":
        return words13_to_quant(words)
    return words9_to_quant(words, n_pixels)
