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
