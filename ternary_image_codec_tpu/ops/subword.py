"""Subword (S27/S24/S21/S18/S15) stream helpers + word9 trit views.

A "word" is 9 GF27 symbols = 27 trits.  Subword mode N keeps the first N
trits of each word useful; the rest are fill.  All helpers are pure
reshape/slice ops on (n_words, 9) symbol arrays.

Reference parity: old/include/ternary_image_codec_v6_min.hpp:815-859.
"""
from __future__ import annotations

import jax.numpy as jnp

from .trits import sym_to_trits, trits_to_sym


def words_to_trits(words):
    """(..., n_words, 9) symbols -> (..., n_words, 27) trits (LSD-first/sym)."""
    w = jnp.asarray(words)
    t = sym_to_trits(w, 3)  # (..., n_words, 9, 3)
    return t.reshape(*w.shape[:-1], 27)


def trits_to_words(trits):
    """(..., n_words, 27) trits -> (..., n_words, 9) symbols."""
    t = jnp.asarray(trits)
    return trits_to_sym(t.reshape(*t.shape[:-1], 9, 3)).astype(jnp.int8)


def extract_subword_stream(words, n_useful: int):
    """(n_words, 9) words -> flat trit stream of the first N trits per word."""
    t = words_to_trits(words)
    return t[..., :n_useful].reshape(*t.shape[:-2], -1)


def build_words_from_stream(stream, n_useful: int, fill: int = 0):
    """Flat trit stream -> (n_words, 9) words, N useful trits per word.

    The final partial word is padded with `fill`, as are trits N..26.
    """
    s = jnp.asarray(stream)
    n = s.shape[-1]
    n_words = -(-n // n_useful) if n else 0
    pad = n_words * n_useful - n
    if pad:
        s = jnp.pad(s, [(0, 0)] * (s.ndim - 1) + [(0, pad)], constant_values=fill)
    s = s.reshape(*s.shape[:-1], n_words, n_useful)
    if n_useful < 27:
        fill_a = jnp.full((*s.shape[:-1], 27 - n_useful), fill, dtype=s.dtype)
        s = jnp.concatenate([s, fill_a], axis=-1)
    return trits_to_words(s)
