"""2D boustrophedon interleave as precomputed gather permutations.

Reference semantics (old/include/ternary_image_codec_v6_min.hpp:749-813):
the symbol stream is chunked into tiles of area A = w*h; within each chunk,
symbols are re-read row by row, even rows left-to-right, odd rows
right-to-left.  A partial final chunk uses the same snake order filtered to
indices < take.  Interleave/deinterleave are exact inverses.

TPU-native: the whole permutation (for a given stream length and tile) is
precomputed once in numpy; applying it is a single jnp.take, its inverse a
take with argsort(perm).  No device control flow at all.
"""
from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.cache
def snake_order(w: int, h: int) -> np.ndarray:
    """Indices of one full tile in boustrophedon read order."""
    idx = np.arange(w * h).reshape(h, w)
    idx[1::2] = idx[1::2, ::-1]
    return idx.reshape(-1)


@functools.cache
def perm(n: int, w: int, h: int) -> np.ndarray:
    """Permutation p with out[i] = in[p[i]] for a length-n stream."""
    if w == 0 or h == 0 or n == 0:
        return np.arange(n)
    A = w * h
    order = snake_order(w, h)
    chunks = []
    for start in range(0, n, A):
        take = min(A, n - start)
        o = order[order < take]  # filtered snake order for partial chunk
        chunks.append(start + o)
    return np.concatenate(chunks)


@functools.cache
def inv_perm(n: int, w: int, h: int) -> np.ndarray:
    return np.argsort(perm(n, w, h), kind="stable")


def _snake_full(syms, w: int, h: int):
    """Constant-free snake for streams that are whole tiles: reshape + flip
    of odd rows (self-inverse), no O(n) index constant in the HLO."""
    syms = jnp.asarray(syms)
    n = syms.shape[-1]
    t = syms.reshape(*syms.shape[:-1], n // (w * h), h, w)
    row = jnp.arange(h)[:, None]
    t = jnp.where(row % 2 == 1, jnp.flip(t, axis=-1), t)
    return t.reshape(*syms.shape)


def interleave(syms, w: int, h: int):
    """syms (..., n) -> interleaved (..., n).

    Whole tiles are the constant-free reshape+row-flip; a partial final
    tile takes its (filtered) snake order as a <= w*h-element gather.  No
    O(n) index constant ever reaches the HLO (a full-stream take measured
    ~2.6x the whole P5 pipeline on the chip bench, docs/PERF.md)."""
    syms = jnp.asarray(syms)
    n = syms.shape[-1]
    if w == 0 or h == 0 or n == 0:
        return syms
    A = w * h
    if n % A == 0:
        return _snake_full(syms, w, h)
    nfull = n - n % A
    order = snake_order(w, h)
    tail_o = order[order < n - nfull]
    tail = jnp.take(syms[..., nfull:], jnp.asarray(tail_o), axis=-1)
    if not nfull:
        return tail
    return jnp.concatenate(
        [_snake_full(syms[..., :nfull], w, h), tail], axis=-1)


def deinterleave(syms, w: int, h: int):
    syms = jnp.asarray(syms)
    n = syms.shape[-1]
    if w == 0 or h == 0 or n == 0:
        return syms
    A = w * h
    if n % A == 0:
        return _snake_full(syms, w, h)  # snake is an involution per tile
    nfull = n - n % A
    order = snake_order(w, h)
    tail_o = np.argsort(order[order < n - nfull], kind="stable")
    tail = jnp.take(syms[..., nfull:], jnp.asarray(tail_o), axis=-1)
    if not nfull:
        return tail
    return jnp.concatenate(
        [_snake_full(syms[..., :nfull], w, h), tail], axis=-1)
