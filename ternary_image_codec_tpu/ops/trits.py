"""Trit substrate: vectorized base-3 digit ops for JAX/TPU.

All trit streams are int8/int32 arrays with values in {0,1,2} ("unbalanced",
UTrit) or {-1,0,1} ("balanced", BTrit).  Everything is expressed as
elementwise arithmetic + reshapes so XLA can fuse and tile it onto the VPU;
there are no Python loops over elements anywhere.

Reference parity:
  - pack3/unpack3:      old/include/ternary_image_codec_v6_min.hpp:24-31
  - balanced<->unbal:   include/ternary_image_codec_v6_min.hpp:68-78
  - base-243 (stream):  include/ternary_packing.hpp:18-50
  - base-243 (tail):    old/include/ternary_packing.hpp:10-59
  - words<->bytes:      include/ternary_packing.hpp:53-65
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

POW3 = np.power(3, np.arange(28, dtype=np.int64))  # 3^0 .. 3^27 (int64-exact)


# ---------------------------------------------------------------------------
# symbol <-> trit digits (little-endian base-3, LSD first)
# ---------------------------------------------------------------------------

def _fdivmod(x, d: float):
    """Exact floor-divmod of non-negative f32 integers by d via reciprocal
    multiply + one correction step (integer // and % are ~60x slower on the
    TPU VPU; the f32 product error is < 1, so one +-1 fix makes it exact)."""
    q = jnp.floor(x * jnp.float32(1.0 / d))
    r = x - d * q
    up = (r >= d).astype(jnp.float32)     # q one too small
    q = q + up
    r = r - d * up
    dn = (r < 0).astype(jnp.float32)      # q one too large
    q = q - dn
    r = r + d * dn
    return q, r


def sym_to_trits(sym, n: int = 3):
    """Unpack integers into n base-3 digits (LSD first) along a new last axis."""
    v = jnp.asarray(sym).astype(jnp.float32)
    out = []
    for _ in range(n):
        v, r = _fdivmod(v, 3.0)
        out.append(r)
    return jnp.stack(out, axis=-1).astype(jnp.int8)


def trits_to_sym(trits, dtype=jnp.int32):
    """Pack base-3 digits along the last axis into integers (LSD first)."""
    trits = jnp.asarray(trits)
    n = trits.shape[-1]
    w = jnp.asarray(POW3[:n], dtype=dtype)
    return jnp.sum(trits.astype(dtype) * w, axis=-1)


def pack3(a, b, c):
    """GF27 symbol = a + 3b + 9c (old/...v6_min.hpp:24-27)."""
    return (jnp.asarray(a).astype(jnp.int32)
            + 3 * jnp.asarray(b).astype(jnp.int32)
            + 9 * jnp.asarray(c).astype(jnp.int32))


def unpack3(s):
    """Inverse of pack3 -> (..., 3) trits (old/...v6_min.hpp:28-31)."""
    return sym_to_trits(s, 3)


# ---------------------------------------------------------------------------
# balanced <-> unbalanced
# ---------------------------------------------------------------------------

def bal_to_unb(t):
    """{-1,0,+1} -> {0,1,2} with defensive clamp (include/...v6_min.hpp:68-72)."""
    t = jnp.clip(jnp.asarray(t), -1, 1)
    return (t + 1).astype(jnp.int8)


def unb_to_bal(t):
    """{0,1,2} -> {-1,0,+1}; out-of-range maps to 0 (include/...v6_min.hpp:73-78)."""
    t = jnp.asarray(t)
    t = jnp.where(t > 2, 1, t)
    return (t - 1).astype(jnp.int8)


# ---------------------------------------------------------------------------
# signed integer <-> fixed-length balanced ternary (minitest T2 parity)
# ---------------------------------------------------------------------------

def int_to_balanced_fixed(values, L: int):
    """Signed int -> L balanced trits (LSD first), range +-(3^L-1)/2.

    Carry algorithm as in src/minitest_trits.cpp:53-66: digit d = v%3 mapped
    to {0,1,-1 with carry} per step.
    """
    v = jnp.asarray(values).astype(jnp.int32)
    digs = []
    for _ in range(L):
        d = jnp.mod(v, 3)          # 0..2 (Python-style mod, matches v%3 for v>=0)
        d = jnp.where(d == 2, -1, d)
        v = (v - d) // 3
        digs.append(d)
    return jnp.stack(digs, axis=-1).astype(jnp.int8)


def balanced_fixed_to_int(trits):
    trits = jnp.asarray(trits)
    L = trits.shape[-1]
    w = jnp.asarray(POW3[:L], dtype=jnp.int32)
    return jnp.sum(trits.astype(jnp.int32) * w, axis=-1)


# Host (numpy, int64-exact) variants — the device int32 versions cap at
# L <= 19 (3^19 < 2^31); the minitest T2 property runs up to L = 27.

def np_int_to_balanced_fixed(values, L: int) -> np.ndarray:
    v = np.asarray(values, dtype=np.int64).copy()
    digs = np.empty(v.shape + (L,), dtype=np.int8)
    for i in range(L):
        d = np.mod(v, 3)
        d = np.where(d == 2, -1, d)
        v = (v - d) // 3
        digs[..., i] = d
    return digs


def np_balanced_fixed_to_int(trits) -> np.ndarray:
    t = np.asarray(trits, dtype=np.int64)
    return (t * POW3[: t.shape[-1]]).sum(axis=-1)


# ---------------------------------------------------------------------------
# base-243 packing: 5 trits -> 1 byte
# ---------------------------------------------------------------------------

def _pad_to_multiple(x, m: int, axis: int = -1, value=0):
    n = x.shape[axis]
    rem = (-n) % m
    if rem == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, rem)
    return jnp.pad(x, pads, constant_values=value)


def trits_to_base243(trits):
    """Pack a flat trit vector into base-243 bytes (device op).

    Zero-pads the tail; LSD-first within each byte.  Matches both container
    flavors' byte values (include/ternary_packing.hpp:18-27,
    old/include/ternary_packing.hpp:10-40); callers carry total_trits /
    tail_trits metadata themselves.
    """
    t = _pad_to_multiple(jnp.asarray(trits).astype(jnp.int32).reshape(-1), 5)
    t = t.reshape(-1, 5)
    w = jnp.asarray(POW3[:5], dtype=jnp.int32)
    return jnp.sum(t * w, axis=-1).astype(jnp.uint8)


def base243_to_trits(bytes_arr, total_trits: int):
    """Unpack base-243 bytes to exactly total_trits trits (device op)."""
    b = jnp.asarray(bytes_arr).astype(jnp.int32)
    t = sym_to_trits(b, 5).reshape(-1)
    return t[:total_trits]


# Host (numpy) variants for container code -----------------------------------

def np_trits_to_base243(trits: np.ndarray) -> tuple[np.ndarray, int]:
    """Returns (bytes, tail_trits). tail-aware old flavor
    (old/include/ternary_packing.hpp:10-40)."""
    trits = np.asarray(trits, dtype=np.int64).reshape(-1) % 3
    n = trits.size
    tail = n % 5
    pad = (-n) % 5
    if pad:
        trits = np.concatenate([trits, np.zeros(pad, dtype=np.int64)])
    by = (trits.reshape(-1, 5) * POW3[:5]).sum(axis=1).astype(np.uint8)
    return by, tail


def np_base243_to_trits(data: np.ndarray, total_trits: int) -> np.ndarray:
    data = np.asarray(data, dtype=np.int64).reshape(-1)
    v = data[:, None] // POW3[:5] % 3
    return v.reshape(-1)[:total_trits].astype(np.int8)


def np_ut_to_base243_stream(trits: np.ndarray) -> bytes:
    """New-tree stream flavor: u32-LE total_trits header + base-243 bytes
    (include/ternary_packing.hpp:28-40)."""
    by, _ = np_trits_to_base243(trits)
    total = np.uint32(np.asarray(trits).size)
    return total.tobytes() + by.tobytes()


def np_base243_stream_to_ut(buf: bytes) -> np.ndarray:
    """Inverse of np_ut_to_base243_stream (include/ternary_packing.hpp:42-50)."""
    if len(buf) < 4:
        raise ValueError("base243 stream too short")
    total = int(np.frombuffer(buf[:4], dtype=np.uint32)[0])
    data = np.frombuffer(buf[4:], dtype=np.uint8)
    out = np_base243_to_trits(data, total)
    if out.size != total:
        raise ValueError("base243 stream truncated")
    return out


# ---------------------------------------------------------------------------
# word9 <-> symbol bytes (9 bytes per word, each 0..26)
# ---------------------------------------------------------------------------

def words9_to_sym_bytes(words_syms: np.ndarray) -> np.ndarray:
    """(n_words, 9) GF27 symbols -> flat uint8 bytes
    (include/ternary_packing.hpp:53-58)."""
    return (np.asarray(words_syms, dtype=np.int64) % 27).astype(np.uint8).reshape(-1)


def sym_bytes_to_words9(b: np.ndarray) -> np.ndarray:
    b = np.asarray(b, dtype=np.uint8)
    if b.size % 9 != 0:
        raise ValueError("symbol byte stream length must be a multiple of 9")
    return (b.reshape(-1, 9) % 27).astype(np.int8)
