"""Additive mod-3 scrambler with closed-form offset sequence.

Reference semantics (old/include/ternary_image_codec_v6_min.hpp:77-94):
state advances once per symbol, st <- (a*st + b) mod 3 (advance happens
*before* use), and the offset st is added to each of the 3 trits of the
symbol.  Adding the same offset o to all trits of symbol s is
s -> s + o*(1+3+9) = s + 13*o in digit space.

The serial recurrence is eliminated with the closed form over GF(3)
(SURVEY.md section 7 "hard parts" #3): with a, b, s0 in {0,1,2},

  a == 0:  st_t = b                       (t >= 1)
  a == 1:  st_t = s0 + t*b
  a == 2:  a^t alternates 1,2 (a^2=1):  st_t = a^t*s0 + b*(a^t - 1)/(a - 1)
           and (a-1) == 1 mod 3, so   st_t = a^t*s0 + b*(a^t + 2)

giving the entire offset sequence as one vectorized expression -- no scan.
Sequence starts at t=1 (first symbol uses the advanced state).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def offsets(n, a, b, s0, dtype=jnp.int8):
    """Offset sequence st_1..st_n as a device array.  a,b,s0 may be traced.

    The affine mod-3 recurrence is periodic with period <= 6 (lcm of the
    a==1 period 3 and a==2 period 2), so the whole sequence is one tiled
    6-element pattern -- no arithmetic over a length-n iota at all (integer
    mod over a large iota was a measured VPU pathology).
    """
    from ..ops.gf27 import fmod3
    a = jnp.asarray(a, dtype=jnp.float32)
    b = jnp.asarray(b, dtype=jnp.float32)
    s0 = jnp.asarray(s0, dtype=jnp.float32)
    a, b, s0 = fmod3(a), fmod3(b), fmod3(s0)
    t = jnp.arange(1, 7, dtype=jnp.float32)          # one period
    st1 = fmod3(s0 + t * b)                          # a == 1
    tm2 = t - 2.0 * jnp.floor(t * 0.5)               # t mod 2
    apow = jnp.where(tm2 == 1.0, 2.0, 1.0)           # a^t for a == 2
    st2 = fmod3(apow * s0 + b * (apow + 2))          # a == 2
    st0 = jnp.broadcast_to(b, t.shape)               # a == 0
    pat = jnp.where(a == 0, st0,
                    jnp.where(a == 1, st1, st2)).astype(dtype)
    reps = -(-n // 6)
    return jnp.tile(pat, reps)[:n]


def np_offsets(n: int, a: int, b: int, s0: int) -> np.ndarray:
    """Host oracle: literal serial recurrence."""
    st = s0 % 3
    out = np.empty(n, dtype=np.int64)
    for i in range(n):
        st = (a * st + b) % 3
        out[i] = st
    return out


def _apply(syms, a, b, s0, sign: float):
    """Add/subtract the offset to each trit digit, all in float32 (integer
    mod/div are ~60x slower on the VPU; values <= 26 are f32-exact)."""
    from ..ops.gf27 import fmod3
    syms = jnp.asarray(syms)
    off = offsets(syms.shape[-1], a, b, s0, dtype=jnp.float32) * sign
    s = syms.astype(jnp.float32)
    q1 = jnp.floor(s * (1.0 / 3.0))
    q2 = jnp.floor(s * (1.0 / 9.0))
    d0 = fmod3((s - 3.0 * q1) + off + 3.0)
    d1 = fmod3((q1 - 3.0 * q2) + off + 3.0)
    d2 = fmod3(fmod3(q2) + off + 3.0)
    return (d0 + 3.0 * d1 + 9.0 * d2).astype(jnp.int8)


def scramble(syms, a, b, s0):
    """Scramble a flat symbol stream: s_t += 13*st_t in digit space."""
    return _apply(syms, a, b, s0, 1.0)


def descramble(syms, a, b, s0):
    return _apply(syms, a, b, s0, -1.0)


def scramble_dig(digits, a, b, s0, sign: float = 1.0, keep_mask=None):
    """Digit-native (de)scramble: digits (n, 3) trit planes; the offset adds
    to every digit of symbol t.  One fused f32 pass — the digit planes never
    get packed/unpacked here (pipeline works digit-native end to end)."""
    from ..ops.gf27 import fmod3
    d = jnp.asarray(digits).astype(jnp.float32)
    off = offsets(d.shape[0], a, b, s0, dtype=jnp.float32) * sign
    out = fmod3(d + off[:, None] + 3.0).astype(jnp.int8)
    if keep_mask is not None:
        out = jnp.where(keep_mask[:, None], out, jnp.asarray(digits).astype(jnp.int8))
    return out


def scramble_masked(syms, a, b, s0, keep_mask):
    """Scramble only where keep_mask is True; state STILL advances on every
    symbol (so the decoder's uniform row-major descramble stays aligned --
    matches the reference decoder's whole-body descramble,
    old/include/ternary_image_codec_v6_min.hpp:938-947)."""
    out = scramble(syms, a, b, s0)
    return jnp.where(keep_mask, out, jnp.asarray(syms).astype(jnp.int8))
