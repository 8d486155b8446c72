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
    """Offset sequence st_1..st_n as a device array.  a,b,s0 may be traced."""
    a = jnp.asarray(a, dtype=jnp.int32) % 3
    b = jnp.asarray(b, dtype=jnp.int32) % 3
    s0 = jnp.asarray(s0, dtype=jnp.int32) % 3
    t = jnp.arange(1, n + 1, dtype=jnp.int32)
    # a == 1
    st1 = (s0 + t * b) % 3
    # a == 2: a^t = 2 if t odd else 1
    apow = jnp.where(t % 2 == 1, 2, 1)
    st2 = (apow * s0 + b * (apow + 2)) % 3
    # a == 0: st = b for all t >= 1
    st0 = jnp.broadcast_to(b, t.shape)
    return jnp.where(a == 0, st0, jnp.where(a == 1, st1, st2)).astype(dtype)


def np_offsets(n: int, a: int, b: int, s0: int) -> np.ndarray:
    """Host oracle: literal serial recurrence."""
    st = s0 % 3
    out = np.empty(n, dtype=np.int64)
    for i in range(n):
        st = (a * st + b) % 3
        out[i] = st
    return out


def scramble(syms, a, b, s0):
    """Scramble a flat symbol stream: s_t += 13*st_t in digit space."""
    syms = jnp.asarray(syms)
    off = offsets(syms.shape[-1], a, b, s0, dtype=jnp.int8)
    s = syms.astype(jnp.int8)
    d0 = (s % 3 + off) % 3
    d1 = ((s // 3) % 3 + off) % 3
    d2 = ((s // 9) % 3 + off) % 3
    return (d0 + 3 * d1 + 9 * d2).astype(jnp.int8)


def descramble(syms, a, b, s0):
    syms = jnp.asarray(syms)
    off = offsets(syms.shape[-1], a, b, s0, dtype=jnp.int8)
    s = syms.astype(jnp.int8)
    d0 = (s % 3 - off) % 3
    d1 = ((s // 3) % 3 - off) % 3
    d2 = ((s // 9) % 3 - off) % 3
    return (d0 + 3 * d1 + 9 * d2).astype(jnp.int8)


def scramble_masked(syms, a, b, s0, keep_mask):
    """Scramble only where keep_mask is True; state STILL advances on every
    symbol (so the decoder's uniform row-major descramble stays aligned --
    matches the reference decoder's whole-body descramble,
    old/include/ternary_image_codec_v6_min.hpp:938-947)."""
    out = scramble(syms, a, b, s0)
    return jnp.where(keep_mask, out, jnp.asarray(syms).astype(jnp.int8))
