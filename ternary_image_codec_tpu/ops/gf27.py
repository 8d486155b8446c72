"""GF(27) arithmetic, TPU-first.

Two complementary representations:

1. *Digit arithmetic* (the TPU workhorse): every GF(27) element a is its
   3 base-3 digits (a0,a1,a2) with a = a0 + a1*x + a2*x^2 over GF(3),
   reduced mod p(x) = x^3 + 2x + 1.  Addition is digit-wise mod-3 add;
   multiplication of two *variables* is a short bilinear form (9 products,
   a few adds) -- pure VPU elementwise arithmetic, no gathers, no tables.

2. *GF(3)-linear maps* (the MXU workhorse): multiplication by a fixed
   constant c is linear over GF(3).  Any fixed GF27 matrix operation
   (RS generator-matrix encode, syndrome computation, Chien evaluation)
   therefore becomes ONE integer matmul over trit-digit vectors followed
   by mod 3 -- ideal for the TPU MXU.

Host-side `np_*` functions provide an exact numpy oracle used both for
precomputation (tables, matrices) and for differential testing.

Reference parity (semantics, not implementation):
  - field ops / reduction: old/include/ternary_image_codec_v6_min.hpp:382-413
  - tables/primitive:      old/include/ternary_image_codec_v6_min.hpp:414-487
    (primitive element alpha = 3, i.e. the polynomial "x"; verified order 26)
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax.numpy as jnp
from jax import lax

# ---------------------------------------------------------------------------
# numpy oracle
# ---------------------------------------------------------------------------


def np_sym_to_dig(a):
    a = np.asarray(a, dtype=np.int64)
    return np.stack([a % 3, (a // 3) % 3, (a // 9) % 3], axis=-1)


def np_dig_to_sym(d):
    d = np.asarray(d, dtype=np.int64)
    return d[..., 0] + 3 * d[..., 1] + 9 * d[..., 2]


def np_gf_add(a, b):
    da, db = np_sym_to_dig(a), np_sym_to_dig(b)
    return np_dig_to_sym((da + db) % 3)


def np_gf_sub(a, b):
    da, db = np_sym_to_dig(a), np_sym_to_dig(b)
    return np_dig_to_sym((da - db) % 3)


def np_gf_neg(a):
    return np_gf_sub(0, a)


def np_gf_mul(a, b):
    """Polynomial product mod x^3+2x+1 (old/...v6_min.hpp:402-413).

    Reduction: x^3 = -2x - 1 = x + 2 (mod 3), x^4 = x^2 + 2x.
    """
    a0, a1, a2 = np.moveaxis(np_sym_to_dig(a), -1, 0)
    b0, b1, b2 = np.moveaxis(np_sym_to_dig(b), -1, 0)
    r0 = a0 * b0
    r1 = a0 * b1 + a1 * b0
    r2 = a0 * b2 + a1 * b1 + a2 * b0
    r3 = a1 * b2 + a2 * b1
    r4 = a2 * b2
    c0 = (r0 + 2 * r3) % 3
    c1 = (r1 + r3 + 2 * r4) % 3
    c2 = (r2 + r4) % 3
    return c0 + 3 * c1 + 9 * c2


@functools.cache
def tables():
    """exp/log/mul/inv tables (semantics of old/...v6_min.hpp:414-487)."""
    # primitive search: smallest element of multiplicative order 26
    prim = 0
    for c in range(2, 27):
        x, order = 1, 0
        for i in range(1, 27):
            x = int(np_gf_mul(x, c))
            if x == 1:
                order = i
                break
        if order == 26:
            prim = c
            break
    assert prim == 3, "expected primitive element x (==3)"
    exp = np.zeros(26, dtype=np.int64)
    log = np.full(27, -1, dtype=np.int64)
    exp[0], log[1] = 1, 0
    for i in range(1, 26):
        exp[i] = int(np_gf_mul(exp[i - 1], prim))
        log[exp[i]] = i
    a = np.arange(27)
    mul = np_gf_mul(a[:, None], a[None, :])
    inv = np.zeros(27, dtype=np.int64)
    inv[1:] = exp[(26 - log[1:]) % 26]
    return {"prim": prim, "exp": exp, "log": log, "mul": mul, "inv": inv}


def np_alpha_pow(e) -> np.ndarray:
    """alpha^e for any integer exponent (alpha = primitive = 3)."""
    t = tables()
    return t["exp"][np.mod(e, 26)]


def np_gf_inv(a):
    return tables()["inv"][np.asarray(a, dtype=np.int64)]


# --- GF(27) polynomial helpers (host precompute only) ----------------------


def np_poly_mul(p, q):
    """Product of GF27 coefficient vectors (ascending degree)."""
    p, q = np.asarray(p, dtype=np.int64), np.asarray(q, dtype=np.int64)
    out = np.zeros(len(p) + len(q) - 1, dtype=np.int64)
    for i, pi in enumerate(p):
        if pi:
            out[i:i + len(q)] = np_gf_add(out[i:i + len(q)], np_gf_mul(pi, q))
    return out


def np_poly_mod(p, g):
    """p mod g over GF(27) (ascending degree, g monic)."""
    p = np.asarray(p, dtype=np.int64).copy()
    g = np.asarray(g, dtype=np.int64)
    dg = len(g) - 1
    assert g[-1] == 1, "g must be monic"
    if len(p) < dg:
        p = np.concatenate([p, np.zeros(dg - len(p), dtype=np.int64)])
    for i in range(len(p) - 1, dg - 1, -1):
        c = p[i]
        if c:
            p[i - dg:i + 1] = np_gf_sub(p[i - dg:i + 1], np_gf_mul(c, g))
    return p[:dg]


def np_poly_eval(p, x):
    """Horner evaluation of GF27 poly (ascending degree) at scalar x."""
    acc = 0
    for c in reversed(np.asarray(p, dtype=np.int64)):
        acc = np_gf_add(np_gf_mul(acc, x), c)
    return int(acc)


def np_gf_solve(A, b):
    """Solve A z = b over GF(27) by Gaussian elimination (small systems)."""
    A = np.asarray(A, dtype=np.int64).copy()
    b = np.asarray(b, dtype=np.int64).copy()
    n = A.shape[0]
    for col in range(n):
        piv = next(r for r in range(col, n) if A[r, col] != 0)
        if piv != col:
            A[[col, piv]] = A[[piv, col]]
            b[[col, piv]] = b[[piv, col]]
        ip = np_gf_inv(A[col, col])
        A[col] = np_gf_mul(A[col], ip)
        b[col] = np_gf_mul(b[col], ip)
        for r in range(n):
            if r != col and A[r, col] != 0:
                f = A[r, col]
                A[r] = np_gf_sub(A[r], np_gf_mul(f, A[col]))
                b[r] = np_gf_sub(b[r], np_gf_mul(f, b[col]))
    return b


# ---------------------------------------------------------------------------
# GF(3)-linear map construction (constant-multiplication is GF(3)-linear)
# ---------------------------------------------------------------------------


def const_mul_matrix(c: int) -> np.ndarray:
    """3x3 GF(3) matrix M with dig(c*a) = M @ dig(a) mod 3."""
    cols = [np_sym_to_dig(np_gf_mul(c, b)) for b in (1, 3, 9)]  # c*1, c*x, c*x^2
    return np.stack(cols, axis=-1) % 3  # (3 rows, 3 cols)


def gf3_linmap(C: np.ndarray) -> np.ndarray:
    """Lift a GF27 constant matrix C (n_in, n_out) to a GF(3) digit matrix.

    Given symbols s (n_in,), the map out_j = sum_i s_i * C[i, j] becomes
      out_digits = in_digits @ M  (mod 3)
    with in_digits (3*n_in,), out_digits (3*n_out,), digits flattened
    little-endian per symbol (digit index fastest).
    """
    C = np.asarray(C, dtype=np.int64)
    n_in, n_out = C.shape
    M = np.zeros((3 * n_in, 3 * n_out), dtype=np.int8)
    for i in range(n_in):
        for j in range(n_out):
            c = int(C[i, j])
            if c:
                # dig_out[s] += Mc[s, t] * dig_in[t]
                Mc = const_mul_matrix(c)  # (3,3): rows=out digit, cols=in digit
                M[3 * i:3 * i + 3, 3 * j:3 * j + 3] = Mc.T  # (in digit t, out digit s)
    return M


# ---------------------------------------------------------------------------
# JAX digit arithmetic (device ops)
# ---------------------------------------------------------------------------


# --- float trit arithmetic -------------------------------------------------
# Integer `%`/`//` lower to real division sequences on the TPU VPU and run
# ~60x slower than float multiply+floor (measured: 14.5 s vs 0.23 s for a
# 3-digit extraction over 200M elements).  All hot mod-3 math therefore goes
# through float32 reciprocal-multiplies, which are EXACT here: for
# 0 <= x <= ~3e5, |x*fl(1/3) - x/3| << 1/3, so floor() lands correctly.


def ffloordiv(x, d: int):
    """floor(x / d) for float32 x >= 0, exact for x <= ~3e5 * d / 3."""
    return jnp.floor(x * jnp.float32(1.0 / d))


def fmod3(x):
    """x mod 3 for float32 x >= 0 (exact for x <= ~3e5)."""
    return x - 3.0 * jnp.floor(x * jnp.float32(1.0 / 3.0))


def sym_to_dig(a, dtype=jnp.int8):
    """Digits are {0,1,2}: int8 keeps the big digit tensors 4x smaller in
    HBM (an 8K frame's decode digit planes are GBs in int32)."""
    x = jnp.asarray(a).astype(jnp.float32)
    q1 = ffloordiv(x, 3)
    q2 = ffloordiv(x, 9)
    return jnp.stack([x - 3.0 * q1, q1 - 3.0 * q2, fmod3(q2)],
                     axis=-1).astype(dtype)


def dig_to_sym(d):
    d = jnp.asarray(d).astype(jnp.int32)
    return d[..., 0] + 3 * d[..., 1] + 9 * d[..., 2]


def _m3i(x):
    """mod 3 of a small signed integer array via the float path, keeping the
    input's integer dtype."""
    return fmod3(x.astype(jnp.float32)).astype(x.dtype)


def add_dig(da, db):
    return _m3i(da + db)


def sub_dig(da, db):
    return _m3i(da - db)


def neg_dig(d):
    return _m3i(-d)


def mul_dig(da, db):
    """Variable x variable GF(27) product in digit form; pure VPU arithmetic."""
    a0, a1, a2 = da[..., 0], da[..., 1], da[..., 2]
    b0, b1, b2 = db[..., 0], db[..., 1], db[..., 2]
    r0 = a0 * b0
    r1 = a0 * b1 + a1 * b0
    r2 = a0 * b2 + a1 * b1 + a2 * b0
    r3 = a1 * b2 + a2 * b1
    r4 = a2 * b2
    c0 = _m3i(r0 + 2 * r3)
    c1 = _m3i(r1 + r3 + 2 * r4)
    c2 = _m3i(r2 + r4)
    return jnp.stack([c0, c1, c2], axis=-1)


def scale_dig(d, s):
    """Multiply by a GF(3) scalar s in {0,1,2} (digit-wise scale mod 3)."""
    return _m3i(d * s)


def inv_dig(d):
    """a^-1 = a^25 via square-and-multiply (25 = 16+8+1); inv(0) = 0."""
    a2 = mul_dig(d, d)
    a4 = mul_dig(a2, a2)
    a8 = mul_dig(a4, a4)
    a16 = mul_dig(a8, a8)
    return mul_dig(mul_dig(a16, a8), d)


@functools.cache
def _inv_dig_table() -> np.ndarray:
    """(27, 3) int8: digits of a^-1 for every symbol a (inv(0) = 0)."""
    return np_sym_to_dig(tables()["inv"]).astype(np.int8)


def inv_dig_onehot(d):
    """Field inverse via one-hot x (27,3) table matmul.

    Gather-free and far cheaper than the Fermat chain for large batches:
    the 27 equality comparisons fuse, and the contraction rides the MXU.
    """
    sym = dig_to_sym(d).astype(jnp.int8)                    # (...,)
    onehot = (sym[..., None] == jnp.arange(27, dtype=jnp.int8)).astype(jnp.int8)
    return jnp.matmul(onehot, jnp.asarray(_inv_dig_table()),
                      preferred_element_type=jnp.int32).astype(jnp.int8)


def is_zero_dig(d):
    return jnp.sum(d, axis=-1) == 0


# ---------------------------------------------------------------------------
# Plane-major ("pm") layouts
# ---------------------------------------------------------------------------
# TPU int8 arrays are stored in (32, 128)-padded tiles over their two minor
# dims.  The original (..., n_sym, 3) digit layout pads 3 -> 128 lanes: a
# measured ~16x slowdown for the same logical bytes (tools/hbm_probe.py
# --layouts).  Plane-major layouts put the DIGIT axis first and a large axis
# minor: blocks are (3, 26, B), grids are (27, H).  The helpers below build
# the GF(3)-linear map tensors for lax.dot_general contractions that consume
# those layouts directly (no transposes between stages).


def gf3_linmap_pm(C: np.ndarray) -> np.ndarray:
    """Lift GF27 matrix C (n_in, n_out) to M2 (3*n_out, 3, n_in) with
    out[d_out*n_out + c_out, b] = sum_{d_in,c_in} M2[o, d_in, c_in] *
    x[d_in, c_in, b]  (mod 3) for plane-major x (3, n_in, B):

        out = lax.dot_general(M2, x, (((1, 2), (0, 1)), ((), ())))

    giving (3*n_out, B) whose rows reshape to (3, n_out, B)."""
    M = gf3_linmap(C)                       # (3n_in, 3n_out) cm convention
    n_in, n_out = np.asarray(C).shape
    A = M.T.reshape(n_out, 3, n_in, 3)      # [c_out, d_out, c_in, d_in]
    return np.ascontiguousarray(
        A.transpose(1, 0, 3, 2).reshape(3 * n_out, 3, n_in)).astype(np.int8)


def mod3_dot_pm(M2, x, out_dtype=jnp.int8):
    """Plane-major GF(3) linear map: M2 (3m, 3, n) . x (3, n, B) -> (3m, B).

    One MXU contraction over the 3n digit coordinates; mod-3 via the float
    path (sums bounded well inside f32-exact range)."""
    y = lax.dot_general(jnp.asarray(M2, dtype=jnp.int8), x.astype(jnp.int8),
                        (((1, 2), (0, 1)), ((), ())),
                        preferred_element_type=jnp.int32)
    return fmod3(y.astype(jnp.float32)).astype(out_dtype)


def mul_pm(a, b):
    """GF(27) product, digit axis 0 (plane-major); shapes broadcast."""
    a0, a1, a2 = a[0], a[1], a[2]
    b0, b1, b2 = b[0], b[1], b[2]
    r0 = a0 * b0
    r1 = a0 * b1 + a1 * b0
    r2 = a0 * b2 + a1 * b1 + a2 * b0
    r3 = a1 * b2 + a2 * b1
    r4 = a2 * b2
    return jnp.stack([_m3i(r0 + 2 * r3), _m3i(r1 + r3 + 2 * r4),
                      _m3i(r2 + r4)], axis=0)


def inv_pm(d):
    """Field inverse for plane-major digits (3, ...); inv(0) = 0.

    One-hot + (3, 27) table contraction (gather-free, rides the MXU)."""
    sym = (d[0] + 3 * d[1] + 9 * d[2]).astype(jnp.int8)      # (...,)
    onehot = (sym[None] == jnp.arange(27, dtype=jnp.int8)
              .reshape(27, *([1] * sym.ndim))).astype(jnp.int8)  # (27, ...)
    tab = jnp.asarray(_inv_dig_table().T, dtype=jnp.int8)    # (3, 27)
    y = lax.dot_general(tab, onehot, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    return y.astype(jnp.int8)                                 # (3, ...)


def mod3_matmul(x, M, out_dtype=jnp.int8):
    """x (..., n) int trits @ M (n, m) trits, mod 3.

    int8 x int8 -> int32-accumulating matmul: the MXU's native integer mode,
    and the operands stay 1 byte/element in HBM.  The final mod goes through
    float (integer remainder is pathologically slow on the VPU); sums are
    <= 2*2*n << 2^23, so the float path is exact.

    The optimization_barrier on x is load-bearing: without it XLA fuses the
    producer chain (digit unpack / descramble / band slicing) into the dot's
    operand generation and re-materializes it per MXU tile -- measured +130
    ms per 8K frame on the streamed decode syndromes alone.  The barrier
    forces the operand to be written once, and the dot reads it back at
    full HBM bandwidth.
    """
    x = x.astype(jnp.int8)
    if not os.environ.get("T3_NO_BARRIER"):
        x = lax.optimization_barrier(x)
    y = jnp.matmul(x, jnp.asarray(M, dtype=jnp.int8),
                   preferred_element_type=jnp.int32)
    return fmod3(y.astype(jnp.float32)).astype(out_dtype)
