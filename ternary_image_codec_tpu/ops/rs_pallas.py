"""Fused Pallas RS(26,k) decoder: one HBM pass per block batch.

The XLA decode (ops/rs.py) is correct and fast per-op, but it spans ~50
fusions, each a full HBM round trip over the block batch.  This kernel runs
the whole chain -- syndromes, inversionless Berlekamp-Massey, Chien, Forney,
and the corrected-word syndrome recheck -- on a VMEM tile of blocks, so the
batch streams through HBM exactly once (read 78 trits + write 3k trits + 1
flag per block).

Design notes:
* BLOCKS LIVE ON THE LANE AXIS: every tensor in the kernel is (rows, T)
  with T = the block tile, so each digit-plane op uses full 128-lane VPU
  rows.  (A first draft with blocks on sublanes ran 25x slower: the BM
  recursion state became (T, 1) single-lane ops.)
* Digit planes are contiguous ROW slices of PLANE-MAJOR layouts (all 26
  digit-0 rows, then digit-1, then digit-2); the constant GF(3) matrices
  are row/column permuted on the host so no strided access or 3D reshape
  ever happens in the kernel (Mosaic-safe).
* All arithmetic is float32: tiny integers are f32-exact, and float
  multiply/floor is the VPU fast path (integer mod/div measured ~60x
  slower).  Matmuls ride the MXU with f32 accumulation.
* The field inverse uses the Fermat chain a^25 -- in VMEM the extra
  multiplies are free compared to any table/gather scheme.

ops/rs.decode_dig (pure XLA) remains the oracle; tests cross-check the two.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import rs as rs_xla

N = 26
_TILE = 2048  # blocks per kernel instance (lane axis; multiple of 128)


def _fmod3(x):
    return x - 3.0 * jnp.floor(x * (1.0 / 3.0))


def _row_perm(n_sym: int) -> np.ndarray:
    """plane-major index p*n+i  <-  interleaved index 3i+p."""
    out = np.empty(3 * n_sym, dtype=np.int64)
    for p in range(3):
        for i in range(n_sym):
            out[p * n_sym + i] = 3 * i + p
    return out


@functools.cache
def _consts(k: int):
    M = rs_xla._matrices(k)
    r, smax = M["r"], M["smax"]
    rp78 = _row_perm(N)
    S3 = np.asarray(M["S3"], dtype=np.float32)       # (78, 3r) interleaved
    CH3 = np.asarray(M["CH3"], dtype=np.float32)     # (3smax, 78)
    OM3 = np.asarray(M["OM3"], dtype=np.float32)     # (3r, 78)
    SP3 = np.asarray(M["SP3"], dtype=np.float32)     # (3smax, 78)
    # kernel computes OUT = C @ X with X (rows=digits, lanes=blocks):
    # permute to plane-major on both sides and pre-transpose.
    return {
        "r": r, "smax": smax,
        "S3T": S3[rp78][:, _row_perm(r)].T,          # (3r pm, 78 pm)
        "CH3T": CH3[_row_perm(smax)][:, rp78].T,     # (78 pm, 3smax pm)
        "OM3T": OM3[_row_perm(r)][:, rp78].T,        # (78 pm, 3r pm)
        "SP3T": SP3[_row_perm(smax)][:, rp78].T,     # (78 pm, 3smax pm)
    }


def _m3(a, b):
    """GF27 product of digit-plane triples (tuples of (rows, T) arrays)."""
    a0, a1, a2 = a
    b0, b1, b2 = b
    r0 = a0 * b0
    r1 = a0 * b1 + a1 * b0
    r2 = a0 * b2 + a1 * b1 + a2 * b0
    r3 = a1 * b2 + a2 * b1
    r4 = a2 * b2
    return (_fmod3(r0 + 2.0 * r3), _fmod3(r1 + r3 + 2.0 * r4),
            _fmod3(r2 + r4))


def _inv27(d):
    """a^-1 = a^25 (Fermat); digit-plane triple in/out; inv(0) = 0."""
    a2 = _m3(d, d)
    a4 = _m3(a2, a2)
    a8 = _m3(a4, a4)
    a16 = _m3(a8, a8)
    return _m3(_m3(a16, a8), d)


def _kernel(k: int, recv_ref, s3t_ref, ch3t_ref, om3t_ref, sp3t_ref,
            out_ref, ok_ref):
    c = _consts(k)
    r, smax = c["r"], c["smax"]
    t_cap = float(r // 2)
    x = recv_ref[:].astype(jnp.float32)               # (78 pm, T)
    T = x.shape[1]
    x_pl = (x[:N], x[N:2 * N], x[2 * N:])             # digit planes (26, T)

    # ---- syndromes: (3r, 78) @ (78, T), mod 3 (all plane-major)
    S = _fmod3(jnp.dot(s3t_ref[:], x, preferred_element_type=jnp.float32))
    synd_zero = jnp.sum(S, axis=0, keepdims=True) == 0.0   # (1, T)
    Sd = [(S[n:n + 1], S[r + n:r + n + 1], S[2 * r + n:2 * r + n + 1])
          for n in range(r)]                               # (1, T) planes

    # ---- inversionless Berlekamp-Massey on (1, T) digit planes
    zero = jnp.zeros((1, T), dtype=jnp.float32)
    one = jnp.ones((1, T), dtype=jnp.float32)
    sigma = [(one, zero, zero)] + [(zero, zero, zero)] * (smax - 1)
    Bp = list(sigma)
    bdig = (one, zero, zero)
    L = zero
    m = one

    for n in range(r):
        terms = [_m3(sigma[i], Sd[n - i])
                 for i in range(0, min(n, smax - 1) + 1)]
        d = tuple(_fmod3(sum(t[j] for t in terms)) for j in range(3))
        dz = (d[0] + d[1] + d[2]) == 0.0
        shifted = [(zero, zero, zero)] * smax
        for j in range(1, smax):
            shifted[j] = Bp[j - 1]
        for kk in range(2, n + 2):
            is_k = m == kk
            shifted = [tuple(jnp.where(is_k, (Bp[j - kk][p] if j >= kk
                                              else zero), shifted[j][p])
                             for p in range(3)) for j in range(smax)]
        upd = [tuple(_fmod3(u - v + 3.0) for u, v in
                     zip(_m3(bdig, sigma[j]), _m3(d, shifted[j])))
               for j in range(smax)]
        sigma_new = [tuple(jnp.where(dz, sigma[j][p], upd[j][p])
                           for p in range(3)) for j in range(smax)]
        grow = (~dz) & (2.0 * L <= n)
        Bp = [tuple(jnp.where(grow, sigma[j][p], Bp[j][p]) for p in range(3))
              for j in range(smax)]
        bdig = tuple(jnp.where(grow, d[p], bdig[p]) for p in range(3))
        L = jnp.where(grow, n + 1 - L, L)
        m = jnp.where(grow, 1.0, m + 1.0)
        sigma = sigma_new

    # plane-major sigma rows: [digit-0 coeffs | digit-1 | digit-2]
    sig_flat = jnp.concatenate(
        [jnp.concatenate([sigma[j][p] for j in range(smax)], axis=0)
         for p in range(3)], axis=0)                  # (3smax, T)

    # ---- Chien: (78, 3smax) @ (3smax, T) -> plane-major rows
    ev = _fmod3(jnp.dot(ch3t_ref[:], sig_flat,
                        preferred_element_type=jnp.float32))
    root = (ev[:N] + ev[N:2 * N] + ev[2 * N:]) == 0.0  # (26, T)
    rootf = root.astype(jnp.float32)
    nroots = jnp.sum(rootf, axis=0, keepdims=True)     # (1, T)

    # ---- Omega = S * sigma mod x^r (plane-major rows (3r, T))
    om = [[None] * r for _ in range(3)]
    for j in range(r):
        i0 = max(0, j - smax + 1)
        acc = [zero, zero, zero]
        for i in range(i0, j + 1):
            prod = _m3(Sd[i], sigma[j - i])
            for p in range(3):
                acc[p] = acc[p] + prod[p]
        for p in range(3):
            om[p][j] = _fmod3(acc[p])
    Om = jnp.concatenate([jnp.concatenate(om[p], axis=0)
                          for p in range(3)], axis=0)  # (3r, T)

    num = _fmod3(jnp.dot(om3t_ref[:], Om, preferred_element_type=jnp.float32))
    den = _fmod3(jnp.dot(sp3t_ref[:], sig_flat,
                         preferred_element_type=jnp.float32))
    num_pl = (num[:N], num[N:2 * N], num[2 * N:])
    den_pl = (den[:N], den[N:2 * N], den[2 * N:])

    # corr = -Y = num * inv(den); corrected = recv + corr at root positions
    corr = _m3(num_pl, _inv27(den_pl))
    fixed = tuple(_fmod3(x_pl[p] + rootf * corr[p]) for p in range(3))

    # ---- recheck syndromes of the corrected word
    fixed_flat = jnp.concatenate(fixed, axis=0)        # (78 pm, T)
    S2 = _fmod3(jnp.dot(s3t_ref[:], fixed_flat,
                        preferred_element_type=jnp.float32))
    ok = ((jnp.sum(S2, axis=0, keepdims=True) == 0.0)
          & (nroots <= t_cap) & (nroots == L))
    ok = ok | synd_zero

    final = tuple(jnp.where(synd_zero, x_pl[p], fixed[p]) for p in range(3))
    out_ref[:] = jnp.concatenate([f[:k] for f in final],
                                 axis=0).astype(jnp.int8)
    ok_ref[:] = ok


@functools.partial(jax.jit, static_argnums=(1,))
def decode_dig_fused(recv_dig, k: int):
    """Pallas-fused decode: (B, 26, 3) digits -> ((B, k, 3) digits, ok (B,)).

    B is padded to a multiple of the block tile; pad lanes decode the zero
    codeword (valid) and are sliced off.
    """
    c = _consts(k)
    B = recv_dig.shape[0]
    nb = -(-B // _TILE)
    pad = nb * _TILE - B
    # interleaved (B, 26, 3) -> plane-major digits on rows, blocks on lanes
    x = (jnp.asarray(recv_dig).astype(jnp.int8)
         .transpose(2, 1, 0).reshape(3 * N, B))
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((3 * N, pad), dtype=jnp.int8)], axis=1)

    kern = functools.partial(_kernel, k)
    out, ok = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((3 * k, nb * _TILE), jnp.int8),
                   jax.ShapeDtypeStruct((1, nb * _TILE), jnp.bool_)),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((3 * N, _TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * c["r"], 3 * N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * N, 3 * c["smax"]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * N, 3 * c["r"]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * N, 3 * c["smax"]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((3 * k, _TILE), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, _TILE), lambda i: (0, i),
                                memory_space=pltpu.VMEM)),
    )(x, jnp.asarray(c["S3T"]), jnp.asarray(c["CH3T"]),
      jnp.asarray(c["OM3T"]), jnp.asarray(c["SP3T"]))

    # plane-major (3k, B) -> (B, k, 3)
    out = out[:, :B].reshape(3, k, B).transpose(2, 1, 0)
    return out, ok[0, :B]
