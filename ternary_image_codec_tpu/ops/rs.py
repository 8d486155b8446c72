"""RS(26,k) over GF(27), TPU-native.

Design (see SURVEY.md section 2.1 C3): because multiplication by *fixed*
field constants is GF(3)-linear, every fixed-matrix stage of the codec is
one integer matmul over trit digits, mod 3 -- which XLA tiles onto the MXU:

  encode:     codeword_digits = data_digits @ G3       (3k x 78)
  syndromes:  synd_digits     = recv_digits @ S3       (78 x 3r)
  Chien:      sigma(a^-i)     = sigma_digits @ CH3     (3(r+1) x 78), all i
  Forney:     Omega(a^-i), sigma'(a^-i) likewise

The only sequential part is Berlekamp-Massey: a fixed r-iteration
(r = 26-k <= 8) lax.fori_loop over small per-block state, batched over
all blocks at once with masked (branchless) updates.

Correctness contract: unlike the reference encoder -- which is broken
(mis-aligned synthetic division, old/include/ternary_image_codec_v6_min.hpp:
517-535; see SURVEY.md section 0) -- this implementation follows the
documented algebra (old/documentation.txt:126-146): systematic code with
data in positions 0..k-1, parity in k..25, codeword c(x) satisfying
c(alpha^j) = 0 for j = 1..r, alpha = x (= 3).  Valid codewords have
all-zero syndromes under the reference decoder's syndrome definition
(old/include/ternary_image_codec_v6_min.hpp:549-560).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from . import gf27
from .gf27 import (_m3i, add_dig, dig_to_sym, fmod3, inv_dig,
                   inv_dig_onehot, mod3_matmul, mul_dig,
                   np_alpha_pow, np_gf_mul, np_gf_neg, np_gf_solve,
                   np_poly_mod, sym_to_dig)

N = 26


@functools.cache
def generator_poly(k: int) -> np.ndarray:
    """g(x) = prod_{i=1..r} (x - alpha^i), ascending-degree GF27 coeffs."""
    r = N - k
    g = np.array([1], dtype=np.int64)
    for i in range(1, r + 1):
        root = int(np_alpha_pow(i))
        # multiply by (x - root) == (-root + x)
        g = gf27.np_poly_mul(g, np.array([np_gf_neg(root), 1], dtype=np.int64))
    return g


@functools.cache
def _matrices(k: int):
    """Precompute all GF(3) digit matrices for one profile (host, exact)."""
    r = N - k
    smax = r + 1  # sigma/B coefficient array length
    g = generator_poly(k)

    # --- systematic generator matrix G = [I_k | P] ---
    # Need parity p_i (r coeffs) with x^i + sum_m P[i,m] x^(k+m) = 0 mod g.
    # Columns Q_m = x^(k+m) mod g; solve Q @ P[i] = -R_i with R_i = x^i mod g.
    Q = np.zeros((r, r), dtype=np.int64)
    for m in range(r):
        e = np.zeros(k + m + 1, dtype=np.int64)
        e[-1] = 1
        Q[:, m] = np_poly_mod(e, g)
    P = np.zeros((k, r), dtype=np.int64)
    for i in range(k):
        e = np.zeros(i + 1, dtype=np.int64)
        e[-1] = 1
        Ri = np_poly_mod(e, g)
        P[i] = np_gf_solve(Q, np_gf_neg(Ri))
    G = np.zeros((k, N), dtype=np.int64)
    G[:, :k] = np.eye(k, dtype=np.int64)
    G[:, k:] = P
    # sanity: every row is a valid codeword (zero syndromes)
    for i in range(k):
        for j in range(1, r + 1):
            assert gf27.np_poly_eval(G[i], int(np_alpha_pow(j))) == 0

    # --- syndrome matrix: S_j = sum_i c_i alpha^((j+1) i) ---
    ii = np.arange(N)[:, None]
    jj = np.arange(r)[None, :]
    Csynd = np_alpha_pow((jj + 1) * ii)  # (26, r)

    # --- Chien: sigma(alpha^-i) = sum_d sigma_d alpha^(-i d) ---
    dd = np.arange(smax)[:, None]
    pos = np.arange(N)[None, :]
    Cchien = np_alpha_pow(-pos * dd)  # (smax, 26)

    # --- Omega eval at alpha^-i (Omega has r coeffs) ---
    do = np.arange(r)[:, None]
    Com = np_alpha_pow(-pos * do)  # (r, 26)

    # --- sigma' eval: sigma'(y) = sum_{d>=1} (d mod 3) sigma_d y^(d-1) ---
    Csp = np.zeros((smax, N), dtype=np.int64)
    for d in range(1, smax):
        s = d % 3
        if s:
            Csp[d] = np_gf_mul(s, np_alpha_pow(-pos[0] * (d - 1)))

    return {
        "r": r, "smax": smax, "g": g, "G": G,
        "G3": gf27.gf3_linmap(G),          # (3k, 78)
        "S3": gf27.gf3_linmap(Csynd),      # (78, 3r)
        "CH3": gf27.gf3_linmap(Cchien),    # (3 smax, 78)
        "OM3": gf27.gf3_linmap(Com),       # (3r, 78)
        "SP3": gf27.gf3_linmap(Csp),       # (3 smax, 78)
    }


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def encode_dig(data_dig, k: int):
    """Digit-native RS encode: (..., k, 3) trit digits -> (..., 26, 3).

    The pipeline works in digit planes end-to-end (symbols are only packed
    at the wire boundary), so no sym<->digit conversion happens here."""
    M = _matrices(k)
    d = jnp.asarray(data_dig)
    flat = d.reshape(*d.shape[:-2], 3 * k)
    cw = mod3_matmul(flat, M["G3"])            # (..., 78)
    return cw.reshape(*cw.shape[:-1], N, 3)


def encode(data, k: int):
    """RS-encode blocks. data (..., k) GF27 symbols -> (..., 26) codewords."""
    cw = encode_dig(sym_to_dig(data), k)
    return dig_to_sym(cw).astype(jnp.int8)


def np_encode(data: np.ndarray, k: int) -> np.ndarray:
    """Host oracle encode (exact same matrices)."""
    M = _matrices(k)
    d = gf27.np_sym_to_dig(data).reshape(*np.shape(data)[:-1], 3 * k)
    cw = (d @ M["G3"].astype(np.int64)) % 3
    return gf27.np_dig_to_sym(cw.reshape(*cw.shape[:-1], N, 3))


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def syndromes(recv, k: int):
    """(..., 26) received -> (..., r) syndrome symbols."""
    M = _matrices(k)
    d = sym_to_dig(recv)
    flat = d.reshape(*d.shape[:-2], 3 * N)
    s = mod3_matmul(flat, M["S3"])
    r = M["r"]
    return dig_to_sym(s.reshape(*s.shape[:-1], r, 3))


def _berlekamp_massey(S_dig, r: int, smax: int):
    """(B, r, 3) syndromes -> ((B, smax, 3) sigma, (B,) L); see _bm_core."""
    sigma, L = _bm_core(S_dig.astype(jnp.int8).transpose(1, 2, 0), r, smax)
    return sigma.transpose(2, 0, 1), L


def _bm_core(S3d, r: int, smax: int, r_vec=None):
    """Batched INVERSIONLESS BM (Burton variant), internal layout.

    S3d: (r, 3, B) syndrome digits -> (sigma (smax, 3, B), L (B,)); sigma is
    scaled by an arbitrary nonzero field constant per block.  The scale is
    harmless: Chien roots are invariant, and Forney's Y = -Omega(X)/sigma'(X)
    cancels it (Omega = S*sigma mod x^r and sigma' scale identically).

    r_vec (B,) int32 (optional): per-block iteration count for the MIXED-k
    chain (_correct_pm_mixed) -- iteration n is a no-op for blocks with
    n >= r_vec (their sigma/L freeze exactly as if their own shorter loop
    had ended; the caller zero-pads their syndromes above r_vec).  None
    (the per-k chains) compiles identically to the unmasked form.

    TPU-first choices (each was a measured multi-second pathology at frame
    batch sizes otherwise):
    * iterations (r <= 8) unrolled in Python -> all syndrome-window reads
      are static slices (no take_along_axis gathers);
    * B(x) is stored PRE-SHIFTED (Bx = x^m B): each iteration needs one
      static shift of one select's result -- not the O(r^2/2) chain of
      per-m shift candidates the lazy-m formulation pays (the round-1
      shape; ~50 fewer small ops per chain instance at r=8, and the m
      counter disappears);
    * NO field inversion inside the loop -- the classic d/b division is
      replaced by the inversionless update sigma <- b*sigma - d*(x^m B)
      (an inv chain inside the unrolled loop exploded the XLA graph).
    Branch decisions are branchless masked updates over the whole batch.

    Whole-polynomial digit layout (coeff, digit, B): the batch axis is the
    (last) lane axis, so the VPU sees full (8,128) tiles, and each
    polynomial-wide field op is ONE set of elementwise ops (the previous
    per-coefficient formulation compiled ~10x more HLO).
    """
    B_ = S3d.shape[-1]

    def m3(a, b):
        """GF(27) product, digit axis = -2; shapes broadcast on axis 0."""
        a0, a1, a2 = a[..., 0, :], a[..., 1, :], a[..., 2, :]
        b0, b1, b2 = b[..., 0, :], b[..., 1, :], b[..., 2, :]
        r0 = a0 * b0
        r1 = a0 * b1 + a1 * b0
        r2 = a0 * b2 + a1 * b1 + a2 * b0
        r3 = a1 * b2 + a2 * b1
        r4 = a2 * b2
        return jnp.stack([_m3i(r0 + 2 * r3), _m3i(r1 + r3 + 2 * r4),
                          _m3i(r2 + r4)], axis=-2)

    sigma = jnp.zeros((smax, 3, B_), dtype=jnp.int8).at[0, 0].set(1)
    # Bx = x^m * B(x), kept pre-shifted: initially B = 1, m = 1 -> Bx = x
    Bx = jnp.zeros((smax, 3, B_), dtype=jnp.int8).at[1, 0].set(1)
    bdig = jnp.zeros((1, 3, B_), dtype=jnp.int8).at[0, 0].set(1)
    L = jnp.zeros((B_,), dtype=jnp.int32)
    zrow = jnp.zeros((1, 3, B_), dtype=jnp.int8)

    for n in range(r):
        # discrepancy d = sum_{i=0..min(n,smax-1)} sigma_i * S_{n-i}
        # (sigma_0 is NOT 1 here -- sigma carries a per-block scale)
        cnt = min(n, smax - 1) + 1
        Swin = S3d[n::-1][:cnt]                            # S_n, S_{n-1}, ...
        terms = m3(sigma[:cnt], Swin)                      # (cnt, 3, B)
        d = fmod3(jnp.sum(terms, axis=0, dtype=jnp.int32)
                  .astype(jnp.float32)).astype(jnp.int8)[None]  # (1, 3, B)

        dz = jnp.sum(d[0], axis=0) == 0                    # (B,) bool
        if r_vec is not None:
            # mixed-k: blocks whose own r is exhausted treat every later
            # discrepancy as zero -- sigma, L (and effectively Bx/bdig,
            # never read again) freeze at their per-k values
            dz = dz | (n >= r_vec)
        # inversionless update: sigma <- b*sigma - d*(x^m B)
        upd = _m3i(m3(bdig, sigma) - m3(d, Bx))
        sigma_new = jnp.where(dz[None, None, :], sigma, upd)

        grow = ((~dz) & (2 * L <= n))[None, None, :]
        # next x^m B: grow -> x*sigma (m resets to 1); else -> x*Bx
        base = jnp.where(grow, sigma, Bx)
        Bx = jnp.concatenate([zrow, base[:smax - 1]], axis=0)
        bdig = jnp.where(grow, d, bdig)
        L = jnp.where(grow[0, 0], n + 1 - L, L)
        sigma = sigma_new

    return sigma, L                                        # (smax, 3, B)


def syndromes_dig(recv_dig, k: int):
    """(B, 26, 3) received digits -> (B, r, 3) syndrome digits (one matmul)."""
    M = _matrices(k)
    B_ = recv_dig.shape[0]
    return mod3_matmul(recv_dig.reshape(B_, 3 * N), M["S3"],
                       out_dtype=jnp.int8).reshape(B_, M["r"], 3)


def _correct_dig(recv_dig, S_dig, k: int):
    """BM + Chien + Forney correction chain given precomputed syndromes."""
    M = _matrices(k)
    r, smax = M["r"], M["smax"]
    t = r // 2
    B_ = recv_dig.shape[0]
    synd_zero = jnp.all(S_dig.reshape(B_, 3 * r) == 0, axis=-1)

    sigma, L = _berlekamp_massey(S_dig, r, smax)

    # Chien search over all 26 positions at once
    ev = mod3_matmul(sigma.reshape(B_, 3 * smax), M["CH3"],
                     out_dtype=jnp.int8).reshape(B_, N, 3)
    root = jnp.sum(ev, axis=-1) == 0                        # (B, 26)
    nroots = jnp.sum(root, axis=-1)

    # Omega = S(x) sigma(x) mod x^r  (variable x variable conv, r<=8 terms).
    # Computed in (coeff, digit, B) layout so each window product is a
    # full-lane (cnt, 3, B) op, then one stack + transpose back.
    S3d = S_dig.transpose(1, 2, 0)                          # (r, 3, B)
    sig3d = sigma.transpose(1, 2, 0)                        # (smax, 3, B)

    def _m3(a, b):
        a0, a1, a2 = a[..., 0, :], a[..., 1, :], a[..., 2, :]
        b0, b1, b2 = b[..., 0, :], b[..., 1, :], b[..., 2, :]
        r0 = a0 * b0
        r1 = a0 * b1 + a1 * b0
        r2 = a0 * b2 + a1 * b1 + a2 * b0
        r3 = a1 * b2 + a2 * b1
        r4 = a2 * b2
        return jnp.stack([_m3i(r0 + 2 * r3), _m3i(r1 + r3 + 2 * r4),
                          _m3i(r2 + r4)], axis=-2)

    om_rows = []
    for j in range(r):
        i0 = max(0, j - smax + 1)
        terms = _m3(S3d[i0:j + 1], sig3d[j - i0::-1][:j + 1 - i0])
        om_rows.append(fmod3(jnp.sum(terms, axis=0, dtype=jnp.int32)
                             .astype(jnp.float32)).astype(jnp.int8))
    Om = jnp.stack(om_rows, axis=0).transpose(2, 0, 1)      # (B, r, 3)

    num = mod3_matmul(Om.reshape(B_, 3 * r), M["OM3"],
                      out_dtype=jnp.int8).reshape(B_, N, 3)
    den = mod3_matmul(sigma.reshape(B_, 3 * smax), M["SP3"],
                      out_dtype=jnp.int8).reshape(B_, N, 3)
    # error value Y at root position: Y = -Omega(X)/sigma'(X); corrected = recv - Y
    Y = _m3i(-mul_dig(num, inv_dig_onehot(den)))
    corr = jnp.where(root[..., None], _m3i(-Y), 0)
    fixed_dig = _m3i(recv_dig + corr)                        # (B, 26, 3)

    # robust failure detection: recompute syndromes of the corrected word
    S2 = mod3_matmul(fixed_dig.reshape(B_, 3 * N), M["S3"], out_dtype=jnp.int8)
    ok = jnp.all(S2 == 0, axis=-1) & (nroots <= t) & (nroots == L)
    ok = ok | synd_zero

    fixed = jnp.where(synd_zero[:, None, None], recv_dig, fixed_dig)
    return fixed[:, :k], ok


def decode_dig(recv_dig, k: int):
    """Digit-native decode.

    recv_dig: (B, 26, 3) trit digits of the received codewords.
    Returns (data_dig (B, k, 3), ok (B,) bool).  `ok` is False when the
    error pattern is uncorrectable (instead of the reference's early
    `return false`, old/include/ternary_image_codec_v6_min.hpp:624,656 --
    batched execution returns per-block status flags, SURVEY.md section 5
    "failure detection").

    ROUTED THROUGH THE PLANE-MAJOR CHAIN (XLA:TPU miscompile sighting #4,
    docs/PERF.md): the fused word-major syndromes+correct program returns
    ok=False for EVERY t=2 pattern at exactly (k=22, B=1) on the axon
    backend -- deterministic, 10/10 random codewords, while k=24/20/18,
    B>=2, CPU, and the SPLIT stages (syndromes and correct as separate
    jits) are all correct, so the bug is a property of the fused program,
    not of either stage.  The pm chain (block axis on the lane dim) is
    chip-verified clean across the full (k, B) matrix
    (tools/chip_rs_smallbatch.py) AND is the performant layout (the
    (B, 26, 3) word-major layout pads its 3-lane minor 16x -- see the
    "pm codec" section below); the boundary transposes are noise at API
    batch sizes.

    For large mostly-clean batches prefer decode_dig_paged, which runs the
    correction chain only on dirty pages of blocks.
    """
    recv_dig = jnp.asarray(recv_dig)
    pm = recv_dig.transpose(2, 1, 0)                       # (3, 26, B)
    data_pm, ok = _correct_pm(pm, syndromes_pm(pm, k), k)
    return data_pm.transpose(2, 1, 0), ok


def decode_dig_paged(recv_dig, k: int, page: int = 256,
                     max_dirty_pages: int | None = None):
    """decode_dig with page-compacted error correction.

    Production RS decoders short-circuit clean codewords.  A whole-batch
    `lax.cond` fast path was measured SLOWER than always running the chain
    on TPU (the branch boundary forces the block tensor to materialize and
    breaks XLA fusion across it — docs/PERF.md), so the skip is done by
    compaction instead, in straight-line code:

      1. one syndrome matmul over ALL blocks (cheap, MXU);
      2. group blocks into pages of `page`; gather the (at most C) dirty
         pages into a fixed-size buffer;
      3. run BM + Chien + Forney on C*page blocks only (C << npages on
         intact streams: clean inputs pay ~1/8 of the chain, not all of it);
      4. scatter corrected data back (out-of-range sentinel rows drop).

    Capacity semantics: at most C = max_dirty_pages pages are corrected per
    call (default npages/8, min 8).  Blocks in dirty pages beyond capacity
    are returned uncorrected with ok=False — fail-safe, never silently
    wrong, matching the per-block status-flag contract (SURVEY.md section 5
    "failure detection").  For adversarially dense corruption use
    decode_dig, which corrects every block unconditionally.
    """
    recv_dig = jnp.asarray(recv_dig)
    M = _matrices(k)
    r = M["r"]
    B = recv_dig.shape[0]
    npage = -(-B // page)
    C = max_dirty_pages if max_dirty_pages is not None else max(8, npage // 8)
    C = min(C, npage)
    padB = npage * page - B
    # zero-padded blocks are valid codewords (zero syndromes) => clean
    rd = jnp.pad(recv_dig, ((0, padB), (0, 0), (0, 0)))
    S = syndromes_dig(rd, k)                               # (Bp, r, 3)
    dirty_blk = jnp.any(S.reshape(npage * page, 3 * r) != 0, axis=-1)
    pdirty = jnp.any(dirty_blk.reshape(npage, page), axis=1)
    # first C dirty page indices, ascending; clean pages sort to sentinel
    pidx = jnp.sort(jnp.where(pdirty, jnp.arange(npage), npage))[:C]
    valid = pidx < npage
    psafe = jnp.where(valid, pidx, 0)
    g_rd = rd.reshape(npage, page, N, 3)[psafe].reshape(C * page, N, 3)
    g_S = S.reshape(npage, page, r, 3)[psafe].reshape(C * page, r, 3)
    d_g, ok_g = _correct_dig(g_rd, g_S, k)
    # scatter back; invalid slots target row `npage` -> dropped
    tgt = jnp.where(valid, pidx, npage)
    data = rd[:, :k, :].reshape(npage, page, k, 3)
    data = data.at[tgt].set(d_g.reshape(C, page, k, 3), mode="drop")
    ok = (~dirty_blk).reshape(npage, page)
    ok = ok.at[tgt].set(ok_g.reshape(C, page), mode="drop")
    return data.reshape(npage * page, k, 3)[:B], ok.reshape(-1)[:B]


def decode(recv, k: int):
    """Decode blocks.  recv: (B, 26) GF27 symbols -> (data (B, k) int8, ok)."""
    data_dig, ok = decode_dig(sym_to_dig(recv), k)
    return dig_to_sym(data_dig).astype(jnp.int8), ok


# ---------------------------------------------------------------------------
# plane-major ("pm") codec: blocks are (3, 26, B) int8
# ---------------------------------------------------------------------------
# TPU tiles int8 arrays over their two minor dims; the (B, 26, 3) layout
# pads 3 -> 128 lanes (measured ~16x traffic blowup, tools/hbm_probe.py).
# The pm codec keeps the digit axis leading and the block axis minor, and
# every fixed GF27 linear map is one lax.dot_general over (digit, coeff)
# coordinates (gf27.gf3_linmap_pm) -- no transposes between chain stages.


@functools.cache
def _matrices_pm(k: int):
    M = _matrices(k)
    r, smax = M["r"], M["smax"]
    ii = np.arange(N)[:, None]
    Csynd = np_alpha_pow((np.arange(r)[None, :] + 1) * ii)        # (26, r)
    dd = np.arange(smax)[:, None]
    pos = np.arange(N)[None, :]
    Cchien = np_alpha_pow(-pos * dd)                              # (smax, 26)
    Com = np_alpha_pow(-pos * np.arange(r)[:, None])              # (r, 26)
    Csp = np.zeros((smax, N), dtype=np.int64)
    for d in range(1, smax):
        s = d % 3
        if s:
            Csp[d] = np_gf_mul(s, np_alpha_pow(-pos[0] * (d - 1)))
    return {
        "r": r, "smax": smax,
        "G2": gf27.gf3_linmap_pm(M["G"]),    # data (3,k,B)    -> (78, B)
        "S2": gf27.gf3_linmap_pm(Csynd),     # recv (3,26,B)   -> (3r, B)
        "CH2": gf27.gf3_linmap_pm(Cchien),   # sigma (3,smax,B)-> (78, B)
        "OM2": gf27.gf3_linmap_pm(Com),      # omega (3,r,B)   -> (78, B)
        "SP2": gf27.gf3_linmap_pm(Csp),      # sigma (3,smax,B)-> (78, B)
    }


def encode_pm(data_pm, k: int):
    """(3, k, B) data digits -> (3, 26, B) codeword digits (one MXU dot)."""
    M = _matrices_pm(k)
    B_ = data_pm.shape[-1]
    return gf27.mod3_dot_pm(M["G2"], data_pm).reshape(3, N, B_)


def encode_pm_blocks(data_bk, k: int):
    """(3, B, k) data digits -> (3, B, 26) codewords.

    Contracts the (digit, coeff) coordinates of the block-minor layout
    directly (lax.dot_general dims ((1,2),(0,2))) -- no input transpose;
    the single output transpose lands in a well-tiled (B, 26) shape."""
    M = _matrices_pm(k)
    y = lax.dot_general(jnp.asarray(M["G2"], dtype=jnp.int8),
                        data_bk.astype(jnp.int8),
                        (((1, 2), (0, 2)), ((), ())),
                        preferred_element_type=jnp.int32)      # (78, B)
    y = fmod3(y.astype(jnp.float32)).astype(jnp.int8)
    B_ = data_bk.shape[1]
    return y.reshape(3, N, B_).transpose(0, 2, 1)


def syndromes_pm(recv_pm, k: int):
    """(3, 26, B) received digits -> (3, r, B) syndrome digits."""
    M = _matrices_pm(k)
    B_ = recv_pm.shape[-1]
    return gf27.mod3_dot_pm(M["S2"], recv_pm).reshape(3, M["r"], B_)


def _correct_pm(recv_pm, S_pm, k: int):
    """BM + Chien + Forney in plane-major layout.

    recv_pm (3, 26, B), S_pm (3, r, B) -> (data (3, k, B), ok (B,)).
    Same algebra as _correct_dig; layouts keep the block axis on the TPU
    lane dimension end to end."""
    M = _matrices_pm(k)
    r, smax = M["r"], M["smax"]
    t = r // 2
    B_ = recv_pm.shape[-1]
    synd_zero = jnp.all(S_pm.reshape(3 * r, B_) == 0, axis=0)

    S3d = S_pm.transpose(1, 0, 2)                          # (r, 3, B) small
    sigma, L = _bm_core(S3d, r, smax)                      # (smax, 3, B)
    sigma_pm = sigma.transpose(1, 0, 2)                    # (3, smax, B)

    ev = gf27.mod3_dot_pm(M["CH2"], sigma_pm).reshape(3, N, B_)
    root = jnp.sum(ev, axis=0) == 0                        # (26, B)
    nroots = jnp.sum(root, axis=0)                         # (B,)

    # Omega = S(x) sigma(x) mod x^r in (coeff, digit, B) layout
    def m3(a, b):
        a0, a1, a2 = a[..., 0, :], a[..., 1, :], a[..., 2, :]
        b0, b1, b2 = b[..., 0, :], b[..., 1, :], b[..., 2, :]
        r0 = a0 * b0
        r1 = a0 * b1 + a1 * b0
        r2 = a0 * b2 + a1 * b1 + a2 * b0
        r3 = a1 * b2 + a2 * b1
        r4 = a2 * b2
        return jnp.stack([_m3i(r0 + 2 * r3), _m3i(r1 + r3 + 2 * r4),
                          _m3i(r2 + r4)], axis=-2)

    om_rows = []
    for j in range(r):
        i0 = max(0, j - smax + 1)
        terms = m3(S3d[i0:j + 1], sigma[j - i0::-1][:j + 1 - i0])
        om_rows.append(fmod3(jnp.sum(terms, axis=0, dtype=jnp.int32)
                             .astype(jnp.float32)).astype(jnp.int8))
    Om_pm = jnp.stack(om_rows, axis=0).transpose(1, 0, 2)  # (3, r, B)

    num = gf27.mod3_dot_pm(M["OM2"], Om_pm).reshape(3, N, B_)
    den = gf27.mod3_dot_pm(M["SP2"], sigma_pm).reshape(3, N, B_)
    Y = _m3i(-gf27.mul_pm(num, gf27.inv_pm(den)))
    corr = jnp.where(root[None], _m3i(-Y), jnp.int8(0))
    fixed = _m3i(recv_pm + corr)                           # (3, 26, B)

    S2c = gf27.mod3_dot_pm(M["S2"], fixed)                 # (3r, B)
    ok = jnp.all(S2c == 0, axis=0) & (nroots <= t) & (nroots == L)
    ok = ok | synd_zero
    fixed = jnp.where(synd_zero[None, None], recv_pm, fixed)
    return fixed[:, :k], ok


def _correct_pm_mixed(recv_pm, S_pm, r_vec, rmax: int):
    """Mixed-k BM + Chien + Forney: ONE chain instance over blocks of
    DIFFERENT k, bit-identical per block to _correct_pm at that block's k.

    recv_pm (3, 26, B); S_pm (3, rmax, B) with each block's syndrome rows
    >= its own r ZEROED by the caller (blocks of smaller r zero-pad);
    r_vec (B,) int32 per-block r = 26-k.  Returns (fixed (3, 26, B) -- ALL
    positions, the caller slices its k data columns per group -- ok (B,)).

    Why: the paged repair dispatch is op-count-bound (docs/PERF.md), and
    the v2 decode body emits one full chain PER k-group.  Masking instead
    of splitting -- BM iterations n >= r freeze (see _bm_core r_vec),
    Omega coefficients >= r zero, the recheck tests only the first r
    syndrome rows, capacity t = r//2 per block -- runs every group in one
    instance.  Per-block equivalence: within its r iterations the masked
    BM state equals the per-k state (sigma degree <= r < smax never
    reaches the shorter array's truncation), the zero-padded sigma rows
    evaluate to zero under the longer Chien/sigma' maps, and Omega rows
    j < r use windows identical to the per-k loop (i0 = 0 for all
    j <= r-1 at every r)."""
    M = _matrices_pm(N - rmax)
    r, smax = rmax, rmax + 1
    B_ = recv_pm.shape[-1]
    r_vec = jnp.asarray(r_vec, jnp.int32)
    synd_zero = jnp.all(S_pm.reshape(3 * r, B_) == 0, axis=0)

    S3d = S_pm.transpose(1, 0, 2)                          # (r, 3, B)
    sigma, L = _bm_core(S3d, r, smax, r_vec=r_vec)         # (smax, 3, B)
    sigma_pm = sigma.transpose(1, 0, 2)                    # (3, smax, B)

    ev = gf27.mod3_dot_pm(M["CH2"], sigma_pm).reshape(3, N, B_)
    root = jnp.sum(ev, axis=0) == 0                        # (26, B)
    nroots = jnp.sum(root, axis=0)                         # (B,)

    def m3(a, b):
        a0, a1, a2 = a[..., 0, :], a[..., 1, :], a[..., 2, :]
        b0, b1, b2 = b[..., 0, :], b[..., 1, :], b[..., 2, :]
        r0 = a0 * b0
        r1 = a0 * b1 + a1 * b0
        r2 = a0 * b2 + a1 * b1 + a2 * b0
        r3 = a1 * b2 + a2 * b1
        r4 = a2 * b2
        return jnp.stack([_m3i(r0 + 2 * r3), _m3i(r1 + r3 + 2 * r4),
                          _m3i(r2 + r4)], axis=-2)

    om_rows = []
    for j in range(r):
        terms = m3(S3d[j::-1], sigma[:j + 1])
        row = fmod3(jnp.sum(terms, axis=0, dtype=jnp.int32)
                    .astype(jnp.float32)).astype(jnp.int8)
        # Omega = S(x) sigma(x) mod x^r_block: rows at j >= the block's
        # own r do not exist in its per-k chain -- zero them
        om_rows.append(jnp.where((j < r_vec)[None, :], row, jnp.int8(0)))
    Om_pm = jnp.stack(om_rows, axis=0).transpose(1, 0, 2)  # (3, r, B)

    num = gf27.mod3_dot_pm(M["OM2"], Om_pm).reshape(3, N, B_)
    den = gf27.mod3_dot_pm(M["SP2"], sigma_pm).reshape(3, N, B_)
    Y = _m3i(-gf27.mul_pm(num, gf27.inv_pm(den)))
    corr = jnp.where(root[None], _m3i(-Y), jnp.int8(0))
    fixed = _m3i(recv_pm + corr)                           # (3, 26, B)

    # recheck only each block's own syndromes (rows >= its r are nonzero
    # even for valid codewords of its k)
    S2c = gf27.mod3_dot_pm(M["S2"], fixed).reshape(3, r, B_)
    rmask = jnp.arange(r, dtype=jnp.int32)[None, :, None] \
        < r_vec[None, None, :]
    ok = jnp.all((jnp.where(rmask, S2c, 0) == 0).reshape(3 * r, B_),
                 axis=0) & (nroots <= r_vec // 2) & (nroots == L)
    ok = ok | synd_zero
    fixed = jnp.where(synd_zero[None, None], recv_pm, fixed)
    return fixed, ok


def decode_pm(recv_pm, k: int):
    """Plane-major decode: (3, 26, B) -> ((3, k, B), ok (B,))."""
    recv_pm = jnp.asarray(recv_pm)
    return _correct_pm(recv_pm, syndromes_pm(recv_pm, k), k)


def decode_pm_bk(recv_bk, k: int):
    """Full-chain decode for block-minor layout: (3, B, 26) -> ((3, B, k),
    ok (B,)).  One transpose into the chain layout and one back; prefer
    decode_paged_pm_bk, which transposes only the dirty pages."""
    recv_bk = jnp.asarray(recv_bk)
    d, ok = _correct_pm(recv_bk.transpose(0, 2, 1),
                        syndromes_pm_bk(recv_bk, k), k)
    return d.transpose(0, 2, 1), ok


def syndromes_pm_bk(recv_bk, k: int):
    """(3, B, 26) received digits -> (3, r, B) syndromes (no transpose:
    lax.dot_general contracts the (digit, coeff) coordinates in place)."""
    M = _matrices_pm(k)
    B_ = recv_bk.shape[1]
    y = lax.dot_general(jnp.asarray(M["S2"], dtype=jnp.int8),
                        recv_bk.astype(jnp.int8),
                        (((1, 2), (0, 2)), ((), ())),
                        preferred_element_type=jnp.int32)      # (3r, B)
    return fmod3(y.astype(jnp.float32)).astype(jnp.int8) \
        .reshape(3, M["r"], B_)


def decode_delta_pm_bk(recv_bk, k: int, page: int,
                       max_dirty_pages: int = 4):
    """Paged decode returning a sparse CORRECTION instead of the data.

    recv_bk (3, B, 26) with page | B (callers pick a static divisor of the
    group's block count, killing the pad copy) -> (delta (3, B, k),
    ok (B,)), where corrected_data = (recv_data + delta) mod 3.  Returning
    the delta lets the caller fuse the final add into its next read of the
    data stream -- the full-size orig/where merge passes of
    decode_paged_pm_bk disappear.  Capacity semantics unchanged."""
    recv_bk = jnp.asarray(recv_bk)
    M = _matrices_pm(k)
    r = M["r"]
    B = recv_bk.shape[1]
    assert B % page == 0, "page must divide the block count"
    npage = B // page
    C = min(max_dirty_pages, npage)
    S = syndromes_pm_bk(recv_bk, k).reshape(3 * r, B)
    dirty_blk = jnp.any(S != 0, axis=0)
    pdirty = jnp.any(dirty_blk.reshape(npage, page), axis=1)
    pidx = jnp.sort(jnp.where(pdirty, jnp.arange(npage), npage))[:C]
    valid = pidx < npage
    psafe = jnp.where(valid, pidx, 0)
    g_rd = recv_bk.reshape(3, npage, page, N)[:, psafe] \
        .reshape(3, C * page, N).transpose(0, 2, 1)         # (3, 26, Cp)
    g_S = S.reshape(3, r, npage, page)[:, :, psafe].reshape(3, r, C * page)
    d_g, ok_g = _correct_pm(g_rd, g_S, k)                   # (3, k, Cp)
    delta_g = _m3i(d_g - g_rd[:, :k])                       # (3, k, Cp)
    rank = jnp.cumsum(pdirty.astype(jnp.int32)) - 1
    slot = jnp.clip(rank, 0, C - 1)
    use_corr = pdirty & (rank < C)
    delta = jnp.where(
        use_corr[None, :, None, None],
        delta_g.reshape(3, k, C, page).transpose(0, 2, 3, 1)[:, slot],
        jnp.int8(0)).reshape(3, B, k)
    ok_pages = ok_g.reshape(C, page)[slot]
    ok = jnp.where(use_corr[:, None], ok_pages,
                   (~dirty_blk).reshape(npage, page)).reshape(-1)
    return delta, ok


def pick_page(nblk: int, lo: int = 8, hi: int = 64, target: int = 24):
    """Largest-preference divisor of nblk in [lo, hi] nearest `target`;
    None when nblk has no such divisor (callers fall back to padding)."""
    cands = [d for d in range(lo, hi + 1) if nblk % d == 0]
    return min(cands, key=lambda d: abs(d - target)) if cands else None


def decode_paged_pm_bk(recv_bk, k: int, page: int = 256,
                       max_dirty_pages: int | None = None):
    """Page-compacted decode for the block-minor (3, B, 26) layout.

    The big-B work is ONE dot_general (syndromes) and the data slice — no
    full-size transposes or scatters.  Only the <= C gathered dirty pages
    enter the (3, 26, b) correction-chain layout; the merge back is a
    gather + where (TPU scatters lower poorly; a slot-gather doesn't).
    Capacity semantics match decode_dig_paged."""
    recv_bk = jnp.asarray(recv_bk)
    M = _matrices_pm(k)
    r = M["r"]
    B = recv_bk.shape[1]
    npage = -(-B // page)
    C = max_dirty_pages if max_dirty_pages is not None else max(8, npage // 8)
    C = min(C, npage)
    padB = npage * page - B
    rd = jnp.pad(recv_bk, ((0, 0), (0, padB), (0, 0)))
    S = syndromes_pm_bk(rd, k).reshape(3 * r, npage * page)
    dirty_blk = jnp.any(S != 0, axis=0)                     # (Bp,)
    pdirty = jnp.any(dirty_blk.reshape(npage, page), axis=1)
    pidx = jnp.sort(jnp.where(pdirty, jnp.arange(npage), npage))[:C]
    valid = pidx < npage
    psafe = jnp.where(valid, pidx, 0)
    g_rd = rd.reshape(3, npage, page, N)[:, psafe] \
        .reshape(3, C * page, N).transpose(0, 2, 1)         # (3, 26, Cp)
    g_S = S.reshape(3, r, npage, page)[:, :, psafe].reshape(3, r, C * page)
    d_g, ok_g = _correct_pm(g_rd, g_S, k)                   # (3, k, Cp)
    # slot-gather merge: page p takes corrected slot rank(p) when gathered
    rank = jnp.cumsum(pdirty.astype(jnp.int32)) - 1         # (npage,)
    slot = jnp.clip(rank, 0, C - 1)
    use_corr = pdirty & (rank < C)
    corr_pages = d_g.reshape(3, k, C, page).transpose(0, 2, 3, 1)[:, slot]
    orig = rd[:, :, :k].reshape(3, npage, page, k)
    data = jnp.where(use_corr[None, :, None, None], corr_pages, orig)
    ok_pages = ok_g.reshape(C, page)[slot]                  # (npage, page)
    ok = jnp.where(use_corr[:, None], ok_pages,
                   (~dirty_blk).reshape(npage, page))
    return (data.reshape(3, npage * page, k)[:, :B],
            ok.reshape(-1)[:B])


def decode_paged_pm(recv_pm, k: int, page: int = 256,
                    max_dirty_pages: int | None = None):
    """Plane-major decode_dig_paged: correction chain only on dirty pages.

    recv_pm (3, 26, B) -> ((3, k, B), ok (B,)); capacity semantics match
    decode_dig_paged (overflow pages return uncorrected data + ok=False)."""
    recv_pm = jnp.asarray(recv_pm)
    M = _matrices_pm(k)
    r = M["r"]
    B = recv_pm.shape[-1]
    npage = -(-B // page)
    C = max_dirty_pages if max_dirty_pages is not None else max(8, npage // 8)
    C = min(C, npage)
    padB = npage * page - B
    rd = jnp.pad(recv_pm, ((0, 0), (0, 0), (0, padB)))
    S = syndromes_pm(rd, k)                                # (3, r, Bp)
    dirty_blk = jnp.any(S.reshape(3 * r, npage * page) != 0, axis=0)
    pdirty = jnp.any(dirty_blk.reshape(npage, page), axis=1)
    pidx = jnp.sort(jnp.where(pdirty, jnp.arange(npage), npage))[:C]
    valid = pidx < npage
    psafe = jnp.where(valid, pidx, 0)
    g_rd = rd.reshape(3, N, npage, page)[:, :, psafe] \
        .reshape(3, N, C * page)
    g_S = S.reshape(3, r, npage, page)[:, :, psafe].reshape(3, r, C * page)
    d_g, ok_g = _correct_pm(g_rd, g_S, k)
    tgt = jnp.where(valid, pidx, npage)
    data = rd[:, :k].reshape(3, k, npage, page)
    data = data.at[:, :, tgt].set(d_g.reshape(3, k, C, page), mode="drop")
    ok = (~dirty_blk).reshape(npage, page)
    ok = ok.at[tgt].set(ok_g.reshape(C, page), mode="drop")
    return data.reshape(3, k, npage * page)[:, :, :B], ok.reshape(-1)[:B]


# convenience jitted single-profile entry points -----------------------------


@functools.partial(jax.jit, static_argnums=(1,))
def encode_jit(data, k: int):
    return encode(data, k)


@functools.partial(jax.jit, static_argnums=(1,))
def decode_jit(recv, k: int):
    return decode(recv, k)
