"""Transform prototypes (lossy "no-entropy" source coding), TPU-native.

Three reference prototypes re-designed for XLA (SURVEY.md §2.3):

* T1 Haar ternary tiles  — per-NxN-tile integer-lifting 2D Haar on Y, LL kept
  u8, LH/HL/HH ternarized by +-thresh.  Tiles are a batch axis; the lifting
  is pure strided adds/shifts, fused by XLA on the VPU.
  (reference behavior: include/proto_noentropy.hpp:94-218,334-366)
* T2 Spectral sketch     — downscale -> block-mean grid -> DCT-II 2D as two
  matmuls with a constant cosine basis (MXU) -> radial x angle |F| bins via a
  constant one-hot matmul -> robust median/MAD z-score ternarize.
  (reference: include/proto_noentropy.hpp:220-329)
* T3 AnisoRC             — per-32x32-block discrete Radon on 8 fixed angles;
  binning is a constant one-hot matmul per angle (MXU), Haar-1D per
  projection, median/MAD ternarize of details; approximate reconstruction by
  inverse Haar + back-projection gather.
  (reference: include/proto_aniso_rc.hpp:47-398)

Rounding/ordering parity notes:
* C++ `>>1` on negative ints is an arithmetic shift == floor division, which
  is exactly jnp's `//`-semantics for int32 — the lifting matches bit-exactly.
* The reference's median is `std::nth_element(.., begin()+size/2, ..)` — the
  UPPER median for even sizes, not numpy's interpolated median.  We replicate
  with sort + take index size//2.
* Radon bin index uses float32 `lround(xf*c + yf*s)`; the bin tables are
  precomputed host-side in float32 to match.
* C++ integer division in the reconstruction (`acc/hits`) truncates toward
  zero (operands may be negative) — replicated with jnp truncation.
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from . import quant as Q

# Angle table, degrees (include/proto_aniso_rc.hpp:55).
RC_ANGLE_TABLE_DEG = (0.0, 22.5, 45.0, 67.5, 90.0, 112.5, 135.0, 157.5)


@dataclasses.dataclass(frozen=True)
class ProtoParams:
    """Haar-ternary + sketch parameters (include/proto_noentropy.hpp:40-48)."""
    tile: int = 8
    sketch_size: int = 32
    sketch_down: int = 256
    radial_bins: int = 8
    angle_bins: int = 8
    thresh: int = 6
    keep_ll_u8: bool = True


@dataclasses.dataclass(frozen=True)
class AnisoRCParams:
    """include/proto_aniso_rc.hpp:47-56."""
    block: int = 32
    angles: int = 8
    tern_thresh_z: float = 1.2
    keep_ll_u8: bool = True
    normalize_proj: bool = True


# ---------------------------------------------------------------------------
# Integer-lifting Haar (single level), batched
# ---------------------------------------------------------------------------


def haar1d(v):
    """[... , L] int32 -> [approx | detail] along last axis.
    a = (x0+x1)>>1 (floor), d = x0-x1  (include/proto_noentropy.hpp:97-108)."""
    v = jnp.asarray(v).astype(jnp.int32)
    x0, x1 = v[..., 0::2], v[..., 1::2]
    return jnp.concatenate([(x0 + x1) // 2, x0 - x1], axis=-1)


def haar1d_inv(v):
    """Exact inverse: x0 = a + d>>1, x1 = a - (d - d>>1)
    (include/proto_noentropy.hpp:110-120)."""
    v = jnp.asarray(v).astype(jnp.int32)
    L = v.shape[-1]
    a, d = v[..., :L // 2], v[..., L // 2:]
    x0 = a + d // 2
    x1 = a - (d - d // 2)
    return jnp.stack([x0, x1], axis=-1).reshape(*v.shape[:-1], L)


def haar2d(tiles):
    """(..., N, N) -> single-level 2D Haar, rows then columns
    (include/proto_noentropy.hpp:124-139)."""
    t = haar1d(tiles)                      # rows
    return haar1d(t.swapaxes(-1, -2)).swapaxes(-1, -2)  # cols


def haar2d_inv(tiles):
    """Columns then rows (include/proto_noentropy.hpp:140-155)."""
    t = haar1d_inv(jnp.asarray(tiles).swapaxes(-1, -2)).swapaxes(-1, -2)
    return haar1d_inv(t)


# ---------------------------------------------------------------------------
# Robust median/MAD ternarization (nth_element semantics)
# ---------------------------------------------------------------------------


def _upper_median(x, axis=-1):
    """std::nth_element(begin, begin+n/2, end) median: element at sorted index
    n//2 (the UPPER median for even n)."""
    xs = jnp.sort(x, axis=axis)
    n = x.shape[axis]
    return jnp.take(xs, n // 2, axis=axis)


def robust_z(values, axis=-1, eps=1e-6):
    """(v - med) / (1.4826 * (MAD + eps)) per the reference formula; note the
    reference adds eps to MAD *before* multiplying by 1.4826
    (include/proto_noentropy.hpp:318-327, proto_aniso_rc.hpp:219-228)."""
    v = values.astype(jnp.float32)
    med = _upper_median(v, axis=axis)
    mad = _upper_median(jnp.abs(v - jnp.expand_dims(med, axis)), axis=axis) + eps
    return (v - jnp.expand_dims(med, axis)) / (1.4826 * jnp.expand_dims(mad, axis))


# ---------------------------------------------------------------------------
# T1: Haar ternary tiles
# ---------------------------------------------------------------------------


def _detail_order_indices(n: int) -> np.ndarray:
    """Row-major flat indices of the non-LL coefficients of an NxN tile
    (include/proto_noentropy.hpp:207-215 iteration order)."""
    idx = []
    for y in range(n):
        for x in range(n):
            if not (x < n // 2 and y < n // 2):
                idx.append(y * n + x)
    return np.asarray(idx, dtype=np.int32)


def _pad_to_tiles_nn(rgb, n: int):
    """Reference pads by NN-*resizing* the whole image up to tile multiples
    (include/proto_noentropy.hpp:165-168) — not by edge padding."""
    h, w = rgb.shape[0], rgb.shape[1]
    W = -(-w // n) * n
    H = -(-h // n) * n
    if (W, H) != (w, h):
        rgb = Q.resize_nn(rgb, H, W)
    return rgb, W, H


def _y_plane(rgb):
    return Q.rgb_to_ycbcr(rgb)[..., 0].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("tile", "thresh", "keep_ll_u8"))
def _haar_tiles_core(yplane, tile: int, thresh: int, keep_ll_u8: bool):
    H, W = yplane.shape
    ty, tx = H // tile, W // tile
    tiles = (yplane.reshape(ty, tile, tx, tile).transpose(0, 2, 1, 3)
             .reshape(ty * tx, tile, tile))
    coef = haar2d(tiles).reshape(ty * tx, tile * tile)
    ll = jnp.clip(coef[:, 0], 0, 255).astype(jnp.uint8) if keep_ll_u8 else None
    det = coef[:, jnp.asarray(_detail_order_indices(tile))]
    trits = jnp.where(jnp.abs(det) >= thresh,
                      jnp.sign(det).astype(jnp.int8), jnp.int8(0))
    return ll, trits.reshape(-1)


def proto_tile_haar_ternary(rgb, params: ProtoParams
                            ) -> Tuple[Optional[np.ndarray], jnp.ndarray, int, int]:
    """-> (tile_LL u8 | None, tile_trits balanced int8 flat, tilesX, tilesY).

    Device path of include/proto_noentropy.hpp:161-218.
    """
    rgb = jnp.asarray(rgb)
    rgb, W, H = _pad_to_tiles_nn(rgb, params.tile)
    yp = _y_plane(rgb)
    ll, trits = _haar_tiles_core(yp, params.tile, params.thresh,
                                 params.keep_ll_u8)
    return ll, trits, W // params.tile, H // params.tile


def proto_reconstruct_y_from_tiles(tile_ll, tile_trits, tiles_x: int,
                                   tiles_y: int, params: ProtoParams):
    """Approximate inverse: details at +-thresh, LL in coef[0], inverse Haar
    (include/proto_noentropy.hpp:334-366). -> (H, W) uint8 Y plane."""
    n = params.tile
    nt = tiles_x * tiles_y
    det_idx = jnp.asarray(_detail_order_indices(n))
    trits = jnp.asarray(tile_trits).reshape(nt, det_idx.shape[0]).astype(jnp.int32)
    coef = jnp.zeros((nt, n * n), dtype=jnp.int32)
    coef = coef.at[:, det_idx].set(trits * params.thresh)
    if params.keep_ll_u8 and tile_ll is not None:
        coef = coef.at[:, 0].set(jnp.asarray(tile_ll).astype(jnp.int32))
    rec = haar2d_inv(coef.reshape(nt, n, n))
    rec = jnp.clip(rec, 0, 255).astype(jnp.uint8)
    return (rec.reshape(tiles_y, tiles_x, n, n).transpose(0, 2, 1, 3)
            .reshape(tiles_y * n, tiles_x * n))


# ---------------------------------------------------------------------------
# T2: spectral sketch
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _dct_basis(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis B[k, i] = alpha_k cos(pi (2i+1) k / 2n),
    float32 like the reference (include/proto_noentropy.hpp:223-235)."""
    k = np.arange(n)[:, None].astype(np.float32)
    i = np.arange(n)[None, :].astype(np.float32)
    b = np.cos(np.float32(math.pi) * (2 * i + 1) * k / np.float32(2 * n))
    alpha = np.full((n, 1), math.sqrt(2.0 / n), dtype=np.float32)
    alpha[0, 0] = math.sqrt(1.0 / n)
    return (alpha * b).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _sketch_bin_onehot(n: int, rb: int, ab: int) -> np.ndarray:
    """(n*n, rb*ab) float32 one-hot bin-membership matrix; DC (0,0) belongs to
    no bin (include/proto_noentropy.hpp:292-310 polar binning)."""
    cx = cy = (n - 1) / 2.0
    rmax = math.hypot(cx, cy)
    onehot = np.zeros((n * n, rb * ab), dtype=np.float32)
    for y in range(n):
        for x in range(n):
            if x == 0 and y == 0:
                continue
            X, Y = np.float32(x - cx), np.float32(y - cy)
            R = math.hypot(X, Y)
            th = math.atan2(Y, X)
            if th < 0:
                th += 2 * math.pi
            r_i = min(rb - 1, int(R / (rmax + 1e-6) * rb))
            a_i = min(ab - 1, int(th / (2 * math.pi) * ab))
            onehot[y * n + x, r_i * ab + a_i] = 1.0
    return onehot


@functools.partial(jax.jit, static_argnames=("size", "rb", "ab"))
def _sketch_core(grid, size: int, rb: int, ab: int):
    basis = jnp.asarray(_dct_basis(size))
    F = basis @ grid @ basis.T          # DCT rows+cols as two matmuls (MXU)
    onehot = jnp.asarray(_sketch_bin_onehot(size, rb, ab))
    absf = jnp.abs(F).reshape(-1)
    sums = absf @ onehot
    counts = jnp.sum(onehot, axis=0)
    vals = jnp.where(counts > 0, sums / counts, 0.0)
    z = robust_z(vals)
    return jnp.where(z > 1.0, jnp.int8(1),
                     jnp.where(z < -1.0, jnp.int8(-1), jnp.int8(0)))


def proto_spectral_sketch(rgb, params: ProtoParams) -> jnp.ndarray:
    """-> (radial_bins*angle_bins,) balanced trits
    (include/proto_noentropy.hpp:255-329)."""
    rgb = jnp.asarray(rgb)
    small = Q.resize_nn(rgb, params.sketch_down, params.sketch_down)
    yf = _y_plane(small).astype(jnp.float32) - 128.0
    n = params.sketch_size
    bs = max(1, params.sketch_down // n)
    # block mean over bs x bs cells (reference clips to image bounds; with
    # square sketch_down the grid divides exactly when n*bs == sketch_down)
    hh = min(n * bs, params.sketch_down)
    g = yf[:hh, :hh].reshape(n, bs, n, bs).mean(axis=(1, 3))
    return _sketch_core(g, n, params.radial_bins, params.angle_bins)


# ---------------------------------------------------------------------------
# T3: AnisoRC (ridgelet/curvelet-lite)
# ---------------------------------------------------------------------------


def rc_proj_len_for_block(n: int) -> int:
    """2*ceil(N/sqrt(2)) + 1 (include/proto_aniso_rc.hpp:163-167)."""
    r = int(math.ceil(float(np.float32(n) * np.float32(0.70710678))))
    return 2 * r + 1


@functools.lru_cache(maxsize=None)
def _rc_bin_tables(n: int, angles: int) -> Tuple[np.ndarray, np.ndarray]:
    """-> (onehot (A, n*n, PL) float32, counts (A, PL) int32).

    bin = lround_f32(xf*cos + yf*sin) + R, computed in float32 like the
    reference (include/proto_aniso_rc.hpp:149-202).
    """
    a_count = min(len(RC_ANGLE_TABLE_DEG), angles)
    pl = rc_proj_len_for_block(n)
    r = (pl - 1) // 2
    cx = cy = np.float32((n - 1) * 0.5)
    onehot = np.zeros((a_count, n * n, pl), dtype=np.float32)
    for ai in range(a_count):
        # float32 chain exactly as the reference: deg * (float)M_PI / 180.f,
        # then cosf/sinf (include/proto_aniso_rc.hpp:156-160).  The residual
        # cos(90deg) ~ -4e-8 decides .5-rounding ties in the bin index, so
        # every step must round through float32.
        rad = np.float32(np.float32(RC_ANGLE_TABLE_DEG[ai])
                         * np.float32(math.pi)) / np.float32(180.0)
        c = np.float32(math.cos(float(rad)))
        s = np.float32(math.sin(float(rad)))
        for y in range(n):
            for x in range(n):
                # the sum itself is float32 (reference arithmetic); the
                # lround tie-break (+0.5, floor) must NOT re-round in f32 —
                # 0.49999997f + 0.5 would collapse to 1.0f — so it is done
                # in double like libm's lroundf
                rho = float(np.float32(np.float32(x - cx) * c
                                       + np.float32(y - cy) * s))
                b = (int(math.floor(rho + 0.5)) if rho >= 0
                     else -int(math.floor(-rho + 0.5))) + r
                if 0 <= b < pl:
                    onehot[ai, y * n + x, b] = 1.0
    counts = onehot.sum(axis=1).astype(np.int32)
    return onehot, counts


@functools.partial(jax.jit,
                   static_argnames=("block", "angles", "zth", "keep_ll",
                                    "normalize"))
def _rc_encode_core(yplane, block: int, angles: int, zth: float,
                    keep_ll: bool, normalize: bool):
    n = block
    H, W = yplane.shape
    by, bx = H // n, W // n
    blocks = (yplane.reshape(by, n, bx, n).transpose(0, 2, 1, 3)
              .reshape(by * bx, n * n)).astype(jnp.float32)

    ll = None
    if keep_ll:
        s = jnp.sum(blocks, axis=-1).astype(jnp.int32)
        ll = ((s + (n * n) // 2) // (n * n)).astype(jnp.uint8)

    onehot, counts = _rc_bin_tables(n, angles)
    onehot_j = jnp.asarray(onehot)          # (A, n*n, PL)
    # proj[b, a, p] = sum_k blocks[b, k] * onehot[a, k, p]  — MXU einsum
    proj = jnp.einsum("bk,akp->bap", blocks, onehot_j,
                      preferred_element_type=jnp.float32).astype(jnp.int32)
    cnt = jnp.asarray(counts)[None, :, :]   # (1, A, PL)
    if normalize:
        proj = jnp.where(cnt > 0, (proj + cnt // 2) // cnt, proj)

    pl = proj.shape[-1]
    if pl % 2:  # pad to even by repeating the last sample (hpp:306)
        proj = jnp.concatenate([proj, proj[..., -1:]], axis=-1)
    sig = haar1d(proj)
    hlen = sig.shape[-1] // 2
    det = sig[..., hlen:]                   # (B, A, hlen)

    absd = jnp.abs(det).astype(jnp.float32)
    med = _upper_median(absd)
    mad = _upper_median(jnp.abs(absd - med[..., None])) + 1e-6
    z = (absd - med[..., None]) / (1.4826 * mad[..., None])
    trits = jnp.where(z > zth, jnp.sign(det).astype(jnp.int8), jnp.int8(0))
    return ll, trits.reshape(-1)


@dataclasses.dataclass
class AnisoRCArtifacts:
    """include/proto_aniso_rc.hpp:60-84."""
    W: int
    H: int
    N: int
    blocks_x: int
    blocks_y: int
    proj_len: int
    angles_used: int
    trits_per_block: int
    block_ll: Optional[np.ndarray]
    trits: np.ndarray


def proto_aniso_rc_encode(rgb, params: AnisoRCParams) -> AnisoRCArtifacts:
    """include/proto_aniso_rc.hpp:235-315."""
    rgb = jnp.asarray(rgb)
    rgb, W, H = _pad_to_tiles_nn(rgb, params.block)
    yp = _y_plane(rgb)
    ll, trits = _rc_encode_core(
        yp, params.block, params.angles, float(params.tern_thresh_z),
        params.keep_ll_u8, params.normalize_proj)
    pl = rc_proj_len_for_block(params.block)
    a_used = min(len(RC_ANGLE_TABLE_DEG), params.angles)
    # after even-padding, details per (block, angle) = (PL+1)//2; the
    # reference's trits_per_block metadata uses PL/2 (hpp:280) which
    # undercounts by A for odd PL — we keep the actual stream length and
    # report both (see profiles.py meta).
    return AnisoRCArtifacts(
        W=W, H=H, N=params.block, blocks_x=W // params.block,
        blocks_y=H // params.block, proj_len=pl, angles_used=a_used,
        trits_per_block=a_used * ((pl + 1) // 2),
        block_ll=np.asarray(ll) if ll is not None else None,
        trits=np.asarray(trits))


@functools.partial(jax.jit,
                   static_argnames=("n", "angles", "pl", "keep_ll", "t"))
def _rc_reconstruct_core(trits, block_ll, n: int, angles: int, pl: int,
                         keep_ll: bool, t: int):
    hlen = (pl + 1) // 2  # even-padded signal length // 2
    B = trits.shape[0] // (angles * hlen)
    det = (trits.reshape(B, angles, hlen).astype(jnp.int32)) * t
    sig_len = pl + (pl % 2)
    sig = jnp.zeros((B, angles, sig_len), dtype=jnp.int32)
    sig = sig.at[..., sig_len // 2:].set(det)
    rec = haar1d_inv(sig)[..., :pl]          # (B, A, PL)

    onehot, _counts = _rc_bin_tables(n, angles)
    # gather: pixel k of angle a reads rec[..., bin(a, k)]
    bin_idx = onehot.argmax(axis=-1).astype(np.int32)       # (A, n*n)
    in_range = onehot.sum(axis=-1) > 0                      # (A, n*n)
    gathered = jnp.take_along_axis(
        rec, jnp.asarray(bin_idx)[None, :, :], axis=-1)     # (B, A, n*n)
    mask = jnp.asarray(in_range, dtype=jnp.int32)[None]
    acc = jnp.sum(gathered * mask, axis=1)                  # (B, n*n)
    hits = jnp.sum(mask, axis=1)                            # (1, n*n)
    # C++ int division truncates toward zero (acc may be negative)
    v = jnp.where(hits > 0,
                  jnp.sign(acc) * (jnp.abs(acc) // jnp.maximum(hits, 1)), 0)
    dc = (block_ll.astype(jnp.int32)[:, None] if keep_ll
          else jnp.full((B, 1), 128, jnp.int32))
    return jnp.clip(dc + v, 0, 255).astype(jnp.uint8)


def proto_aniso_rc_reconstruct(art: AnisoRCArtifacts, params: AnisoRCParams,
                               t: int = 20) -> np.ndarray:
    """Approximate QA reconstruction -> (H, W) uint8 Y plane
    (include/proto_aniso_rc.hpp:326-388)."""
    ll = (jnp.asarray(art.block_ll) if art.block_ll is not None
          else jnp.zeros(art.blocks_x * art.blocks_y, jnp.uint8))
    rec = _rc_reconstruct_core(
        jnp.asarray(art.trits), ll, art.N, art.angles_used, art.proj_len,
        art.block_ll is not None, t)
    n, by, bx = art.N, art.blocks_y, art.blocks_x
    img = (rec.reshape(by, bx, n, n).transpose(0, 2, 1, 3)
           .reshape(by * n, bx * n))
    return np.asarray(img)


def psnr_y(a: np.ndarray, b: np.ndarray) -> float:
    """QA metric (src/minitest_aniso_rc.cpp:21-27)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    if mse <= 0:
        return float("inf")
    return 10.0 * math.log10(255.0 * 255.0 / mse)
