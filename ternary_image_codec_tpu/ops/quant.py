"""YCbCr conversion + quantization with bit-exact C++ rounding semantics.

The reference uses std::lround (round half AWAY from zero) everywhere
(include/io_image.hpp:66-99).  numpy/jnp round() is half-to-even, so all
quantization steps here are reformulated as *exact integer arithmetic*:

  lround(n * p / q)  ==  sign(n) * ((2*p*|n| + q) // (2*q))   (integers)

which is bit-exact, avoids float64 (slow on TPU), and vectorizes cleanly.
The RGB<->YCbCr BT.601 stage itself is float32 like the C++ (float math,
lround at the end); see tests/test_quant.py for the differential check
against a compiled C++ oracle.

Reference parity: include/io_image.hpp:66-99 (quantize/dequantize),
:102-124 (NN resize), :125-140 (center blit), :169-207 (stream bridges).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def np_lround(x):
    x = np.asarray(x)
    return np.where(x < 0, -np.floor(-x + 0.5), np.floor(x + 0.5)).astype(np.int64)


def lround_ratio(n, p: int, q: int):
    """Exact lround(n * p / q) for integer n (q > 0), any sign of n."""
    n = jnp.asarray(n).astype(jnp.int32)
    mag = (2 * p * jnp.abs(n) + q) // (2 * q)
    return jnp.where(n < 0, -mag, mag)


def lround_f32(x):
    """std::lround for float input: round half away from zero."""
    x = jnp.asarray(x)
    return jnp.where(x < 0, -jnp.floor(-x + 0.5), jnp.floor(x + 0.5)).astype(jnp.int32)


# ---------------------------------------------------------------------------
# RGB <-> YCbCr (BT.601, float32 + lround, include/io_image.hpp:66-93)
# ---------------------------------------------------------------------------


def rgb_to_ycbcr(rgb):
    """(..., 3) uint8 RGB -> (..., 3) uint8 YCbCr."""
    x = jnp.asarray(rgb).astype(jnp.float32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = jnp.float32(0.299) * r + jnp.float32(0.587) * g + jnp.float32(0.114) * b
    cb = (jnp.float32(-0.168736) * r - jnp.float32(0.331264) * g
          + jnp.float32(0.5) * b + jnp.float32(128.0))
    cr = (jnp.float32(0.5) * r - jnp.float32(0.418688) * g
          - jnp.float32(0.081312) * b + jnp.float32(128.0))
    out = jnp.stack([y, cb, cr], axis=-1)
    return jnp.clip(lround_f32(out), 0, 255).astype(jnp.uint8)


def ycbcr_to_rgb(ycc):
    """(..., 3) uint8 YCbCr -> (..., 3) uint8 RGB."""
    x = jnp.asarray(ycc).astype(jnp.float32)
    y, cb, cr = x[..., 0], x[..., 1] - 128.0, x[..., 2] - 128.0
    r = y + jnp.float32(1.402) * cr
    g = y - jnp.float32(0.344136) * cb - jnp.float32(0.714136) * cr
    b = y + jnp.float32(1.772) * cb
    out = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(lround_f32(out), 0, 255).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# quantization (integer-exact lround, include/io_image.hpp:80-99)
# ---------------------------------------------------------------------------


def quantize_ycbcr(ycc):
    """(..., 3) uint8 YCbCr -> (..., 3) int32 quant [Yq, Cbq, Crq].

    Yq = clamp(lround(Y*242/255), 0, 242)
    Cbq/Crq = clamp(lround((C-128)*40/128), -40, 40)
    """
    x = jnp.asarray(ycc).astype(jnp.int32)
    yq = jnp.clip(lround_ratio(x[..., 0], 242, 255), 0, 242)
    cbq = jnp.clip(lround_ratio(x[..., 1] - 128, 40, 128), -40, 40)
    crq = jnp.clip(lround_ratio(x[..., 2] - 128, 40, 128), -40, 40)
    return jnp.stack([yq, cbq, crq], axis=-1)


def _double_semantics_fixups(p: int, q: int, lo: int, hi: int):
    """Inputs n in [lo, hi] where C++ `lround(n * (double)(p/q))` differs from
    exact-rational lround(n*p/q).

    The C++ pre-rounds the ratio to double (include/io_image.hpp:94-99), so
    exact ties can fall to the other side (e.g. 121*(255.0/242.0) =
    127.49999... -> 127, while the exact 127.5 rounds to 128).  Bit-exactness
    requires replicating the double behavior.
    """
    n = np.arange(lo, hi + 1, dtype=np.int64)
    exact = np.where(n < 0, -((2 * p * np.abs(n) + q) // (2 * q)),
                     (2 * p * np.abs(n) + q) // (2 * q))
    dbl = np_lround(n.astype(np.float64) * (np.float64(p) / np.float64(q)))
    diff = n[exact != dbl]
    return diff, dbl[exact != dbl] if len(diff) else np.zeros(0, np.int64)


_Y_FIX_IN, _Y_FIX_OUT = _double_semantics_fixups(255, 242, 0, 242)
_C_FIX_IN, _C_FIX_OUT = _double_semantics_fixups(128, 40, -40, 40)


def dequantize_ycbcr(q):
    """(..., 3) quant -> (..., 3) uint8 YCbCr (C++ double-lround semantics)."""
    q = jnp.asarray(q).astype(jnp.int32)
    y = lround_ratio(q[..., 0], 255, 242)
    for n_in, n_out in zip(_Y_FIX_IN, _Y_FIX_OUT):
        y = jnp.where(q[..., 0] == int(n_in), jnp.int32(n_out), y)
    cb = lround_ratio(q[..., 1], 128, 40)
    cr = lround_ratio(q[..., 2], 128, 40)
    for n_in, n_out in zip(_C_FIX_IN, _C_FIX_OUT):
        cb = jnp.where(q[..., 1] == int(n_in), jnp.int32(n_out), cb)
        cr = jnp.where(q[..., 2] == int(n_in), jnp.int32(n_out), cr)
    y = jnp.clip(y, 0, 255)
    cb = jnp.clip(128 + cb, 0, 255)
    cr = jnp.clip(128 + cr, 0, 255)
    return jnp.stack([y, cb, cr], axis=-1).astype(jnp.uint8)


def rgb_to_quant(rgb):
    """Full ingest bridge: (..., 3) uint8 RGB -> (..., 3) int32 quant."""
    return quantize_ycbcr(rgb_to_ycbcr(rgb))


def quant_to_rgb(q):
    return ycbcr_to_rgb(dequantize_ycbcr(q))


# ---------------------------------------------------------------------------
# image geometry (NN resize / center blit / center extract)
# ---------------------------------------------------------------------------


def resize_nn(img, dst_h: int, dst_w: int):
    """Nearest-neighbor resize with the C++ center-sample index rule:
    src_i = clamp(int((i+0.5) * src / dst), 0, src-1)  (truncation).
    Exact integer form: ((2i+1) * src) // (2*dst).
    """
    img = jnp.asarray(img)
    sh, sw = img.shape[0], img.shape[1]
    yi = jnp.clip((2 * jnp.arange(dst_h) + 1) * sh // (2 * dst_h), 0, sh - 1)
    xi = jnp.clip((2 * jnp.arange(dst_w) + 1) * sw // (2 * dst_w), 0, sw - 1)
    return img[yi][:, xi]


def blit_center(img, canvas_h: int, canvas_w: int, fill=0):
    """Place img centered in a fill-initialized canvas
    (include/io_image.hpp:125-140)."""
    img = jnp.asarray(img)
    h, w = img.shape[0], img.shape[1]
    y0 = max(0, (canvas_h - h) // 2)
    x0 = max(0, (canvas_w - w) // 2)
    canvas = jnp.full((canvas_h, canvas_w) + img.shape[2:], fill, dtype=img.dtype)
    return canvas.at[y0:y0 + h, x0:x0 + w].set(img[:canvas_h - y0, :canvas_w - x0])


def extract_center(img, sub_h: int, sub_w: int):
    """Centered crop (include/io_image.hpp:215-235)."""
    img = jnp.asarray(img)
    h, w = img.shape[0], img.shape[1]
    y0 = max(0, (h - sub_h) // 2)
    x0 = max(0, (w - sub_w) // 2)
    return img[y0:y0 + sub_h, x0:x0 + sub_w]


def pad_even(w: int) -> int:
    return w if w % 2 == 0 else w + 1


# host oracle np_lround is defined near the top (used by the fixup tables)
