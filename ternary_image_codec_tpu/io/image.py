"""Image file <-> RAW word bridge (PNG/JPG via PIL; device quant pipeline).

Mirror of include/io_image.hpp's bridge (238-353), TPU-split: file decode on
host (PIL -> uint8 array), color conversion / quantization / packing on
device (ops/quant.py + ops/wordcodec.py), PNG/JPG save on host.

Flow parity (include/io_image.hpp:238-300):
  image_to_words_subword: load -> NN-resize to std res -> if centered and
  sub != S27: blit into 8K canvas -> quantize -> encode (full S27 frame);
  else: direct quantize+encode at target size.
Decode mirror (include/io_image.hpp:304-337): exact-size direct / S27
center-extract / best-effort.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..config import SubwordMode, std_res_for
from ..ops import quant as Q
from ..ops import wordcodec as WC


def load_image_rgb8(path: str) -> np.ndarray:
    """-> (h, w, 3) uint8."""
    from PIL import Image
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def save_image_png(path: str, rgb: np.ndarray) -> None:
    from PIL import Image
    Image.fromarray(np.asarray(rgb, dtype=np.uint8), "RGB").save(path, "PNG")


def save_image_jpg(path: str, rgb: np.ndarray, quality: int = 90) -> None:
    from PIL import Image
    Image.fromarray(np.asarray(rgb, dtype=np.uint8), "RGB").save(
        path, "JPEG", quality=quality)


def rgb_to_words(rgb, sub: SubwordMode, centered: bool,
                 codec: str = "word13"):
    """(h, w, 3) uint8 -> device word array (+ the shape actually encoded).

    Device path of image_to_words_subword (post-load).
    """
    rgb = jnp.asarray(rgb)
    tw, th = std_res_for(sub)
    if rgb.shape[0] != th or rgb.shape[1] != tw:
        rgb = Q.resize_nn(rgb, th, tw)
    if centered and sub != SubwordMode.S27:
        bw, bh = std_res_for(SubwordMode.S27)
        rgb = Q.blit_center(rgb, bh, bw)
        enc_w, enc_h = bw, bh
    else:
        enc_w, enc_h = tw, th
    q = Q.rgb_to_quant(rgb).reshape(-1, 3)
    words = WC.encode_raw_pixels_to_words_subword(q, sub, codec=codec)
    return words, (enc_w, enc_h)


def words_to_rgb(words, sub: SubwordMode, w: int, h: int,
                 codec: str = "word13") -> np.ndarray:
    """Device decode mirror: words -> (h, w, 3) uint8 RGB.

    Handles the three reference cases: exact target size, full-S27 frame
    (center-extract), best-effort (include/io_image.hpp:304-337).
    """
    q = WC.decode_raw_words_to_pixels_subword(jnp.asarray(words), sub,
                                              codec=codec)
    bw, bh = std_res_for(SubwordMode.S27)
    n = int(q.shape[0])
    if n == w * h:
        rgb = Q.quant_to_rgb(q).reshape(h, w, 3)
    elif n == bw * bh and sub != SubwordMode.S27:
        tw, th = std_res_for(sub)
        full = q.reshape(bh, bw, 3)
        sub_q = Q.extract_center(full, th, tw)
        rgb = Q.quant_to_rgb(sub_q.reshape(-1, 3)).reshape(th, tw, 3)
        if (th, tw) != (h, w):
            rgb = Q.resize_nn(rgb, h, w)
    else:
        # best-effort: take/pad to w*h
        m = w * h
        qf = q.reshape(-1, 3)
        if n < m:
            qf = jnp.pad(qf, ((0, m - n), (0, 0)))
        rgb = Q.quant_to_rgb(qf[:m]).reshape(h, w, 3)
    return np.asarray(rgb)


def image_to_words_subword(path: str, sub: SubwordMode, centered: bool,
                           codec: str = "word13"):
    """File -> words (include/io_image.hpp:238-300)."""
    rgb = load_image_rgb8(path)
    return rgb_to_words(rgb, sub, centered, codec)


def words_to_image_subword(words, sub: SubwordMode, w: int, h: int,
                           out_path_png: str, codec: str = "word13") -> None:
    """Words -> PNG file (include/io_image.hpp:304-337)."""
    save_image_png(out_path_png, words_to_rgb(words, sub, w, h, codec))
