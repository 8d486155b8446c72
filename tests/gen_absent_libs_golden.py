"""Regenerate tests/golden/golden_absent_libs.npz.

The expected values only exercise the device ingest pipeline (NN resize +
BT.601 quant + word13 pack -- io/image.rgb_to_words), not the absent
libraries, so the golden is generable on any machine:

    JAX_PLATFORMS=cpu python tests/gen_absent_libs_golden.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from ternary_image_codec_tpu.config import SubwordMode
    from ternary_image_codec_tpu.io import image as I
    from test_absent_libs import _pattern_rgb

    rgb = _pattern_rgb()
    words, (ew, eh) = I.rgb_to_words(rgb, SubwordMode.S15, False)
    out = os.path.join(os.path.dirname(__file__), "golden",
                       "golden_absent_libs.npz")
    np.savez_compressed(out, exr_words=np.asarray(words),
                        exr_wh=np.asarray([ew, eh]))
    print(f"wrote {out}: words {np.asarray(words).shape} wh=({ew},{eh})")


if __name__ == "__main__":
    main()
