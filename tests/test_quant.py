"""Quantization + color conversion: differential vs compiled C++ reference.

tests/golden/golden_quant.bin is produced by tests/oracle/gen_golden_quant.cpp
compiled against the read-only reference headers (see tests/oracle/Makefile).
Each 15-byte record: r,g,b, Y,Cb,Cr, Yq,Cbq+64,Crq+64, dY,dCb,dCr, R2,G2,B2.
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from ternary_image_codec_tpu.ops import quant, wordcodec

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden_quant.bin")


@pytest.fixture(scope="module")
def golden():
    rec = np.fromfile(GOLDEN, dtype=np.uint8).reshape(-1, 15)
    return {
        "rgb": rec[:, 0:3],
        "ycc": rec[:, 3:6],
        "quant": np.stack([rec[:, 6].astype(np.int32),
                           rec[:, 7].astype(np.int32) - 64,
                           rec[:, 8].astype(np.int32) - 64], axis=-1),
        "dycc": rec[:, 9:12],
        "rgb2": rec[:, 12:15],
    }


class TestDifferentialVsCpp:
    def test_rgb_to_ycbcr(self, golden):
        got = np.asarray(quant.rgb_to_ycbcr(jnp.asarray(golden["rgb"])))
        mismatch = (got != golden["ycc"]).any(axis=-1)
        assert mismatch.sum() == 0, f"{mismatch.sum()} mismatches of {len(got)}"

    def test_quantize(self, golden):
        got = np.asarray(quant.quantize_ycbcr(jnp.asarray(golden["ycc"])))
        np.testing.assert_array_equal(got, golden["quant"])

    def test_dequantize(self, golden):
        got = np.asarray(quant.dequantize_ycbcr(jnp.asarray(golden["quant"])))
        np.testing.assert_array_equal(got, golden["dycc"])

    def test_ycbcr_to_rgb(self, golden):
        got = np.asarray(quant.ycbcr_to_rgb(jnp.asarray(golden["dycc"])))
        mismatch = (got != golden["rgb2"]).any(axis=-1)
        assert mismatch.sum() == 0, f"{mismatch.sum()} mismatches of {len(got)}"


class TestLround:
    def test_half_away_from_zero(self):
        x = jnp.asarray([0.5, 1.5, -0.5, -1.5, 2.49, -2.49, 0.0])
        np.testing.assert_array_equal(np.asarray(quant.lround_f32(x)),
                                      [1, 2, -1, -2, 2, -2, 0])

    def test_ratio_matches_float(self):
        n = np.arange(-300, 300)
        for p, q in [(242, 255), (40, 128), (255, 242), (128, 40)]:
            want = quant.np_lround(n * p / q)
            got = np.asarray(quant.lround_ratio(jnp.asarray(n), p, q))
            np.testing.assert_array_equal(got, want)


class TestGeometry:
    def test_resize_nn_index_rule(self):
        # C++ rule: sx = int((x+0.5)*src/dst)  (include/io_image.hpp:109-116)
        img = np.arange(10 * 7 * 3, dtype=np.uint8).reshape(10, 7, 3)
        out = np.asarray(quant.resize_nn(jnp.asarray(img), 4, 3))
        for y in range(4):
            sy = min(int((y + 0.5) * 10 / 4), 9)
            for x in range(3):
                sx = min(int((x + 0.5) * 7 / 3), 6)
                np.testing.assert_array_equal(out[y, x], img[sy, sx])

    def test_blit_extract_roundtrip(self):
        img = np.random.default_rng(0).integers(0, 255, (20, 30, 3)).astype(np.uint8)
        canvas = quant.blit_center(jnp.asarray(img), 64, 64)
        back = np.asarray(quant.extract_center(canvas, 20, 30))
        np.testing.assert_array_equal(back, img)
        # border is fill
        assert np.asarray(canvas)[0].max() == 0

    def test_pad_even(self):
        assert quant.pad_even(853) == 854 and quant.pad_even(854) == 854


class TestWordCodecs:
    def rand_quant(self, n, seed=0):
        r = np.random.default_rng(seed)
        return np.stack([r.integers(0, 243, n), r.integers(-40, 41, n),
                         r.integers(-40, 41, n)], axis=-1).astype(np.int32)

    def test_word9_roundtrip(self):
        q = self.rand_quant(1001)
        w = wordcodec.quant_to_words9(jnp.asarray(q))
        assert w.shape == (501, 9)
        back = np.asarray(wordcodec.words9_to_quant(w, n_pixels=1001))
        np.testing.assert_array_equal(back, q)

    def test_word9_trit_layout(self):
        """Y 5 trits @0, Cb+40 4 @5, Cr+40 4 @9; px b at 13; T[26]=0
        (old/.../v6_min.hpp:693-705)."""
        q = np.array([[242, 40, -40], [0, -40, 40]], dtype=np.int32)
        w = np.asarray(wordcodec.quant_to_words9(jnp.asarray(q)))[0]
        trits = []
        for s in w:
            trits += [s % 3, (s // 3) % 3, (s // 9) % 3]
        t = np.array(trits)

        def undig(a):
            return sum(int(v) * 3 ** i for i, v in enumerate(a))
        assert undig(t[0:5]) == 242
        assert undig(t[5:9]) == 80
        assert undig(t[9:13]) == 0
        assert undig(t[13:18]) == 0
        assert undig(t[18:22]) == 0
        assert undig(t[22:26]) == 80
        assert t[26] == 0

    def test_word13_roundtrip(self):
        q = self.rand_quant(777, seed=2)
        w = wordcodec.quant_to_words13(jnp.asarray(q))
        assert w.dtype == jnp.uint32 and int(np.asarray(w).max()) < 3 ** 13
        back = np.asarray(wordcodec.words13_to_quant(w))
        np.testing.assert_array_equal(back, q)

    def test_word13_formula(self):
        q = np.array([[242, 40, 40]], dtype=np.int32)
        assert int(np.asarray(wordcodec.quant_to_words13(jnp.asarray(q)))[0]) == 3 ** 13 - 1

    def test_subword_api_validates(self):
        from ternary_image_codec_tpu.config import SubwordMode
        q = self.rand_quant(4)
        w = wordcodec.encode_raw_pixels_to_words_subword(jnp.asarray(q), SubwordMode.S21)
        back = wordcodec.decode_raw_words_to_pixels_subword(w, SubwordMode.S21)
        np.testing.assert_array_equal(np.asarray(back), q)
        with pytest.raises(ValueError):
            wordcodec.encode_raw_pixels_to_words_subword(jnp.asarray(q), 21)
