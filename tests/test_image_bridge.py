"""Image-pipeline integration tests — pytest ports of minitest_codec.cpp's
three tiers (Test A RAW-N roundtrip +-4, Test B centered canvas with black
borders, Test C centered-window consistency) and minitest_images' matrix
sweep idea, on the word13 and word9 codecs."""
import numpy as np
import pytest
import jax.numpy as jnp

from ternary_image_codec_tpu.config import SubwordMode, std_res_for
from ternary_image_codec_tpu.io import image as I
from ternary_image_codec_tpu.ops import quant as Q
from ternary_image_codec_tpu.ops import wordcodec as WC


def make_rgb_pattern(w, h, c1=(32, 200, 64), c2=(200, 32, 220)):
    """8x8 checkerboard (src/minitest_codec.cpp:31-42)."""
    y, x = np.mgrid[0:h, 0:w]
    a = ((x // 8 + y // 8) % 2) == 0
    out = np.where(a[..., None], np.array(c1, np.uint8),
                   np.array(c2, np.uint8))
    return out.astype(np.uint8)


def _roundtrip(rgb, sub, codec):
    words, (w, h) = I.rgb_to_words(rgb, sub, centered=False, codec=codec)
    return I.words_to_rgb(words, sub, w, h, codec=codec)


class TestARawRoundtrip:
    """Test A (src/minitest_codec.cpp:66-93): encode RAW-N, decode, RGB
    tolerance +-4 per channel."""

    @pytest.mark.parametrize("codec", ["word13", "word9"])
    def test_s15_roundtrip(self, codec):
        w, h = std_res_for(SubwordMode.S15)
        rgb = make_rgb_pattern(w, h)
        out = _roundtrip(rgb, SubwordMode.S15, codec)
        assert out.shape == rgb.shape
        assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 4

    def test_smaller_input_resized_first(self):
        rgb = make_rgb_pattern(100, 60)
        out = _roundtrip(rgb, SubwordMode.S15, "word13")
        w, h = std_res_for(SubwordMode.S15)
        assert out.shape == (h, w, 3)


class TestBCenteredCanvas:
    """Test B (src/minitest_codec.cpp:96-135): inner image centered in outer
    canvas; 16-px borders must decode to pure black."""

    def test_s15_in_s18(self):
        win, hin = std_res_for(SubwordMode.S15)
        wout, hout = std_res_for(SubwordMode.S18)
        rgb_in = make_rgb_pattern(win, hin, (255, 0, 0), (0, 0, 255))
        # centered canvas: resize inner, blit into outer, encode at outer res
        inner = jnp.asarray(rgb_in)
        canvas = np.asarray(Q.blit_center(inner, hout, wout))
        q = Q.rgb_to_quant(jnp.asarray(canvas)).reshape(-1, 3)
        words = WC.encode_raw_pixels_to_words_subword(q, SubwordMode.S18)
        out = I.words_to_rgb(words, SubwordMode.S18, wout, hout)
        m = 16
        assert (out[:m] == 0).all(), "top band must be black"
        assert (out[-m:] == 0).all(), "bottom band must be black"
        assert (out[:, :m] == 0).all(), "left band must be black"
        assert (out[:, -m:] == 0).all(), "right band must be black"
        # the centered window carries the image (within quant tolerance)
        y0, x0 = (hout - hin) // 2, (wout - win) // 2
        center = out[y0:y0 + hin, x0:x0 + win]
        assert np.abs(center.astype(int) - rgb_in.astype(int)).max() <= 4


class TestCCenteredConsistency:
    """Test C in spirit (src/minitest_codec.cpp:138-174): the centered
    window of a canvas-encoded frame must match the direct small encode.

    NB: the reference compares against an NN-*upscaled* small image, which
    cannot match a centered (unscaled) blit for a checkerboard; that test
    never ran (blocked by the reference's ImageU8::swap compile bug).  The
    invariant actually preserved by the pipeline is center-window equality.
    """

    def test_center_window_equals_direct(self):
        ws, hs = std_res_for(SubwordMode.S15)
        wb, hb = std_res_for(SubwordMode.S18)
        rgb = make_rgb_pattern(ws, hs, (20, 200, 40), (210, 30, 230))
        direct = _roundtrip(rgb, SubwordMode.S15, "word13")
        canvas = np.asarray(Q.blit_center(jnp.asarray(rgb), hb, wb))
        q = Q.rgb_to_quant(jnp.asarray(canvas)).reshape(-1, 3)
        words = WC.encode_raw_pixels_to_words_subword(q, SubwordMode.S18)
        big = I.words_to_rgb(words, SubwordMode.S18, wb, hb)
        y0, x0 = (hb - hs) // 2, (wb - ws) // 2
        center = big[y0:y0 + hs, x0:x0 + ws]
        assert np.array_equal(center, direct)


class TestMatrixSweep:
    """minitest_images --matrix idea: every (subword, codec) combination
    roundtrips with CRC-12 signatures stable across runs."""

    @pytest.mark.parametrize("sub", [SubwordMode.S15, SubwordMode.S18])
    @pytest.mark.parametrize("codec", ["word13", "word9"])
    def test_matrix(self, sub, codec):
        from ternary_image_codec_tpu.cli.sigs import crc12_0x80F
        w, h = std_res_for(sub)
        rgb = make_rgb_pattern(w, h)
        words, _ = I.rgb_to_words(rgb, sub, centered=False, codec=codec)
        wn = np.asarray(words)
        raw = (wn.astype("<u4").tobytes() if codec == "word13"
               else wn.astype(np.uint8).tobytes())
        sig1 = crc12_0x80F(raw[:4096])
        words2, _ = I.rgb_to_words(rgb, sub, centered=False, codec=codec)
        wn2 = np.asarray(words2)
        raw2 = (wn2.astype("<u4").tobytes() if codec == "word13"
                else wn2.astype(np.uint8).tobytes())
        assert crc12_0x80F(raw2[:4096]) == sig1

    def test_full_file_roundtrip_via_container(self, tmp_path):
        """PNG -> words -> .t3p -> approve -> decode -> PNG (the minimum
        end-to-end slice, SURVEY.md §7)."""
        from ternary_image_codec_tpu.io import containers as C
        w, h = std_res_for(SubwordMode.S15)
        rgb = make_rgb_pattern(w, h)
        png = str(tmp_path / "in.png")
        I.save_image_png(png, rgb)
        words, (ww, hh) = I.image_to_words_subword(png, SubwordMode.S15,
                                                   centered=False)
        p = str(tmp_path / "x.t3p")
        C.t3p_write(p, SubwordMode.S15, ww, hh, np.asarray(words), "{}")
        approved = []
        got = C.t3p_read_payload(
            p, approve_meta=lambda m: approved.append(m) or True)
        assert approved == ["{}"]
        out_png = str(tmp_path / "out.png")
        I.words_to_image_subword(got, SubwordMode.S15, ww, hh, out_png)
        back = I.load_image_rgb8(out_png)
        assert np.abs(back.astype(int) - rgb.astype(int)).max() <= 4


class TestFusedPlaneIngestEgress:
    """wordcodec.ingest9_planes / egress9_planes (the streaming e2e hot
    path, exact-f32 fused chains) must be bit-exact vs the generic
    rgb_to_quant + quant_to_words9 path -- including the C++
    double-lround dequantization fixups -- over full-range pixels."""

    def _rgb(self, n_px, seed):
        r = np.random.default_rng(seed)
        return r.integers(0, 256, size=(n_px, 3)).astype(np.uint8)

    @pytest.mark.parametrize("n_px", [2 * 4096, 2 * 613])
    def test_ingest_bit_exact(self, n_px):
        rgb = self._rgb(n_px, n_px)
        q = Q.rgb_to_quant(jnp.asarray(rgb))
        words = np.asarray(WC.quant_to_words9(q))          # (m, 9)
        rgbp = jnp.asarray(rgb.reshape(-1, 2, 3).transpose(2, 1, 0))
        wp = np.asarray(WC.ingest9_planes(rgbp))           # (9, m)
        np.testing.assert_array_equal(wp, words.T)

    @pytest.mark.parametrize("n_px", [2 * 4096, 2 * 613])
    def test_egress_bit_exact(self, n_px):
        rgb = self._rgb(n_px, 31 + n_px)
        q = Q.rgb_to_quant(jnp.asarray(rgb))
        words = np.asarray(WC.quant_to_words9(q))
        q2 = WC.words9_to_quant(jnp.asarray(words))
        ref = np.asarray(Q.quant_to_rgb(q2)) \
            .reshape(-1, 2, 3).transpose(2, 1, 0)
        got = np.asarray(WC.egress9_planes(jnp.asarray(words.T)))
        np.testing.assert_array_equal(got, ref)

    def test_boundary_values(self):
        # every (Y, Cb, Cr) extreme incl. the double-lround fixup inputs
        grid = np.stack(np.meshgrid([0, 1, 121, 127, 128, 254, 255],
                                    [0, 128, 255], [0, 128, 255],
                                    indexing="ij"), axis=-1).reshape(-1, 3)
        rgb = np.ascontiguousarray(grid[:len(grid) // 2 * 2]) \
            .astype(np.uint8)
        q = Q.rgb_to_quant(jnp.asarray(rgb))
        words = np.asarray(WC.quant_to_words9(q))
        rgbp = jnp.asarray(rgb.reshape(-1, 2, 3).transpose(2, 1, 0))
        wp = np.asarray(WC.ingest9_planes(rgbp))
        np.testing.assert_array_equal(wp, words.T)
        ref = np.asarray(Q.quant_to_rgb(
            WC.words9_to_quant(jnp.asarray(words)))) \
            .reshape(-1, 2, 3).transpose(2, 1, 0)
        got = np.asarray(WC.egress9_planes(jnp.asarray(words.T)))
        np.testing.assert_array_equal(got, ref)
