"""Video writer + optional format adapter tests."""
import os

import numpy as np
import pytest
import jax.numpy as jnp

from ternary_image_codec_tpu.config import SubwordMode
from ternary_image_codec_tpu.io import formats as F
from ternary_image_codec_tpu.io import image as I
from ternary_image_codec_tpu.io import video as V
from ternary_image_codec_tpu.ops import wordcodec as WC


def _frames(n=3, w=64, h=36):
    y, x = np.mgrid[0:h, 0:w]
    out = []
    for f in range(n):
        q = np.stack([(x + f) % 243, (y - f) % 81 - 40,
                      (x + y + f) % 81 - 40], axis=-1).astype(np.int32)
        out.append(np.asarray(WC.encode_raw_pixels_to_words_subword(
            jnp.asarray(q.reshape(-1, 3)), SubwordMode.S21)))
    return out


class TestVideoWriter:
    def test_stub_when_unavailable(self, tmp_path, monkeypatch):
        """Without ffmpeg the writer must degrade exactly like the
        reference's compile-gated stub: open fails, helpers return None."""
        monkeypatch.setattr(V, "ffmpeg_available", lambda: False)
        wr = V.FFVideoWriter()
        assert not wr.open(str(tmp_path / "x.mp4"), V.FFVideoConfig(width=64, height=36))
        st = V.write_video_from_words_sequence(
            str(tmp_path / "x.mp4"), V.FFVideoConfig(width=64, height=36),
            _frames(1), SubwordMode.S21, 64, 36)
        assert st is None

    def test_png_sequence_fallback(self, tmp_path):
        frames = _frames(3)
        paths = V.write_png_sequence_from_words(str(tmp_path / "seq"),
                                                frames, SubwordMode.S21,
                                                64, 36)
        assert len(paths) == 3
        rgb = I.load_image_rgb8(paths[0])
        assert rgb.shape == (36, 64, 3)

    @pytest.mark.skipif(not V.ffmpeg_available(), reason="no ffmpeg")
    def test_real_encode(self, tmp_path):
        frames = _frames(5)
        cfg = V.FFVideoConfig(width=64, height=36, fps=30.0, preset="veryfast")
        st = V.write_video_from_words_sequence(
            str(tmp_path / "v.mp4"), cfg, frames, SubwordMode.S21, 64, 36)
        assert st is not None and st.frames_written == 5
        assert os.path.getsize(tmp_path / "v.mp4") > 0

    def test_demo_cli_fallback(self, tmp_path, monkeypatch, capsys):
        from ternary_image_codec_tpu.cli import demo_write_video as D
        monkeypatch.setattr(V, "ffmpeg_available", lambda: False)
        rc = D.main(["--out", str(tmp_path / "d.mp4"), "--frames", "2",
                     "--png-dir", str(tmp_path / "pngs")])
        assert rc == 0
        assert len(os.listdir(tmp_path / "pngs")) == 2


class TestFormats:
    def test_availability_probes(self):
        assert isinstance(F.format_available("tiff"), bool)
        assert F.format_available("tiff")  # PIL is baked in
        assert not F.format_available("nope")

    def test_tiff_words_roundtrip(self, tmp_path):
        r = np.random.default_rng(0)
        rgb = r.integers(0, 256, size=(480, 854, 3)).astype(np.uint8)
        src = str(tmp_path / "in.tiff")
        from PIL import Image
        Image.fromarray(rgb, "RGB").save(src, format="TIFF")
        words, (w, h) = F.image_file_to_words(src, "tiff", SubwordMode.S15,
                                              centered=False)
        assert (w, h) == (854, 480)
        out = str(tmp_path / "out.tiff")
        F.words_to_image_file(words, "tiff", SubwordMode.S15, 854, 480, out)
        back = I.load_image_rgb8(out)
        # quantization is lossy (Y 243 levels, chroma 81): small tolerance
        assert back.shape == rgb.shape
        assert np.abs(back.astype(int) - rgb.astype(int)).max() <= 6

    def test_heif_unavailable_raises(self, tmp_path):
        if F.format_available("heif"):
            pytest.skip("pillow-heif present; stub path not reachable")
        with pytest.raises(F.FormatUnavailable):
            F.image_file_to_words(str(tmp_path / "x.heif"), "heif",
                                  SubwordMode.S15, False)

    @pytest.mark.skipif(not F.format_available("exr"), reason="no EXR backend")
    def test_exr_load(self, tmp_path):
        import imageio.v3 as iio
        f = np.random.default_rng(1).random((8, 8, 3)).astype(np.float32)
        p = str(tmp_path / "x.exr")
        try:
            iio.imwrite(p, f)
        except (OSError, ValueError, TypeError) as e:
            pytest.skip(f"imageio cannot write EXR here: {e}")
        rgb = F._load_exr(p)
        assert rgb.shape == (8, 8, 3) and rgb.dtype == np.uint8


def _fake_openexr(store):
    """Minimal stand-in for the classic OpenEXR/Imath python bindings
    (InputFile/OutputFile API) backed by an in-memory dict, so the OpenEXR
    branch is exercised even where the real module is absent (it is absent
    in this environment, like the reference's compile-gated backends)."""
    import types

    class _Pt:
        FLOAT = "FLOAT"

        def __init__(self, kind=None):
            self.kind = kind

    imath = types.ModuleType("Imath")
    imath.PixelType = _Pt
    imath.Channel = lambda pt: ("chan", pt.kind)

    class _Box:
        def __init__(self, w, h):
            self.min = types.SimpleNamespace(x=0, y=0)
            self.max = types.SimpleNamespace(x=w - 1, y=h - 1)

    class _In:
        def __init__(self, path):
            self._d = store[path]

        def header(self):
            w, h = self._d["size"]
            return {"dataWindow": _Box(w, h),
                    "channels": {c: None for c in self._d["planes"]}}

        def channel(self, name, pt):
            return self._d["planes"][name].tobytes()

    class _Out:
        def __init__(self, path, hdr):
            self._path, self._hdr = path, hdr
            dw = hdr["dataWindow"]
            self._size = (dw.max.x + 1, dw.max.y + 1)

        def writePixels(self, chans):
            w, h = self._size
            store[self._path] = {"size": (w, h), "planes": {
                c: np.frombuffer(b, np.float32).reshape(h, w).copy()
                for c, b in chans.items()}}

        def close(self):
            pass

    mod = types.ModuleType("OpenEXR")
    mod.InputFile = _In
    mod.OutputFile = _Out
    mod.Header = lambda w, h: {"dataWindow": _Box(w, h), "channels": {}}
    return mod, imath


class TestOpenEXRBranch:
    """The OpenEXR-bindings EXR path (preferred over imageio when present),
    run against a faithful fake of the classic API."""

    def _patch(self, monkeypatch):
        import sys
        store = {}
        mod, imath = _fake_openexr(store)
        monkeypatch.setitem(sys.modules, "OpenEXR", mod)
        monkeypatch.setitem(sys.modules, "Imath", imath)
        return store

    def test_save_load_roundtrip(self, monkeypatch, tmp_path):
        self._patch(monkeypatch)
        assert F.format_available("exr")
        rgb = np.random.default_rng(2).integers(
            0, 256, size=(6, 10, 3)).astype(np.uint8)
        p = str(tmp_path / "m.exr")
        F._save("exr", p, rgb)
        back = F._load_exr(p)
        # u8 -> f32/255 -> lround(f*255) is exact
        assert np.array_equal(back, rgb)

    def test_grayscale_y_replicates(self, monkeypatch):
        store = self._patch(monkeypatch)
        y = np.linspace(0.0, 1.0, 12, dtype=np.float32).reshape(3, 4)
        store["g.exr"] = {"size": (4, 3), "planes": {"Y": y}}
        rgb = F._load_exr("g.exr")
        assert rgb.shape == (3, 4, 3)
        assert np.array_equal(rgb[..., 0], rgb[..., 1])
        assert np.array_equal(rgb[..., 0], rgb[..., 2])

    def test_out_of_range_clamps(self, monkeypatch):
        """The reference maps via clamp(lround(v*255), 0, 255)
        (src/io_tiff_exr.cpp:124-127): HDR overshoot saturates."""
        store = self._patch(monkeypatch)
        v = np.asarray([[-0.5, 0.0], [1.0, 3.7]], dtype=np.float32)
        store["h.exr"] = {"size": (2, 2), "planes": {
            "R": v, "G": v, "B": v}}
        rgb = F._load_exr("h.exr")
        assert rgb[..., 0].tolist() == [[0, 0], [255, 255]]

    def test_words_bridge_via_openexr(self, monkeypatch, tmp_path):
        self._patch(monkeypatch)
        rgb = np.random.default_rng(3).integers(
            0, 256, size=(480, 854, 3)).astype(np.uint8)
        src = str(tmp_path / "in.exr")
        F._save("exr", src, rgb)
        words, (w, h) = F.image_file_to_words(src, "exr", SubwordMode.S15,
                                              centered=False)
        assert (w, h) == (854, 480)
        out = str(tmp_path / "out.exr")
        F.words_to_image_file(words, "exr", SubwordMode.S15, 854, 480, out)
        back = F._load_exr(out)
        assert np.abs(back.astype(int) - rgb.astype(int)).max() <= 6
