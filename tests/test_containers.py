"""T3P6/T3V6 container tests: byte-exact diff against reference-written
golden files (tests/oracle/gen_golden_t3p.cpp compiled against
/root/reference/src/io_t3p_t3v.cpp) plus roundtrip & security-gate tests."""
import os

import numpy as np
import pytest

from ternary_image_codec_tpu.config import SubwordMode
from ternary_image_codec_tpu.io import containers as C

GOLD = os.path.join(os.path.dirname(__file__), "golden")


def ref_words(n=100):
    i = np.arange(n, dtype=np.uint64)
    return ((i * 2654435761) % 1594323).astype(np.uint32)


def ref_frames():
    out = []
    for fi in range(3):
        i = np.arange(40 + fi, dtype=np.uint64)
        out.append(((i * 31 + fi * 7) % 1594323).astype(np.uint32))
    return out


META = '{"domain":"test.example","route_ttl":3,"route_phase":0}'


class TestByteExactness:
    def test_t3p_bytes_match_reference(self, tmp_path):
        p = str(tmp_path / "mine.t3p")
        C.t3p_write(p, SubwordMode.S21, 1920, 1080, ref_words(), META)
        mine = open(p, "rb").read()
        ref = open(os.path.join(GOLD, "golden_ref.t3p"), "rb").read()
        # bytes 22..25 are the header CRC: the reference CRCs uninitialized
        # struct padding, so that field is garbage in reference files
        # (docs/DIVERGENCES.md #9); everything else must match exactly.
        assert len(mine) == len(ref)
        assert mine[:22] == ref[:22] and mine[26:] == ref[26:]

    def test_t3p_empty_bytes_match(self, tmp_path):
        p = str(tmp_path / "empty.t3p")
        C.t3p_write(p, SubwordMode.S27, 0, 0, np.zeros(0, np.uint32), "")
        mine = open(p, "rb").read()
        ref = open(os.path.join(GOLD, "golden_ref_empty.t3p"), "rb").read()
        assert len(mine) == len(ref)
        assert mine[:22] == ref[:22] and mine[26:] == ref[26:]

    def test_t3v_bytes_match_reference(self, tmp_path):
        p = str(tmp_path / "mine.t3v")
        C.t3v_write(p, SubwordMode.S18, 1280, 720, ref_frames(),
                    '{"fps":30}', ['{"f":0}', '{"f":1}', '{"f":2}'])
        mine = open(p, "rb").read()
        ref = open(os.path.join(GOLD, "golden_ref.t3v"), "rb").read()
        assert len(mine) == len(ref)
        assert mine[:22] == ref[:22] and mine[26:] == ref[26:]

    def test_read_reference_file(self):
        sub, w, h, meta, n = C.t3p_read_header(
            os.path.join(GOLD, "golden_ref.t3p"), check_header_crc=False)
        assert (sub, w, h, n) == (SubwordMode.S21, 1920, 1080, 100)
        assert meta == META
        words = C.t3p_read_payload(os.path.join(GOLD, "golden_ref.t3p"),
                                   check_header_crc=False)
        np.testing.assert_array_equal(words, ref_words())

    def test_read_reference_t3v(self):
        path = os.path.join(GOLD, "golden_ref.t3v")
        sub, w, h, metag, fc, idx = C.t3v_read_header(path, check_header_crc=False)
        assert (sub, w, h, metag, fc) == (SubwordMode.S18, 1280, 720, '{"fps":30}', 3)
        for i, frame in enumerate(ref_frames()):
            got = C.t3v_read_frame(path, i, check_header_crc=False)
            np.testing.assert_array_equal(got, frame)


class TestRoundtripAndGates:
    def test_t3p_roundtrip(self, tmp_path):
        p = str(tmp_path / "x.t3p")
        w = ref_words(7)
        C.t3p_write(p, SubwordMode.S15, 854, 480, w, '{"a":1}')
        sub, W, H, meta, n = C.t3p_read_header(p)
        assert (sub, W, H, meta, n) == (SubwordMode.S15, 854, 480, '{"a":1}', 7)
        np.testing.assert_array_equal(C.t3p_read_payload(p), w)

    def test_approve_gate_blocks_payload(self, tmp_path):
        p = str(tmp_path / "x.t3p")
        C.t3p_write(p, SubwordMode.S27, 4, 4, ref_words(8), '{"deny":true}')
        seen = []

        def deny(meta):
            seen.append(meta)
            return False

        with pytest.raises(C.ContainerError, match="not approved"):
            C.t3p_read_payload(p, approve_meta=deny)
        assert seen == ['{"deny":true}']

    def test_t3v_frame_gate(self, tmp_path):
        p = str(tmp_path / "x.t3v")
        C.t3v_write(p, SubwordMode.S27, 2, 2, ref_frames(), "", ["a", "b", "c"])
        got = C.t3v_read_frame(p, 1, approve_meta=lambda m: m == "b")
        np.testing.assert_array_equal(got, ref_frames()[1])
        with pytest.raises(C.ContainerError, match="not approved"):
            C.t3v_read_frame(p, 2, approve_meta=lambda m: m == "b")

    def test_corruption_detected(self, tmp_path):
        p = str(tmp_path / "x.t3p")
        C.t3p_write(p, SubwordMode.S27, 4, 4, ref_words(8), "meta")
        raw = bytearray(open(p, "rb").read())
        raw[-6] ^= 0xFF  # payload byte
        open(p, "wb").write(bytes(raw))
        with pytest.raises(C.ContainerError, match="payload crc"):
            C.t3p_read_payload(p)
        raw = bytearray(open(p, "rb").read())
        raw[8] ^= 0x01  # header field
        open(p, "wb").write(bytes(raw))
        with pytest.raises(C.ContainerError, match="header crc"):
            C.t3p_read_header(p)

    def test_t3v_oob_frame(self, tmp_path):
        p = str(tmp_path / "x.t3v")
        C.t3v_write(p, SubwordMode.S27, 2, 2, [ref_words(4)], "")
        with pytest.raises(C.ContainerError, match="OOB"):
            C.t3v_read_frame(p, 5)

    def test_bad_magic(self, tmp_path):
        p = str(tmp_path / "x.t3p")
        open(p, "wb").write(b"NOPE" + b"\x00" * 30)
        with pytest.raises(C.ContainerError, match="magic"):
            C.t3p_read_header(p)


class TestNativeCrc32:
    def test_native_crc32_matches_zlib(self):
        """The container CRC is routed through the native PCLMUL kernel
        when available; it must be bit-identical to zlib across sizes
        (block boundaries at 64/16 bytes), inits, and buffer types."""
        import zlib
        import numpy as np
        from ternary_image_codec_tpu.io.containers import _crc32
        r = np.random.default_rng(11)
        for n in (0, 1, 3, 15, 16, 17, 63, 64, 65, 255, 256, 257, 300,
                  511, 512, 1000, 4097, 1 << 16):
            buf = r.integers(0, 256, n, dtype=np.uint8)
            for init in (0, 1, 0xFFFFFFFF, 0xDEADBEEF):
                want = zlib.crc32(buf.tobytes(), init) & 0xFFFFFFFF
                assert _crc32(buf.tobytes(), init) == want, (n, init)
                assert _crc32(buf, init) == want, (n, init)       # ndarray
                assert _crc32(memoryview(buf), init) == want, (n, init)
