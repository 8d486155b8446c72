"""Legacy container tests: roundtrips + byte-exact differential tests against
golden files written by the compiled C++ reference (tests/oracle/gen_golden_legacy.cpp,
gen_golden_t3proto.cpp)."""
import os

import numpy as np
import pytest

from ternary_image_codec_tpu.config import (ActiveWindow, CosetID, ProfileID,
                                            SubwordMode, centered_window)
from ternary_image_codec_tpu.io import legacy_containers as LC
from ternary_image_codec_tpu.io.containers import ContainerError

GOLD = os.path.join(os.path.dirname(__file__), "golden")


def _ref_lcg_trits(n, seed):
    """Deterministic generator mirrored from the oracle probe."""
    out = np.empty(n, dtype=np.int8)
    s = seed
    for i in range(n):
        s = (s * 1103515245 + 12345) & 0xFFFFFFFF
        out[i] = (s >> 16) % 3
    return out


def _ref_lcg_words(n, seed):
    out = np.empty((n, 9), dtype=np.int8)
    s = seed
    for i in range(n):
        for k in range(9):
            s = (s * 1103515245 + 12345) & 0xFFFFFFFF
            out[i, k] = (s >> 16) % 27
    return out


class TestT3P1New:
    def test_roundtrip(self, tmp_path):
        tr = np.array([0, 1, 2, 2, 1, 0, 1], dtype=np.int8)
        p = str(tmp_path / "x.t3p")
        LC.t3p1_write(p, tr)
        assert np.array_equal(LC.t3p1_read(p), tr)

    def test_layout(self, tmp_path):
        # magic u32 'T3P1' LE | total u32 | base-243 bytes
        p = str(tmp_path / "x.t3p")
        LC.t3p1_write(p, [1, 2, 0, 1, 1, 2])
        raw = open(p, "rb").read()
        assert raw[:4] == b"T3P1"
        assert int.from_bytes(raw[4:8], "little") == 6
        assert raw[8] == 1 + 2 * 3 + 0 * 9 + 1 * 27 + 1 * 81  # first 5 trits
        assert raw[9] == 2  # tail trit zero-padded

    def test_bad_magic(self, tmp_path):
        p = str(tmp_path / "bad.t3p")
        open(p, "wb").write(b"XXXX" + b"\0" * 8)
        with pytest.raises(ContainerError):
            LC.t3p1_read(p)


class TestT3V1New:
    def test_roundtrip(self, tmp_path):
        frames = [_ref_lcg_words(5, 1), _ref_lcg_words(8, 2)]
        p = str(tmp_path / "x.t3v")
        LC.t3v1_write(p, frames)
        got = LC.t3v1_read_all(p)
        assert len(got) == 2
        for a, b in zip(frames, got):
            assert np.array_equal(a, b)


class TestT3POldT3B:
    @pytest.mark.parametrize("n", [0, 4, 5, 123])
    def test_roundtrip(self, tmp_path, n):
        tr = _ref_lcg_trits(n, 3)
        p = str(tmp_path / "x.t3p")
        LC.t3p_old_write(p, SubwordMode.S24, True, 3840, 2160, tr)
        hdr, got = LC.t3p_old_read(p)
        assert np.array_equal(got, tr)
        assert hdr.subword == SubwordMode.S24
        assert hdr.centered and hdr.width == 3840 and hdr.trit_count == n
        assert hdr.tail_trits == n % 5

    def test_t3b_roundtrip(self, tmp_path):
        tr = _ref_lcg_trits(40, 99)
        p = str(tmp_path / "x.t3b")
        LC.t3b_write(p, SubwordMode.S18, False, 1280, 720, tr)
        hdr, got = LC.t3b_read(p)
        assert np.array_equal(got, tr)
        assert not hdr.centered

    def test_byte_exact_vs_reference(self, tmp_path):
        """Python writer must reproduce the oracle's bytes exactly."""
        tr = _ref_lcg_trits(123, 7)
        p = str(tmp_path / "g.t3p")
        LC.t3p_old_write(p, SubwordMode.S21, True, 1920, 1080, tr)
        assert open(p, "rb").read() == open(
            os.path.join(GOLD, "golden_legacy_old.t3p"), "rb").read()

        trb = _ref_lcg_trits(40, 99)
        pb = str(tmp_path / "g.t3b")
        LC.t3b_write(pb, SubwordMode.S18, False, 1280, 720, trb)
        assert open(pb, "rb").read() == open(
            os.path.join(GOLD, "golden_legacy.t3b"), "rb").read()

    def test_read_reference_file(self):
        hdr, tr = LC.t3p_old_read(os.path.join(GOLD, "golden_legacy_old.t3p"))
        assert hdr.subword == SubwordMode.S21
        assert np.array_equal(tr, _ref_lcg_trits(123, 7))

    def test_corruption_detected(self, tmp_path):
        tr = _ref_lcg_trits(20, 1)
        p = str(tmp_path / "x.t3b")
        LC.t3b_write(p, SubwordMode.S27, True, 16, 16, tr)
        raw = bytearray(open(p, "rb").read())
        raw[31] ^= 0x5A  # payload byte
        open(p, "wb").write(bytes(raw))
        with pytest.raises(ContainerError):
            LC.t3b_read(p)


class TestT3VOld:
    def _hdr(self):
        return LC.T3VOldHeader(
            file_type=1, profile=ProfileID.P2_RS26_22,
            subword=SubwordMode.S21, centered=True, coset=CosetID.C1,
            width=7680, height=4320, aw=centered_window(SubwordMode.S21),
            fps_num=30, fps_den=1)

    def test_roundtrip(self, tmp_path):
        frames = [_ref_lcg_words(50 + i, 31 * (i + 1)) for i in range(3)]
        p = str(tmp_path / "x.t3v")
        LC.t3v_old_write(p, self._hdr(), frames)
        hdr, got = LC.t3v_old_read_frames(p)
        assert hdr.profile == ProfileID.P2_RS26_22
        assert hdr.subword == SubwordMode.S21
        assert hdr.coset == CosetID.C1
        assert hdr.fps_num == 30 and hdr.frame_count == 3
        assert hdr.aw == ActiveWindow(2880, 1620, 1920, 1080)
        for a, b in zip(frames, got):
            assert np.array_equal(a, b)

    def test_byte_exact_vs_reference(self, tmp_path):
        frames = [_ref_lcg_words(50 + i, 31 * (i + 1)) for i in range(3)]
        p = str(tmp_path / "g.t3v")
        LC.t3v_old_write(p, self._hdr(), frames)
        assert open(p, "rb").read() == open(
            os.path.join(GOLD, "golden_legacy_old.t3v"), "rb").read()

    def test_read_reference_file(self):
        hdr, frames = LC.t3v_old_read_frames(
            os.path.join(GOLD, "golden_legacy_old.t3v"))
        assert hdr.frame_count == 3 and len(frames) == 3
        assert np.array_equal(frames[2], _ref_lcg_words(52, 93))

    def test_frame_crc_detects_corruption(self, tmp_path):
        p = str(tmp_path / "x.t3v")
        LC.t3v_old_write(p, self._hdr(), [_ref_lcg_words(10, 5)])
        raw = bytearray(open(p, "rb").read())
        raw[54 + 4 + 3] ^= 1  # symbol byte inside frame 0
        open(p, "wb").write(bytes(raw))
        with pytest.raises(ContainerError):
            LC.t3v_old_read_frames(p)

    def test_resume_scan_truncated_tail(self, tmp_path):
        """An interrupted write (partial last frame) resumes at the end of
        the last complete frame; finalize fixes frame_count."""
        frames = [_ref_lcg_words(40 + i, 11 * (i + 1)) for i in range(3)]
        p = str(tmp_path / "x.t3v")
        LC.t3v_old_write(p, self._hdr(), frames)
        full = open(p, "rb").read()
        # chop mid-way through frame 2's payload
        offs, end = LC.t3v_old_resume_scan(p)
        assert len(offs) == 3 and end == len(full)
        open(p, "wb").write(full[:offs[2] + 10])
        offs2, end2 = LC.t3v_old_resume_scan(p)
        assert offs2 == offs[:2] and end2 == offs[2]
        # resume: truncate + re-append frame 2, finalize header
        with open(p, "r+b") as f:
            f.truncate(end2)
            f.seek(0, os.SEEK_END)
            f.write(LC._t3v_old_frame_bytes(frames[2]))
        LC.t3v_old_finalize_header(p, 3)
        assert open(p, "rb").read() == full
        hdr, got = LC.t3v_old_read_frames(p)
        assert hdr.frame_count == 3
        assert all(np.array_equal(a, b) for a, b in zip(frames, got))

    def test_resume_scan_corrupt_tail_frame(self, tmp_path):
        """A corrupt (bad-CRC) last frame is dropped by the resume scan, not
        raised -- that is the restart-after-crash state."""
        frames = [_ref_lcg_words(20 + i, 9 * (i + 1)) for i in range(2)]
        p = str(tmp_path / "x.t3v")
        LC.t3v_old_write(p, self._hdr(), frames)
        offs, _ = LC.t3v_old_resume_scan(p)
        raw = bytearray(open(p, "rb").read())
        raw[offs[1] + 4 + 2] ^= 1
        open(p, "wb").write(bytes(raw))
        offs2, end2 = LC.t3v_old_resume_scan(p)
        assert offs2 == offs[:1] and end2 == offs[1]


class TestT3VI:
    def test_roundtrip(self, tmp_path):
        p = str(tmp_path / "x.t3vi")
        LC.t3vi_write(p, [54, 512, 1030])
        assert LC.t3vi_read(p) == [54, 512, 1030]

    def test_scan_and_index_matches_reference(self, tmp_path):
        got = str(tmp_path / "scan.t3vi")
        n = LC.t3v_scan_and_index(
            os.path.join(GOLD, "golden_legacy_old.t3v"), got)
        assert n == 3
        assert open(got, "rb").read() == open(
            os.path.join(GOLD, "golden_legacy_old.t3vi"), "rb").read()

    def test_offsets_point_at_frames(self):
        t3v = os.path.join(GOLD, "golden_legacy_old.t3v")
        offs = LC.t3vi_read(os.path.join(GOLD, "golden_legacy_old.t3vi"))
        import struct
        with open(t3v, "rb") as f:
            f.seek(offs[1])
            (n,) = struct.unpack("<I", f.read(4))
        assert n == 51


class TestT3Proto:
    def test_roundtrip_both_streams(self, tmp_path):
        bal = (np.arange(77) % 3 - 1).astype(np.int8)
        by, _ = __import__("ternary_image_codec_tpu.ops.trits",
                           fromlist=["np_trits_to_base243"]
                           ).np_trits_to_base243(bal + 1)
        p = str(tmp_path / "x.t3proto")
        meta = '{"proto":"haar","block":8,"n_trits":77,"tail_trits":2}'
        LC.t3proto_write(p, LC.ProtoProfile.HAAR_TERNARY, 64, 48, bal, by, meta)
        prof, w, h, gb, gp, gm = LC.t3proto_read(p)
        assert prof == LC.ProtoProfile.HAAR_TERNARY and (w, h) == (64, 48)
        assert np.array_equal(gb, bal)
        assert np.array_equal(gp, by)
        assert gm == meta

    def test_byte_exact_vs_reference(self, tmp_path):
        bal = (np.arange(77) % 3 - 1).astype(np.int8)
        from ternary_image_codec_tpu.ops.trits import np_trits_to_base243
        by, _ = np_trits_to_base243(bal + 1)
        p = str(tmp_path / "g.t3proto")
        meta = '{"proto":"haar","block":8,"n_trits":77,"tail_trits":2}'
        LC.t3proto_write(p, LC.ProtoProfile.HAAR_TERNARY, 64, 48, bal, by, meta)
        assert open(p, "rb").read() == open(
            os.path.join(GOLD, "golden_legacy.t3proto"), "rb").read()

        p2 = str(tmp_path / "g2.t3proto")
        LC.t3proto_write(p2, LC.ProtoProfile.ANISO_RC, 32, 32, None, by,
                         '{"tail_trits":2}')
        assert open(p2, "rb").read() == open(
            os.path.join(GOLD, "golden_legacy_packonly.t3proto"), "rb").read()

    def test_read_reference_files(self):
        prof, w, h, bal, pack, meta = LC.t3proto_read(
            os.path.join(GOLD, "golden_legacy.t3proto"))
        assert prof == LC.ProtoProfile.HAAR_TERNARY
        assert np.array_equal(bal, (np.arange(77) % 3 - 1).astype(np.int8))

        prof2, w2, h2, bal2, pack2, _ = LC.t3proto_read(
            os.path.join(GOLD, "golden_legacy_packonly.t3proto"))
        assert prof2 == LC.ProtoProfile.ANISO_RC and bal2 is None
        assert pack2 is not None and pack2.size == 16

    def test_ntrits_inference_chain(self):
        f = LC.infer_ntrits_from_meta
        assert f(0, 0, '{"n_trits": 42}', 100) == 42
        assert f(0, 0, '{"len_tiles":30,"len_sketch":12}', 100) == 42
        assert f(65, 33, '{"trits_per_block":10,"block":32}', 0) == 10 * 3 * 2
        assert f(0, 0, '{"tail_trits":2}', 16) == 77
        assert f(0, 0, '{"tail_trits":0}', 16) == 80
        assert f(0, 0, "{}", 16) == 80  # upper bound fallback

    def test_meta_find_int(self):
        assert LC.meta_find_int('{"a": 12, "b":3}', "b") == 3
        assert LC.meta_find_int('{"a": 12}', "missing") is None
        assert LC.meta_find_int('{"a": "str"}', "a") is None
