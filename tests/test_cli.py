"""CLI tool tests: t3dump, t3proto_tool, main_bare self-tests, signatures."""
import json
import os

import numpy as np
import pytest

from ternary_image_codec_tpu.cli import sigs
from ternary_image_codec_tpu.cli import t3dump
from ternary_image_codec_tpu.cli import t3proto_tool as T3T
from ternary_image_codec_tpu.config import SubwordMode
from ternary_image_codec_tpu.io import containers as C
from ternary_image_codec_tpu.io import legacy_containers as LC


class TestSigs:
    def test_crc12_bit_reference(self):
        """Bit-by-bit reference implementation vs table-driven one."""
        def ref(data):
            poly, crc = 0x80F, 0
            for byte in data:
                for b in range(7, -1, -1):
                    inb = (byte >> b) & 1
                    msb = (crc >> 11) & 1
                    crc = (crc << 1) & 0xFFF
                    if msb ^ inb:
                        crc ^= poly
            return crc
        r = np.random.default_rng(0)
        for n in (0, 1, 7, 64):
            data = bytes(r.integers(0, 256, size=n, dtype=np.uint8))
            assert sigs.crc12_0x80F(data) == ref(data)

    def test_parity(self):
        assert sigs.parity_mod3(bytes([3, 4, 5])) == (0 + 1 + 2) % 3

    def test_native_matches_python(self):
        from ternary_image_codec_tpu.runtime import native
        if not native.available():
            pytest.skip("native toolchain unavailable")
        r = np.random.default_rng(1)
        data = r.integers(0, 256, size=10000, dtype=np.uint8)
        m, k = sigs._tables()
        crc = 0
        for byte in data.tolist():
            crc = int(m[crc]) ^ int(k[byte])
        assert native.crc12_0x80F(data) == crc


class TestNativeRuntime:
    def test_base243_roundtrip(self):
        from ternary_image_codec_tpu.runtime import native
        from ternary_image_codec_tpu.ops.trits import (np_base243_to_trits,
                                                       np_trits_to_base243)
        if not native.available():
            pytest.skip("native toolchain unavailable")
        r = np.random.default_rng(2)
        tr = r.integers(0, 3, size=123).astype(np.uint8)
        nb, ntail = native.pack_base243(tr)
        pb, ptail = np_trits_to_base243(tr)
        assert ntail == ptail and np.array_equal(nb, pb)
        back = native.unpack_base243(nb, 123)
        assert np.array_equal(back, tr.astype(np.int8))

    def test_pack13_matches_device(self):
        from ternary_image_codec_tpu.runtime import native
        from ternary_image_codec_tpu.ops import wordcodec as WC
        if not native.available():
            pytest.skip("native toolchain unavailable")
        r = np.random.default_rng(3)
        q = np.stack([r.integers(0, 243, 50), r.integers(-40, 41, 50),
                      r.integers(-40, 41, 50)], axis=-1).astype(np.int32)
        codes = native.pack13(q[:, 0], q[:, 1], q[:, 2])
        dev = np.asarray(WC.quant_to_words13(q))
        assert np.array_equal(codes, dev.astype(np.uint32))
        back = native.unpack13(codes)
        assert np.array_equal(back, q)


@pytest.fixture
def t3p_file(tmp_path):
    r = np.random.default_rng(0)
    words = r.integers(0, 3 ** 13, size=1280 * 720, dtype=np.uint32)
    p = str(tmp_path / "x.t3p")
    C.t3p_write(p, SubwordMode.S18, 1280, 720, words, '{"k":1}')
    return p, words


class TestT3Dump:
    def test_info_json(self, t3p_file, capsys):
        p, words = t3p_file
        assert t3dump.main([p, "--json"]) == 0
        out = json.loads(capsys.readouterr().out)
        assert out["t3p"]["mode"] == "S18"
        assert out["t3p"]["words"] == words.size
        raw = words.astype("<u4").tobytes()
        assert out["t3p"]["crc12_raw"] == f"{sigs.crc12_0x80F(raw):03X}"
        assert out["t3p"]["parity3"] == sigs.parity_mod3(raw)

    def test_extract_png(self, t3p_file, tmp_path, capsys):
        p, _ = t3p_file
        out = str(tmp_path / "f.png")
        assert t3dump.main([p, "--extract-png", "0", "--out", out]) == 0
        from PIL import Image
        with Image.open(out) as im:
            assert im.size == (1280, 720)

    def test_t3v_info_and_extract_all(self, tmp_path, capsys):
        r = np.random.default_rng(1)
        frames = [r.integers(0, 3 ** 13, size=854 * 480, dtype=np.uint32)
                  for _ in range(2)]
        p = str(tmp_path / "v.t3v")
        C.t3v_write(p, SubwordMode.S15, 854, 480, frames, '{"fps":30}')
        assert t3dump.main([p, "--json"]) == 0
        out = json.loads(capsys.readouterr().out)
        assert out["t3v"]["frames"] == 2
        assert out["t3v"]["words_total"] == 2 * 854 * 480
        outdir = str(tmp_path / "frames")
        assert t3dump.main([p, "--extract-png", "all",
                            "--outdir", outdir]) == 0
        assert sorted(os.listdir(outdir)) == ["frame_0000.png",
                                              "frame_0001.png"]

    def test_bad_extension(self, tmp_path):
        assert t3dump.main([str(tmp_path / "x.bin")]) == 2


@pytest.fixture
def proto_file(tmp_path):
    """A Haar-encoded t3proto via the CLI itself (needs a PNG input)."""
    from ternary_image_codec_tpu.io import image as I
    r = np.random.default_rng(7)
    rgb = r.integers(0, 256, size=(40, 64, 3)).astype(np.uint8)
    png = str(tmp_path / "in.png")
    I.save_image_png(png, rgb)
    out = str(tmp_path / "s.t3proto")
    assert T3T.main(["encode", "--in", png, "--out", out,
                     "--profile", "haar"]) == 0
    return out


class TestT3ProtoTool:
    def test_info(self, proto_file, capsys):
        capsys.readouterr()
        assert T3T.main(["info", proto_file, "--json"]) == 0
        out = json.loads(capsys.readouterr().out)
        assert out["t3proto"]["profile"] == "HaarTernary"
        assert out["t3proto"]["W"] == 64 and out["t3proto"]["H"] == 40
        assert out["t3proto"]["trits"] > 0 and out["t3proto"]["bytes"] > 0

    def test_export_roundtrip(self, proto_file, tmp_path):
        bal_f = str(tmp_path / "bal.bin")
        unb_f = str(tmp_path / "unb.bin")
        assert T3T.main(["export-bal", proto_file, "--out", bal_f]) == 0
        assert T3T.main(["export-unb", proto_file, "--out", unb_f]) == 0
        bal = np.fromfile(bal_f, dtype=np.int8)
        unb = np.fromfile(unb_f, dtype=np.uint8)
        assert np.array_equal(unb.astype(np.int16) - 1, bal)

    def test_repack_pack_only_then_recover_balanced(self, proto_file,
                                                    tmp_path):
        packed_only = str(tmp_path / "p.t3proto")
        # drop the balanced stream, keep packed
        assert T3T.main(["repack", proto_file, "--to", "packed",
                         "--out", packed_only]) == 0
        _, _, _, bal, _, _ = LC.t3proto_read(packed_only)
        assert bal is None or bal.size == 0
        # now recover balanced exactly via meta counts (strict must pass)
        back = str(tmp_path / "b.t3proto")
        assert T3T.main(["repack", packed_only, "--to", "balanced",
                         "--strict", "--out", back]) == 0
        _, _, _, bal2, _, _ = LC.t3proto_read(back)
        _, _, _, bal0, _, _ = LC.t3proto_read(proto_file)
        assert np.array_equal(bal2, bal0)

    def test_cat(self, proto_file, tmp_path, capsys):
        merged = str(tmp_path / "m.t3proto")
        assert T3T.main(["cat", "--out", merged, proto_file,
                         proto_file]) == 0
        _, w, h, bal, packed, meta = LC.t3proto_read(merged)
        _, _, _, bal0, packed0, _ = LC.t3proto_read(proto_file)
        assert bal.size == 2 * bal0.size
        assert packed.size == 2 * packed0.size
        assert len(json.loads(meta)["concat"]) == 2

    def test_repack_guess_vs_strict(self, tmp_path):
        # a pack-only file with no counts meta: strict fails, guess works
        by = np.arange(16, dtype=np.uint8)
        p = str(tmp_path / "nc.t3proto")
        LC.t3proto_write(p, LC.ProtoProfile.NONE, 4, 4, None, by, "{}")
        out = str(tmp_path / "o.t3proto")
        assert T3T.main(["repack", p, "--to", "balanced", "--strict",
                         "--out", out]) == 1
        assert T3T.main(["repack", p, "--to", "balanced", "--guess",
                         "--out", out]) == 0
        _, _, _, bal, _, _ = LC.t3proto_read(out)
        assert bal.size == 16 * 5

    def test_meta_upsert_counts(self):
        m = T3T.meta_upsert_counts('{"a":1}', 10, 2, 0, True)
        d = json.loads(m)
        assert d["a"] == 1 and d["counts"]["n_trits"] == 10
        m2 = T3T.meta_upsert_counts(m, 15, 3, 0, False)
        d2 = json.loads(m2)
        assert d2["counts"]["n_trits"] == 15
        assert d2["counts"]["exact_n_trits"] is False


class TestMainBare:
    def test_selftests_and_demo(self, tmp_path, capsys):
        from ternary_image_codec_tpu.cli import main_bare
        rc = main_bare.main(["--outdir", str(tmp_path)])
        out = capsys.readouterr().out
        assert rc == 0
        assert "RS unit: OK" in out and "API roundtrip: OK" in out
        frames = LC.t3v1_read_all(str(tmp_path / "demo_s21.t3v"))
        assert len(frames) == 1 and frames[0].shape == (5, 9)  # 10 px, 2/word
        tr = LC.t3p1_read(str(tmp_path / "demo_s21.t3p"))
        assert tr.size == 5 * 21


class TestMinitestT3Containers:
    def test_report_small_modes(self, tmp_path, capsys):
        from ternary_image_codec_tpu.cli import minitest_t3containers as MT
        rc = MT.main(["--modes", "S15", "--outdir", str(tmp_path)])
        rep = json.loads(capsys.readouterr().out)["t3containers"]
        assert rc == 0 and rep["final_status"] == "PASS"
        (case,) = rep["t3p"]
        assert case["mode"] == "S15" and case["equal"]
        assert len(case["crc12_raw"]) == 3  # 3-hex-digit CRC-12 signature
        assert rep["t3v"]["frames"] == 3 and rep["t3v"]["fps_r"] == 25.0
        # artifacts really exist on disk (write/read went through T3P6/T3V6)
        assert (tmp_path / "test_S15.t3p").exists()
        assert (tmp_path / "test_S21.t3v").exists()


class TestMainVideoT3VResume:
    def test_resume_after_interrupt(self, tmp_path, capsys):
        """Interrupted encode (partial tail frame) + --resume reproduces the
        byte-exact container a single uninterrupted run writes (frame-level
        checkpoint/resume via the container index, SURVEY.md section 5)."""
        from ternary_image_codec_tpu.cli import main_video_t3v as MV
        from ternary_image_codec_tpu.io import image as I
        r = np.random.default_rng(3)
        pngs = []
        for i in range(2):
            p = str(tmp_path / f"in{i}.png")
            I.save_image_png(
                p, r.integers(0, 256, size=(16, 16, 3)).astype(np.uint8))
            pngs.append(p)
        full = str(tmp_path / "full.t3v")
        fdir = str(tmp_path / "frames")
        assert MV.main(pngs + [full, "--frames-dir", fdir]) == 0
        want = open(full, "rb").read()
        offs = LC.t3vi_read(full + ".t3vi")
        assert len(offs) == 2

        # simulate a crash mid-frame-1: header + frame 0 + 7 stray bytes
        part = str(tmp_path / "part.t3v")
        open(part, "wb").write(want[:offs[1] + 7])
        capsys.readouterr()
        assert MV.main(pngs + [part, "--frames-dir", fdir, "--resume"]) == 0
        assert "resuming" in capsys.readouterr().out
        assert open(part, "rb").read() == want
        assert LC.t3vi_read(part + ".t3vi") == offs
        hdr, frames = LC.t3v_old_read_frames(part)
        assert hdr.frame_count == 2 and len(frames) == 2
