"""Profile pipeline roundtrip tests (port of selftest_api_roundtrip,
old/include/ternary_image_codec_v6_min.hpp:1208-1230 -- must PASS here)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from ternary_image_codec_tpu.config import (EncoderConfig, ProfileID,
                                            ScramblerSeed, SparseBeaconCfg,
                                            Tile2D, uep_luma_priority,
                                            uep_uniform)
from ternary_image_codec_tpu.ops import pipeline


def make_raw_words(n, seed=0):
    r = np.random.default_rng(seed)
    t = r.integers(0, 3, size=(n, 27)).astype(np.int8)
    t[:, 26] = 0  # spare trit always zero in RAW words
    syms = (t.reshape(n, 9, 3) * np.array([1, 3, 9])).sum(-1)
    return syms.astype(np.int8)


def check_roundtrip(cfg, n_raw=32, seed=0):
    raw = make_raw_words(n_raw, seed)
    prof = pipeline.encode_profile_from_raw(jnp.asarray(raw), cfg)
    out, hdr, ok = pipeline.decode_profile_to_raw(prof)
    assert ok, "decode flagged failure"
    out = np.asarray(out)
    L = min(len(raw), len(out))
    np.testing.assert_array_equal(out[:L], raw[:L])
    assert len(out) >= len(raw)
    return prof, hdr


class TestApiRoundtrip:
    def test_p2_luma_priority(self):
        """The selftest_api_roundtrip configuration: 64 px -> 32 raw words,
        P2 + luma-priority UEP."""
        cfg = EncoderConfig(profile=ProfileID.P2_RS26_22,
                            uep=uep_luma_priority())
        prof, hdr = check_roundtrip(cfg, n_raw=32)
        assert hdr.profile == ProfileID.P2_RS26_22
        assert hdr.uep == uep_luma_priority()

    @pytest.mark.parametrize("pid", [ProfileID.P1_RS26_24, ProfileID.P2_RS26_22,
                                     ProfileID.P3_RS26_20])
    def test_uniform_profiles(self, pid):
        cfg = EncoderConfig(profile=pid, uep=uep_uniform(int(pid)))
        check_roundtrip(cfg, n_raw=50, seed=int(pid))

    def test_p4_frame_profile_with_p3_bands(self):
        # per-band P4 is untransportable in the header (1 trit/band) and is
        # rejected; the frame profile P4 itself is fine with P1..P3 bands.
        cfg = EncoderConfig(profile=ProfileID.P4_RS26_18, uep=uep_uniform(2))
        check_roundtrip(cfg, n_raw=50, seed=4)

    def test_p4_band_profile_rejected(self):
        cfg = EncoderConfig(uep=uep_uniform(3))
        with pytest.raises(ValueError, match="P4"):
            pipeline.encode_profile_from_raw(jnp.asarray(make_raw_words(8)), cfg)

    def test_p5_2d_interleave(self):
        cfg = EncoderConfig(profile=ProfileID.P5_RS26_22_2D, tile=Tile2D(8, 4))
        prof, hdr = check_roundtrip(cfg, n_raw=40)
        assert hdr.tile == Tile2D(8, 4)

    def test_p5_tile_above_26_rejected(self):
        # header stores tile w/h mod 27 (one symbol each): larger dims
        # cannot round-trip -- the reference's own 64x64 exemplar decodes
        # as tile 10x10 and scrambles the stream (docs/DIVERGENCES.md #6b)
        cfg = EncoderConfig(profile=ProfileID.P5_RS26_22_2D,
                            tile=Tile2D(64, 64))
        with pytest.raises(ValueError, match="tile"):
            pipeline.encode_profile_from_raw(
                jnp.asarray(make_raw_words(8)), cfg)
        # 26x26 is the largest representable tile and round-trips
        cfg = EncoderConfig(profile=ProfileID.P5_RS26_22_2D,
                            tile=Tile2D(26, 26))
        _prof, hdr = check_roundtrip(cfg, n_raw=700)
        assert hdr.tile == Tile2D(26, 26)

    def test_beacon(self):
        cfg = EncoderConfig(beacon=SparseBeaconCfg(words_period=5, band_slot=3,
                                                   enabled=True))
        prof, hdr = check_roundtrip(cfg, n_raw=64)
        assert hdr.beacon == SparseBeaconCfg(5, 3, True)
        # beacon cells hold the plain beacon symbol in the emitted stream
        from ternary_image_codec_tpu.config import (BeaconPayload,
                                                    encode_beacon_symbol)
        bs = encode_beacon_symbol(BeaconPayload(cfg.profile,
                                                cfg.superframe_words % 5, 0))
        body = np.asarray(prof)[pipeline.HEADER_WORDS:]
        assert np.all(body[::5, 3] == bs)

    def test_scrambler_seed(self):
        cfg = EncoderConfig(seed=ScramblerSeed(2, 1, 0))
        check_roundtrip(cfg, n_raw=16)

    def test_raw_mode_passthrough(self):
        raw = make_raw_words(10)
        cfg = EncoderConfig(profile=ProfileID.RAW_MODE)
        out = pipeline.encode_profile_from_raw(jnp.asarray(raw), cfg)
        np.testing.assert_array_equal(np.asarray(out), raw)
        back, hdr, ok = pipeline.decode_profile_to_raw(out, raw_mode=True)
        assert ok and hdr is None
        np.testing.assert_array_equal(np.asarray(back), raw)

    def test_empty_frame(self):
        cfg = EncoderConfig()
        raw = make_raw_words(0)
        prof = pipeline.encode_profile_from_raw(jnp.asarray(raw), cfg)
        assert prof.shape[0] == pipeline.HEADER_WORDS
        out, hdr, ok = pipeline.decode_profile_to_raw(prof)
        assert ok and out.shape[0] == 0


class TestP5PlaneMajor:
    """P5 on the plane-major fast path must be wire-identical to the
    round-1 coeff-minor implementation (same stream spec) and roundtrip
    at lengths that exercise partial tiles."""

    def _cfg(self, tile=Tile2D(8, 4)):
        return EncoderConfig(profile=ProfileID.P5_RS26_22_2D, tile=tile)

    def test_w234_perf_warning(self):
        """w ∤ 234 P5 tiles are a measured ~0.55x perf cliff (docs/PERF.md
        round-4 frontier analysis); the layout builder must surface it
        where the user trips it, naming w|234 alternatives.  Divisor
        widths must stay silent."""
        import warnings as _w
        with _w.catch_warnings(record=True) as rec:
            _w.simplefilter("always")
            pipeline.build_encode_layout(self._cfg(Tile2D(5, 5)), 40)
        msgs = [str(r.message) for r in rec
                if issubclass(r.category, pipeline.PerformanceWarning)]
        assert len(msgs) == 1 and "234" in msgs[0]
        assert "6x5" in msgs[0] and "3x5" in msgs[0]   # nearby divisors
        for tile in (Tile2D(13, 7), Tile2D(26, 26), Tile2D(1, 5)):
            with _w.catch_warnings(record=True) as rec:
                _w.simplefilter("always")
                pipeline.build_encode_layout(self._cfg(tile), 40)
            assert not [r for r in rec if issubclass(
                r.category, pipeline.PerformanceWarning)], tile

    def test_pm_cm_wire_identical(self):
        cfg = self._cfg()
        for n_raw in (7, 40, 101):  # partial + whole tiles
            raw = jnp.asarray(make_raw_words(n_raw, seed=n_raw))
            layout = pipeline.build_encode_layout(cfg, n_raw)
            tc_p, rs_p, bw_p, = pipeline._encode_parts_pm(layout)
            tc_c, rs_c, bw_c, = pipeline._encode_parts_cm(layout)
            out_pm = np.asarray(bw_p(rs_p(tc_p(raw)))).T  # planes -> words
            out_cm = np.asarray(bw_c(rs_c(tc_c(raw))))
            np.testing.assert_array_equal(out_pm, out_cm, err_msg=str(n_raw))

    def test_pm_decode_of_cm_stream_and_back(self):
        cfg = self._cfg()
        n_raw = 75
        raw = make_raw_words(n_raw, seed=5)
        layout = pipeline.build_encode_layout(cfg, n_raw)
        tc_c, rs_c, bw_c = pipeline._encode_parts_cm(layout)
        prof_cm = np.asarray(bw_c(rs_c(tc_c(jnp.asarray(raw)))))
        hdr, hok = pipeline.decode_header_from_words(prof_cm)
        assert hok
        dlayout = pipeline.build_decode_layout(
            hdr, prof_cm.shape[0] - pipeline.HEADER_WORDS)
        for mode in ("paged", "check", "full"):
            dec_pm = pipeline._decode_body_fn_pm2(dlayout, mode, "words")
            out, ok = dec_pm(jnp.asarray(prof_cm[pipeline.HEADER_WORDS:]))
            assert bool(ok), mode
            np.testing.assert_array_equal(np.asarray(out)[:n_raw], raw)
        # and the cm decoder reads the pm encoder's stream
        tc_p, rs_p, bw_p = pipeline._encode_parts_pm(layout)
        prof_pm = np.asarray(bw_p(rs_p(tc_p(jnp.asarray(raw))))).T
        dec_cm = pipeline._decode_body_fn_cm(dlayout, "paged", "words")
        out, ok = dec_cm(jnp.asarray(prof_pm[pipeline.HEADER_WORDS:]))
        assert bool(ok)
        np.testing.assert_array_equal(np.asarray(out)[:n_raw], raw)

    def test_p5_stream_roundtrip_with_errors(self):
        """P5 through the streaming pipeline (now plane-major) with a
        partial tail superframe and injected correctable errors."""
        import dataclasses
        cfg = dataclasses.replace(self._cfg(), superframe_words=64)
        r = np.random.default_rng(17)
        n_raw = 64 * 3 + 29
        raw = make_raw_words(n_raw, seed=17)
        prof = np.asarray(pipeline.encode_stream_superframes(raw, cfg,
                                                             sf_batch=2))
        corr = prof.copy()
        corr[1, pipeline.HEADER_WORDS + 3, 6] = (
            corr[1, pipeline.HEADER_WORDS + 3, 6] + 1) % 27
        out, ok = pipeline.decode_stream_superframes(corr, cfg, n_raw,
                                                     sf_batch=2)
        assert bool(ok)
        np.testing.assert_array_equal(np.asarray(out), raw)


class TestErrorCorrection:
    def test_symbol_errors_corrected(self):
        """Inject <= t symbol errors per codeword region; decode must still
        be exact (the whole point of the profile pipeline)."""
        cfg = EncoderConfig(profile=ProfileID.P3_RS26_20, uep=uep_uniform(2))
        raw = make_raw_words(40, seed=3)
        prof = np.asarray(pipeline.encode_profile_from_raw(jnp.asarray(raw), cfg)).copy()
        r = np.random.default_rng(7)
        body = prof[pipeline.HEADER_WORDS:]
        # corrupt 2 random cells in each column (t=3 for P3; each column is a
        # stack of codewords -- 2 errors anywhere in one codeword is fine)
        for col in range(9):
            rows = r.choice(min(26, body.shape[0]), size=2, replace=False)
            body[rows, col] = (body[rows, col] + 1 + r.integers(0, 26)) % 27
        out, hdr, ok = pipeline.decode_profile_to_raw(jnp.asarray(prof))
        assert ok
        out = np.asarray(out)
        np.testing.assert_array_equal(out[:len(raw)], raw)

    def test_header_corruption_corrected(self):
        cfg = EncoderConfig()
        raw = make_raw_words(20)
        prof = np.asarray(pipeline.encode_profile_from_raw(jnp.asarray(raw), cfg)).copy()
        prof[0, [1, 5]] = (prof[0, [1, 5]] + 3) % 27  # 2 errors in RS(26,18) block A
        out, hdr, ok = pipeline.decode_profile_to_raw(jnp.asarray(prof))
        assert ok and hdr is not None
        np.testing.assert_array_equal(np.asarray(out)[:len(raw)], raw)

    def test_destroyed_header_fails_cleanly(self):
        cfg = EncoderConfig()
        raw = make_raw_words(20)
        prof = np.asarray(pipeline.encode_profile_from_raw(jnp.asarray(raw), cfg)).copy()
        r = np.random.default_rng(1)
        prof[:pipeline.HEADER_WORDS] = r.integers(0, 27, size=(6, 9))
        out, hdr, ok = pipeline.decode_profile_to_raw(jnp.asarray(prof))
        assert not ok and out is None

    def test_invalid_beacon_period_rejected(self):
        cfg = EncoderConfig(beacon=SparseBeaconCfg(words_period=40, band_slot=0,
                                                   enabled=True))
        with pytest.raises(ValueError):
            pipeline.encode_profile_from_raw(jnp.asarray(make_raw_words(8)), cfg)


class TestSuperframeStreaming:
    """Bounded-superframe streaming mode (reference superframe_words=8192,
    old/.../v6_min.hpp:869): chunked encode/decode with lax.map micro-batches."""

    def test_stream_roundtrip_with_tail(self):
        import dataclasses
        from ternary_image_codec_tpu.config import (EncoderConfig, ProfileID,
                                                    uep_luma_priority)
        cfg = EncoderConfig(profile=ProfileID.P2_RS26_22,
                            uep=uep_luma_priority(), superframe_words=64)
        r = np.random.default_rng(0)
        n_raw = 64 * 5 + 17  # partial tail superframe
        t = r.integers(0, 3, size=(n_raw, 27)).astype(np.int8)
        t[:, 26] = 0
        raw = (t.reshape(n_raw, 9, 3) * np.array([1, 3, 9])).sum(-1).astype(np.int8)
        prof = pipeline.encode_stream_superframes(raw, cfg, sf_batch=2)
        assert prof.shape[0] == 6  # ceil(337/64)
        out, ok = pipeline.decode_stream_superframes(prof, cfg, n_raw,
                                                     sf_batch=2)
        assert bool(ok)
        assert np.array_equal(np.asarray(out), raw)

    def test_each_superframe_is_a_valid_standalone_frame(self):
        from ternary_image_codec_tpu.config import (EncoderConfig, ProfileID,
                                                    uep_uniform)
        cfg = EncoderConfig(profile=ProfileID.P1_RS26_24, uep=uep_uniform(0),
                            superframe_words=32)
        r = np.random.default_rng(1)
        n_raw = 96
        t = r.integers(0, 3, size=(n_raw, 27)).astype(np.int8)
        t[:, 26] = 0
        raw = (t.reshape(n_raw, 9, 3) * np.array([1, 3, 9])).sum(-1).astype(np.int8)
        prof = pipeline.encode_stream_superframes(raw, cfg)
        # decode superframe 1 alone through the generic single-frame API
        out, hdr, ok = pipeline.decode_profile_to_raw(jnp.asarray(prof[1]))
        assert ok and hdr.profile == ProfileID.P1_RS26_24
        assert np.array_equal(np.asarray(out)[:32], raw[32:64])

    def test_fused_roundtrip_matches_separate_streams(self):
        """roundtrip_stream_fn (fused encode+check-decode per micro-batch,
        wire words VMEM-resident) must return the same RAW planes and ok
        flags as the separate enc/dec streams, for both raw wires."""
        from ternary_image_codec_tpu.config import (EncoderConfig, ProfileID,
                                                    uep_luma_priority)
        cfg = EncoderConfig(profile=ProfileID.P2_RS26_22,
                            uep=uep_luma_priority(), superframe_words=64)
        r = np.random.default_rng(3)
        n_sf = 5
        t = r.integers(0, 3, size=(n_sf * 64, 27)).astype(np.int8)
        t[:, 26] = 0
        raw = (t.reshape(-1, 9, 3) * np.array([1, 3, 9])).sum(-1) \
            .astype(np.int8)
        chunks = raw.reshape(n_sf, 64, 9)
        _l, _d, enc, dec = pipeline._stream_fns(cfg, 2, rs_mode="check",
                                                ok_per_sf=True)
        wire = enc(jnp.asarray(chunks))
        out_ref, ok_ref = dec(wire)
        rt = pipeline.roundtrip_stream_fn(cfg, 2, rs_mode="check")
        out, ok = rt(jnp.asarray(chunks))
        assert np.array_equal(np.asarray(out), np.asarray(out_ref))
        assert np.array_equal(np.asarray(ok), np.asarray(ok_ref))
        assert np.all(np.asarray(ok))
        # planes wire gives the identical result
        rtp = pipeline.roundtrip_stream_fn(cfg, 2, rs_mode="check",
                                           raw_wire="planes")
        out_p, ok_p = rtp(jnp.asarray(chunks.transpose(0, 2, 1)))
        assert np.array_equal(np.asarray(out_p), np.asarray(out))
        assert np.all(np.asarray(ok_p))
        # a corrupted input word round-trips to DIFFERENT wire words but
        # still-valid codewords -- the roundtrip is self-consistent, so ok
        # stays True and the output matches the corrupted input (the fn
        # verifies the channel, not the source); sanity: output != raw
        bad = chunks.copy()
        bad[1, 7, 4] = (bad[1, 7, 4] + 1) % 27
        out_b, ok_b = rt(jnp.asarray(bad))
        assert np.all(np.asarray(ok_b))
        got = np.asarray(out_b[:, :, :64]).transpose(0, 2, 1).reshape(-1, 9)
        assert np.array_equal(got, bad.reshape(-1, 9))

    def test_stream_corrects_errors_via_slow_branch(self):
        """Corrupt one symbol in one superframe: the dirty page must be
        gathered into decode_dig_paged's correction buffer and recover
        exactly; clean pages skip the BM/Chien/Forney chain."""
        from ternary_image_codec_tpu.config import (EncoderConfig, ProfileID,
                                                    uep_luma_priority)
        cfg = EncoderConfig(profile=ProfileID.P2_RS26_22,
                            uep=uep_luma_priority(), superframe_words=64)
        r = np.random.default_rng(7)
        n_raw = 64 * 4
        t = r.integers(0, 3, size=(n_raw, 27)).astype(np.int8)
        t[:, 26] = 0
        raw = (t.reshape(n_raw, 9, 3) * np.array([1, 3, 9])).sum(-1).astype(np.int8)
        prof = np.asarray(pipeline.encode_stream_superframes(raw, cfg,
                                                             sf_batch=2))
        # flip one body symbol in superframe 2 (second micro-batch)
        corr = prof.copy()
        corr[2, pipeline.HEADER_WORDS + 5, 4] = (
            corr[2, pipeline.HEADER_WORDS + 5, 4] + 1) % 27
        out, ok = pipeline.decode_stream_superframes(corr, cfg, n_raw,
                                                     sf_batch=2)
        assert bool(ok)
        assert np.array_equal(np.asarray(out), raw)

    def test_stream_beyond_capacity_never_silently_ok(self):
        """Beyond-capacity corruption must either clear the ok flag or
        miscorrect to a *different* valid codeword -- it must never return
        ok=True with the original data (which would mean the corruption was
        silently ignored, i.e. the fast path fired on a dirty batch).
        (Per-frame status semantics, SURVEY.md section 5 failure detection;
        miscorrection beyond distance is inherent to RS, tests/test_rs.py.)"""
        from ternary_image_codec_tpu.config import (EncoderConfig, ProfileID,
                                                    uep_uniform)
        cfg = EncoderConfig(profile=ProfileID.P1_RS26_24, uep=uep_uniform(0),
                            superframe_words=32)
        r = np.random.default_rng(9)
        n_raw = 64
        t = r.integers(0, 3, size=(n_raw, 27)).astype(np.int8)
        t[:, 26] = 0
        raw = (t.reshape(n_raw, 9, 3) * np.array([1, 3, 9])).sum(-1).astype(np.int8)
        prof = np.asarray(pipeline.encode_stream_superframes(raw, cfg))
        corr = prof.copy()
        # k=24 -> t=1: 2+ errors in one codeword (same band column) overwhelm it
        for row in range(5):
            corr[0, pipeline.HEADER_WORDS + row, 2] = (
                corr[0, pipeline.HEADER_WORDS + row, 2] + 1 + row % 2) % 27
        out, ok = pipeline.decode_stream_superframes(corr, cfg, n_raw)
        assert not (bool(ok) and np.array_equal(np.asarray(out), raw))

    def test_stream_mass_header_corruption(self):
        """EVERY superframe's header damaged (1-2 symbols, <= t=4), at a
        stream size whose header blocks span > 8 pages (2n > 512): all
        must repair in paged mode.  Round-4 regression: the header
        validator's paged RS decode inherited the body-model capacity
        cap max(8, npage/8) and false-flagged correctable headers once
        more than 8 header pages were dirty -- exactly the two-phase
        repair dispatch's normal load under a header-damage channel
        (bench 20%-dirty failure; docs/PERF.md round-4 ledger)."""
        from ternary_image_codec_tpu.config import (EncoderConfig,
                                                    ProfileID, uep_uniform)
        cfg = EncoderConfig(profile=ProfileID.P1_RS26_24, uep=uep_uniform(0),
                            superframe_words=8)
        r = np.random.default_rng(77)
        n_sf = 300                     # 600 header blocks -> 10 pages > 8
        n_raw = n_sf * 8
        t = r.integers(0, 3, size=(n_raw, 27)).astype(np.int8)
        t[:, 26] = 0
        raw = (t.reshape(n_raw, 9, 3) * np.array([1, 3, 9])).sum(-1) \
            .astype(np.int8)
        prof = np.asarray(pipeline.encode_stream_superframes(raw, cfg))
        corr = prof.copy()
        for s in range(n_sf):
            rows = r.choice(9, 2, replace=False)
            for row in rows:
                w = r.integers(0, pipeline.HEADER_WORDS)
                corr[s, w, row] = (corr[s, w, row]
                                   + 1 + r.integers(0, 26)) % 27
        out, ok = pipeline.decode_stream_superframes(corr, cfg, n_raw,
                                                     strategy="paged")
        assert bool(ok), "mass header damage must stay correctable"
        assert np.array_equal(np.asarray(out), raw)

    def test_stream_header_corruption_semantics(self):
        """Per-superframe header validation (reference decodes every
        superframe header, old/.../v6_min.hpp:918-937): <= t=4 header
        symbol errors are corrected (stream stays ok); > t clears ok."""
        from ternary_image_codec_tpu.config import (EncoderConfig, ProfileID,
                                                    uep_uniform)
        cfg = EncoderConfig(profile=ProfileID.P1_RS26_24, uep=uep_uniform(0),
                            superframe_words=32)
        r = np.random.default_rng(12)
        n_raw = 96
        t = r.integers(0, 3, size=(n_raw, 27)).astype(np.int8)
        t[:, 26] = 0
        raw = (t.reshape(n_raw, 9, 3) * np.array([1, 3, 9])).sum(-1).astype(np.int8)
        prof = np.asarray(pipeline.encode_stream_superframes(raw, cfg))
        # 3 errors in superframe 1's header block A: corrected, still ok
        corr = prof.copy()
        for pos in (0, 1, 2):
            corr[1, pos // 9, pos % 9] = (corr[1, pos // 9, pos % 9] + 1) % 27
        out, ok = pipeline.decode_stream_superframes(corr, cfg, n_raw)
        assert bool(ok) and np.array_equal(np.asarray(out), raw)
        # 6 errors in one header block: uncorrectable or miscorrected ->
        # either way the decoded header cannot match the config -> not ok
        corr2 = prof.copy()
        for pos in range(6):
            corr2[0, pos // 9, pos % 9] = (corr2[0, pos // 9, pos % 9] + 1 + pos % 2) % 27
        _out2, ok2 = pipeline.decode_stream_superframes(corr2, cfg, n_raw)
        assert not bool(ok2)

    def test_stream_wrong_config_flags(self):
        """Decoding a stream with a mismatched config must clear ok (the
        embedded headers don't match), not silently return garbage."""
        from ternary_image_codec_tpu.config import (EncoderConfig, ProfileID,
                                                    uep_uniform)
        cfg1 = EncoderConfig(profile=ProfileID.P1_RS26_24, uep=uep_uniform(0),
                             superframe_words=32)
        cfg2 = EncoderConfig(profile=ProfileID.P2_RS26_22, uep=uep_uniform(1),
                             superframe_words=32)
        r = np.random.default_rng(13)
        n_raw = 64
        t = r.integers(0, 3, size=(n_raw, 27)).astype(np.int8)
        t[:, 26] = 0
        raw = (t.reshape(n_raw, 9, 3) * np.array([1, 3, 9])).sum(-1).astype(np.int8)
        prof = np.asarray(pipeline.encode_stream_superframes(raw, cfg1))
        _out, ok = pipeline.decode_stream_superframes(prof, cfg2, n_raw)
        assert not bool(ok)

    def test_stream_check_and_none_modes(self):
        """rs_mode="check" verifies without correcting (flags corruption);
        rs_mode="none" trusts the stream (fast read path)."""
        from ternary_image_codec_tpu.config import (EncoderConfig, ProfileID,
                                                    uep_luma_priority)
        import jax.numpy as jnp
        cfg = EncoderConfig(profile=ProfileID.P2_RS26_22,
                            uep=uep_luma_priority(), superframe_words=64)
        r = np.random.default_rng(31)
        n_raw = 128
        t = r.integers(0, 3, size=(n_raw, 27)).astype(np.int8)
        t[:, 26] = 0
        raw = (t.reshape(n_raw, 9, 3) * np.array([1, 3, 9])).sum(-1).astype(np.int8)
        prof = np.asarray(pipeline.encode_stream_superframes(raw, cfg,
                                                             sf_batch=2))
        for mode in ("check", "none"):
            _l, _d, _e, dec = pipeline._stream_fns(cfg, 2, rs_mode=mode)
            out_T, ok = dec(jnp.asarray(prof).swapaxes(1, 2))
            got = np.asarray(out_T)[:, :, :64].transpose(0, 2, 1).reshape(-1, 9)[:n_raw]
            assert bool(ok) and np.array_equal(got, raw), mode
        # corrupt one symbol: check flags it, none silently passes data thru
        corr = prof.copy()
        corr[1, pipeline.HEADER_WORDS + 3, 2] = (
            corr[1, pipeline.HEADER_WORDS + 3, 2] + 1) % 27
        _l, _d, _e, dec_c = pipeline._stream_fns(cfg, 2, rs_mode="check")
        _o, ok_c = dec_c(jnp.asarray(corr).swapaxes(1, 2))
        assert not bool(ok_c)
        _l, _d, _e, dec_n = pipeline._stream_fns(cfg, 2, rs_mode="none")
        _o, ok_n = dec_n(jnp.asarray(corr).swapaxes(1, 2))
        assert bool(ok_n)  # "none" trusts the stream by design
        # header damage: check flags it (byte-compare vs the constant
        # header words -- scrub semantics); none RS-decodes the header
        # and a correctable single error stays ok
        corr_h = prof.copy()
        corr_h[1, 0, 3] = (corr_h[1, 0, 3] + 1) % 27
        _o, ok_ch = dec_c(jnp.asarray(corr_h).swapaxes(1, 2))
        assert not bool(ok_ch)
        _o, ok_nh = dec_n(jnp.asarray(corr_h).swapaxes(1, 2))
        assert bool(ok_nh)
        # ...and the auto strategy repairs it end to end (phase 2 header
        # RS decode), so correctable header damage stays ok
        out_h, ok_auto = pipeline.decode_stream_superframes(
            corr_h, cfg, n_raw, sf_batch=2)
        assert bool(ok_auto) and np.array_equal(np.asarray(out_h), raw)

    def test_auto_repairs_only_flagged_superframes(self):
        """Phase 1 flags exactly the corrupted superframes; phase 2 repairs
        just those (host-level gather) and the merged stream is exact."""
        from ternary_image_codec_tpu.config import (EncoderConfig, ProfileID,
                                                    uep_luma_priority)
        cfg = EncoderConfig(profile=ProfileID.P2_RS26_22,
                            uep=uep_luma_priority(), superframe_words=64)
        r = np.random.default_rng(21)
        n_raw = 64 * 6
        t = r.integers(0, 3, size=(n_raw, 27)).astype(np.int8)
        t[:, 26] = 0
        raw = (t.reshape(n_raw, 9, 3) * np.array([1, 3, 9])).sum(-1) \
            .astype(np.int8)
        prof = np.asarray(pipeline.encode_stream_superframes(raw, cfg,
                                                             sf_batch=2))
        corr = prof.copy()
        corr[1, pipeline.HEADER_WORDS + 5, 4] = (
            corr[1, pipeline.HEADER_WORDS + 5, 4] + 1) % 27
        corr[4, pipeline.HEADER_WORDS + 9, 0] = (
            corr[4, pipeline.HEADER_WORDS + 9, 0] + 2) % 27
        # per-superframe flags from the phase-1 check decode
        _l, _d, _e, dec_check = pipeline._stream_fns(cfg, 2, rs_mode="check",
                                                     ok_per_sf=True)
        _raw, ok_sf = dec_check(jnp.asarray(corr).swapaxes(1, 2))
        assert np.asarray(ok_sf).tolist() == [True, False, True, True,
                                              False, True]
        # full auto decode: repaired, exact, ok
        out, ok = pipeline.decode_stream_superframes(corr, cfg, n_raw,
                                                     sf_batch=2)
        assert bool(ok)
        assert np.array_equal(np.asarray(out), raw)
        # T3_REPAIR_SFB: the repair dispatch may ride its own (smaller)
        # micro-batch than phase 1 -- bit-exact either way (the knob only
        # changes batching/padding, docs/PERF.md per-step op floor)
        os.environ["T3_REPAIR_SFB"] = "1"
        try:
            out1, ok1 = pipeline.decode_stream_superframes(corr, cfg, n_raw,
                                                           sf_batch=2)
        finally:
            del os.environ["T3_REPAIR_SFB"]
        assert bool(ok1) and np.array_equal(np.asarray(out1), raw)

    def test_fused_strategy_matches_auto(self):
        """strategy="fused" (one-dispatch two-phase: device-compacted
        repair window, pipeline._fused_auto_fn) must return the same
        answers as the host-branch auto strategy: exact repair of body
        AND header damage within the window, ok on clean streams, and
        fail-safe ok=False both for beyond-capacity codewords and for
        more dirty superframes than repair_cap slots."""
        from ternary_image_codec_tpu.config import (EncoderConfig, ProfileID,
                                                    uep_luma_priority)
        cfg = EncoderConfig(profile=ProfileID.P2_RS26_22,
                            uep=uep_luma_priority(), superframe_words=64)
        r = np.random.default_rng(23)
        n_raw = 64 * 6
        t = r.integers(0, 3, size=(n_raw, 27)).astype(np.int8)
        t[:, 26] = 0
        raw = (t.reshape(n_raw, 9, 3) * np.array([1, 3, 9])).sum(-1) \
            .astype(np.int8)
        prof = np.asarray(pipeline.encode_stream_superframes(raw, cfg,
                                                             sf_batch=2))
        # clean stream: ok + exact (padding slots repair clean superframes
        # idempotently)
        out_c, ok_c = pipeline.decode_stream_superframes(
            prof, cfg, n_raw, sf_batch=2, strategy="fused", repair_cap=2)
        assert bool(ok_c) and np.array_equal(np.asarray(out_c), raw)
        # two dirty superframes (body symbol + header symbol) within the
        # 2-slot window: exact repair, same as auto
        corr = prof.copy()
        corr[1, pipeline.HEADER_WORDS + 5, 4] = (
            corr[1, pipeline.HEADER_WORDS + 5, 4] + 1) % 27
        corr[4, 0, 3] = (corr[4, 0, 3] + 2) % 27       # header damage
        out_f, ok_f = pipeline.decode_stream_superframes(
            corr, cfg, n_raw, sf_batch=2, strategy="fused", repair_cap=2)
        assert bool(ok_f) and np.array_equal(np.asarray(out_f), raw)
        # three dirty superframes vs a 2-slot window: fail-safe ok=False
        corr3 = corr.copy()
        corr3[2, pipeline.HEADER_WORDS + 9, 0] = (
            corr3[2, pipeline.HEADER_WORDS + 9, 0] + 1) % 27
        _o, ok_over = pipeline.decode_stream_superframes(
            corr3, cfg, n_raw, sf_batch=2, strategy="fused", repair_cap=2)
        assert not bool(ok_over)
        # ...but a wider window repairs all three exactly
        out3, ok3 = pipeline.decode_stream_superframes(
            corr3, cfg, n_raw, sf_batch=2, strategy="fused", repair_cap=4)
        assert bool(ok3) and np.array_equal(np.asarray(out3), raw)
        # window wider than the whole stream (cap > n_sf): the index
        # slice clamps to n_sf and every superframe rides the corrector
        out_w, ok_w = pipeline.decode_stream_superframes(
            corr3, cfg, n_raw, sf_batch=2, strategy="fused",
            repair_cap=99)
        assert bool(ok_w) and np.array_equal(np.asarray(out_w), raw)
        # beyond-capacity codeword damage (t+1 = 3 errors in one k=22
        # codeword) inside the window: repair runs, flags ok=False
        corr_bc = prof.copy()
        ob = pipeline.HEADER_WORDS + 2 * 26
        for i in range(3):
            corr_bc[0, ob + i, 1] = (corr_bc[0, ob + i, 1] + 1 + i) % 27
        out_bc, ok_bc = pipeline.decode_stream_superframes(
            corr_bc, cfg, n_raw, sf_batch=2, strategy="fused", repair_cap=2)
        # beyond distance RS may miscorrect to ANOTHER valid codeword;
        # it must never return ok=True with the original data (same
        # contract as test_stream_beyond_capacity_never_silently_ok)
        assert not (bool(ok_bc) and np.array_equal(np.asarray(out_bc), raw))

    def test_period1_beacon_with_data_rejected(self):
        """words_period=1 gives the beacon band zero payload capacity; the
        layout search used to loop forever -- must raise instead."""
        from ternary_image_codec_tpu.config import (EncoderConfig, ProfileID,
                                                    SparseBeaconCfg,
                                                    uep_uniform)
        cfg = EncoderConfig(profile=ProfileID.P1_RS26_24, uep=uep_uniform(0),
                            beacon=SparseBeaconCfg(1, 0, True),
                            superframe_words=32)
        with pytest.raises(ValueError, match="words_period=1"):
            pipeline.build_encode_layout(cfg, 32)


class TestMixedKRepair:
    """T3_RS_MIXED=1 defers every k-group's page-compacted blocks into ONE
    masked mixed-k BM/Chien/Forney instance (rs._correct_pm_mixed) instead
    of one chain per group -- a pure op-count restructure of the paged
    repair dispatch.  Output bytes and ok flags must match the per-group
    chains exactly, including beyond-capacity and page-overflow decisions
    (rs-level equivalence: tests/test_rs.py::test_correct_pm_mixed)."""

    def _run_paged(self, dlay, body, mixed, monkeypatch):
        import os
        monkeypatch.setenv("T3_RS_MIXED", "1" if mixed else "0")
        pipeline._decode_body_fn.cache_clear()
        try:
            out, ok = pipeline._decode_body_fn(dlay, "paged",
                                               wire="planes")(body)
            return np.asarray(out), bool(ok)
        finally:
            pipeline._decode_body_fn.cache_clear()

    @pytest.mark.parametrize("beacon", [False, True])
    def test_mixed_matches_per_group_chains(self, beacon, monkeypatch):
        from ternary_image_codec_tpu.config import SuperframeHeader
        cfg = EncoderConfig(
            profile=ProfileID.P2_RS26_22, uep=uep_luma_priority(),
            superframe_words=2048,
            beacon=SparseBeaconCfg(13, 4, True) if beacon else
            SparseBeaconCfg())
        raw = make_raw_words(cfg.superframe_words, seed=55)
        layout = pipeline.build_encode_layout(cfg, int(raw.shape[0]))
        hdr = SuperframeHeader(profile=cfg.profile, uep=cfg.uep,
                               tile=cfg.tile, seed=cfg.seed,
                               beacon=cfg.beacon, subword=cfg.subword,
                               centered=cfg.centered, coset=cfg.coset)
        dlay = pipeline.build_decode_layout(
            hdr, layout.total_words - pipeline.HEADER_WORDS)
        wire = np.asarray(
            pipeline._encode_fn(layout, wire="planes")(jnp.asarray(raw)))
        body = wire[:, pipeline.HEADER_WORDS:]
        H = body.shape[1]
        r = np.random.default_rng(77)

        def corrupt(cells):
            bad = body.copy()
            for b, h, d in cells:
                bad[b, h] = (bad[b, h] + d) % 27
            return jnp.asarray(bad)

        cases = {
            "clean": jnp.asarray(body),
            # correctable damage touching BOTH k-groups (k=20 bands 0/3/6,
            # k=22 elsewhere), several pages apart
            "correctable": corrupt([(0, 5, 1), (0, 6, 2), (1, 900, 1),
                                    (6, 1700, 2), (2, 40, 1)]),
            # > t errors inside one k=22 codeword (t=2): uncorrectable or
            # miscorrected -- either way both paths must agree byte-for-byte
            "beyond_capacity": corrupt([(1, 26 * 3 + c, 1 + c % 2)
                                        for c in range(8)]),
            # heavy scattered damage: more dirty pages than the compaction
            # capacity C in at least one group -> overflow fail-safe
            "page_overflow": corrupt([(b, h, 1)
                                      for b in range(9)
                                      for h in range(3, H - 1, 16 * 26)]),
        }
        for name, inp in cases.items():
            o_ref, k_ref = self._run_paged(dlay, inp, False, monkeypatch)
            o_mix, k_mix = self._run_paged(dlay, inp, True, monkeypatch)
            assert np.array_equal(o_ref, o_mix), name
            assert k_ref == k_mix, name
            if name in ("clean", "correctable"):
                assert k_ref, name
                got = o_ref.T[:raw.shape[0]]
                assert np.array_equal(got, raw), name
            elif name == "page_overflow":
                assert not k_ref, name


def test_roundtrip_feed_hook_matches_host_staging():
    """roundtrip_stream_fn(feed=...): device-synthesized chunks (row gather
    + variant add built inside the map body) must produce the same folds
    and ok flags as the same chunks staged host-side (bench.py's
    T3_BENCH_STAGE=device path)."""
    import jax
    cfg = EncoderConfig(profile=ProfileID.P2_RS26_22,
                        uep=uep_luma_priority(), superframe_words=64)
    r = np.random.default_rng(17)
    n_sf, iters = 3, 4
    t = r.integers(0, 3, size=(n_sf * 64, 27)).astype(np.int8)
    t[:, 26] = 0
    base_np = (t.reshape(-1, 9, 3) * np.array([1, 3, 9])).sum(-1) \
        .astype(np.int8).reshape(n_sf, 64, 9)
    sidx = np.tile(np.arange(n_sf, dtype=np.int32), iters)
    v = np.repeat(np.arange(1, iters + 1, dtype=np.int8), n_sf)
    host = ((base_np[sidx].astype(np.int64)
             + v[:, None, None]) % 27).astype(np.int8)
    fold = lambda o: jnp.sum(o.astype(jnp.int32))
    rt_host = pipeline.roundtrip_stream_fn(cfg, 2, rs_mode="check",
                                           fold=fold)
    chk_ref, ok_ref = rt_host(jnp.asarray(host))

    def make(src, si, vi):
        c = src[si].astype(jnp.float32) + vi.astype(jnp.float32)
        return (c - 27.0 * jnp.floor(c * (1.0 / 27.0))).astype(jnp.int8)

    rt_feed = pipeline.roundtrip_stream_fn(
        cfg, 2, rs_mode="check", fold=fold,
        feed=(jnp.asarray(base_np), make))
    chk, ok = rt_feed(jnp.asarray(sidx), jnp.asarray(v))
    assert np.array_equal(np.asarray(chk), np.asarray(chk_ref))
    assert np.array_equal(np.asarray(ok), np.asarray(ok_ref))
    assert np.all(np.asarray(ok))
