"""Serving path: device wire pack/unpack + streaming T3V6 writer/reader
+ the end-to-end serve loop (encode -> container on disk -> approve-gated
read -> decode -> exactness)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from ternary_image_codec_tpu.config import (EncoderConfig, ProfileID,
                                            SubwordMode, uep_luma_priority,
                                            uep_uniform)
from ternary_image_codec_tpu.io import containers as C
from ternary_image_codec_tpu.io import serve as S
from ternary_image_codec_tpu.ops import pipeline, wirepack


def make_raw(n, seed=0):
    r = np.random.default_rng(seed)
    t = r.integers(0, 3, size=(n, 27)).astype(np.int8)
    t[:, 26] = 0
    return (t.reshape(n, 9, 3) * np.array([1, 3, 9])).sum(-1).astype(np.int8)


class TestWirePack:
    def test_pack_matches_np_oracle_and_roundtrips(self):
        r = np.random.default_rng(3)
        planes = r.integers(0, 27, size=(4, 9, 101)).astype(np.int8)
        by = np.asarray(wirepack.pack_wire(jnp.asarray(planes)))
        np.testing.assert_array_equal(by, wirepack.np_pack_wire(planes))
        assert by.shape == (4, wirepack.sf_bytes(101))
        back = np.asarray(wirepack.unpack_wire(jnp.asarray(by), 101))
        np.testing.assert_array_equal(back, planes)

    def test_byte_values_match_base243_convention(self):
        # the byte stream must be exactly ops/trits base-243 over the
        # C-order (9, total) symbol stream, 3 trits LSD-first per symbol
        from ternary_image_codec_tpu.ops import trits as T
        planes = np.arange(27, dtype=np.int8).reshape(1, 9, 3) % 27
        by = np.asarray(wirepack.pack_wire(jnp.asarray(planes)))[0]
        tr = np.asarray(planes, np.int64).reshape(-1, 1) // [1, 3, 9] % 3
        ref, _tail = T.np_trits_to_base243(tr.reshape(-1))
        np.testing.assert_array_equal(by, ref)


class TestStreamContainers:
    def test_writer_is_byte_compatible_with_reader(self, tmp_path):
        """Frames written by T3V6StreamWriter must be readable by the
        golden-tested containers.t3v_read_frame, byte for byte."""
        p = str(tmp_path / "serve.t3v")
        frames = [np.random.default_rng(i).integers(
            0, 2**32, 16, dtype=np.uint32) for i in range(3)]
        with S.T3V6StreamWriter(p, SubwordMode.S27, 64, 32, 3, 64,
                                meta_global='{"domain":"acme/x"}',
                                meta_per_frame='{"f":1}') as wtr:
            for i, fr in enumerate(frames):
                wtr.write_frame(i, fr.astype("<u4").tobytes())
        sub, w, h, metag, fc, index = C.t3v_read_header(p)
        assert (sub, w, h, fc) == (SubwordMode.S27, 64, 32, 3)
        assert metag == '{"domain":"acme/x"}'
        for i, fr in enumerate(frames):
            got = C.t3v_read_frame(p, i)
            np.testing.assert_array_equal(got, fr)

    def test_reader_matches_writer_and_gates(self, tmp_path):
        p = str(tmp_path / "gate.t3v")
        fr = np.arange(8, dtype=np.uint32)
        with S.T3V6StreamWriter(p, SubwordMode.S27, 8, 8, 1, 32,
                                meta_per_frame='{"domain":"evil/x"}') as w:
            w.write_frame(0, fr.astype("<u4").tobytes())
        with S.T3V6StreamReader(p) as rd:
            got = np.frombuffer(rd.read_frame_bytes(0), dtype="<u4")
            np.testing.assert_array_equal(got, fr)
        calls = []

        def deny(meta):
            calls.append(meta)
            return False

        with S.T3V6StreamReader(p, approve_meta=deny) as rd:
            with pytest.raises(C.ContainerError, match="not approved"):
                rd.read_frame_bytes(0)
        assert calls == ['{"domain":"evil/x"}']

    def test_reader_detects_payload_corruption(self, tmp_path):
        p = str(tmp_path / "crc.t3v")
        with S.T3V6StreamWriter(p, SubwordMode.S27, 8, 8, 1, 32) as w:
            w.write_frame(0, bytes(range(32)))
        with S.T3V6StreamReader(p) as rd:
            off = rd.index[0].offset
        data = bytearray(open(p, "rb").read())
        data[off + 5] ^= 0xFF
        open(p, "wb").write(bytes(data))
        with S.T3V6StreamReader(p) as rd:
            with pytest.raises(C.ContainerError, match="crc"):
                rd.read_frame_bytes(0)


class TestServeLoop:
    @pytest.mark.parametrize("cfg", [
        EncoderConfig(profile=ProfileID.P2_RS26_22, uep=uep_luma_priority(),
                      superframe_words=64),
        EncoderConfig(profile=ProfileID.P1_RS26_24, uep=uep_uniform(0),
                      superframe_words=32),
    ])
    def test_end_to_end_serve(self, cfg, tmp_path):
        """frames -> device encode+pack -> T3V6 on disk -> approve-gated
        read -> device unpack+decode -> ok + checksum exactness."""
        n_raw = cfg.superframe_words * 5 + 17
        sf = cfg.superframe_words
        n_sf = -(-n_raw // sf)
        enc_serve, dec_serve, geom = S.serve_codec_fns(cfg, n_raw,
                                                       sf_batch=4)
        p = str(tmp_path / "e2e.t3v")
        n_frames = 3
        pad_b = geom["frame_bytes"] - n_sf * geom["sf_bytes"]
        chunks, enc_cks = [], []
        with S.T3V6StreamWriter(
                p, cfg.subword, 64, 32, n_frames, geom["frame_bytes"],
                meta_global=S.serve_meta_global(cfg, n_raw, 64, 32),
                meta_per_frame='{"domain":"acme/video/f"}') as w:
            for i in range(n_frames):
                raw = make_raw(n_raw, seed=10 + i)
                c = np.zeros((n_sf * sf, 9), np.int8)
                c[:n_raw] = raw
                c = c.reshape(n_sf, sf, 9)
                chunks.append(c)
                by, ck = enc_serve(jnp.asarray(c))
                enc_cks.append(int(ck))
                w.write_frame(i, np.asarray(by).tobytes() + b"\0" * pad_b)
        ok_meta = []
        from ternary_image_codec_tpu.security import policy as P
        pol = P.Policy(memberships=[P.Membership("acme/")])
        approve = P.t3v_approve_with_policy(pol)

        def approve_logged(m):
            ok_meta.append(m)
            return approve(m)

        with S.T3V6StreamReader(p, approve_meta=approve_logged) as rd:
            assert rd.frame_count == n_frames
            for i in range(n_frames):
                pay = rd.read_frame_bytes(i)
                by = np.frombuffer(
                    pay[:n_sf * geom["sf_bytes"]],
                    dtype=np.uint8).reshape(n_sf, geom["sf_bytes"])
                ok, wire_ck, _out_ck = dec_serve(jnp.asarray(by))
                assert bool(ok), i
                assert int(wire_ck) == enc_cks[i]
                # full exactness on one frame: decoded planes == source
                if i == 0:
                    from ternary_image_codec_tpu.ops import wirepack as WP
                    _l, _d, _e, dec = pipeline._stream_fns(
                        cfg, 4, rs_mode="check")
                    out, ok2 = dec(WP.unpack_wire(jnp.asarray(by),
                                                  geom["total_words"]))
                    assert bool(ok2)
                    got = np.asarray(out)[:, :, :sf].transpose(0, 2, 1) \
                        .reshape(-1, 9)[:n_raw]
                    np.testing.assert_array_equal(
                        got, chunks[i].reshape(-1, 9)[:n_raw])
        assert len(ok_meta) == n_frames
