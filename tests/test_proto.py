"""Transform prototype tests: Haar tiles / spectral sketch / AnisoRC vs
golden data from the compiled reference (tests/oracle/gen_golden_proto.cpp),
plus the profile-routing layer."""
import json
import os

import numpy as np
import pytest
import jax.numpy as jnp

from ternary_image_codec_tpu import profiles as PR
from ternary_image_codec_tpu.io import legacy_containers as LC
from ternary_image_codec_tpu.ops import proto as P

GOLD = os.path.join(os.path.dirname(__file__), "golden")


def make_rgb(w, h, seed):
    """Mirror of the oracle probe's deterministic image generator."""
    n = w * h * 3
    out = np.empty(n, dtype=np.uint8)
    s = seed
    for i in range(n):
        s = (s * 1103515245 + 12345) & 0xFFFFFFFF
        out[i] = (s >> 16) & 0xFF
    im = out.reshape(h, w, 3).astype(np.int64)
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    im[:, :, 0] = (im[:, :, 0] // 4 + (x * 192) // (w - 1)) & 0xFF
    im[:, :, 1] = (im[:, :, 1] // 4 + (y * 192) // (h - 1)) & 0xFF
    im[:, :, 2] = (im[:, :, 2] // 4 + np.where((x + y) % 2 == 1, 160, 32)) & 0xFF
    return im.astype(np.uint8)


RGB = make_rgb(72, 48, 42)


class TestHaarLifting:
    def test_1d_roundtrip(self):
        """The reference inverse reconstitutes s = 2a, dropping the sum's LSB
        (include/proto_noentropy.hpp:110-120) — so the roundtrip is exact for
        even pair-sums and off by at most 1 otherwise."""
        r = np.random.default_rng(0)
        v = r.integers(-300, 300, size=(17, 16)).astype(np.int32)
        rec = np.asarray(P.haar1d_inv(P.haar1d(v)))
        assert np.abs(rec - v).max() <= 1
        even = v.copy()
        even[..., 1::2] = even[..., 0::2]  # pair sums all even
        assert np.array_equal(np.asarray(P.haar1d_inv(P.haar1d(even))), even)

    def test_2d_roundtrip(self):
        r = np.random.default_rng(1)
        t = r.integers(0, 256, size=(5, 8, 8)).astype(np.int32)
        rec = np.asarray(P.haar2d_inv(P.haar2d(t)))
        assert np.abs(rec - t).max() <= 2  # <=1 LSB per dimension pass

    def test_negative_floor_semantics(self):
        # C++ >>1 on negatives is floor division: (-3 + 0) >> 1 == -2
        out = np.asarray(P.haar1d(np.array([-3, 0], dtype=np.int32)))
        assert out[0] == -2 and out[1] == -3


class TestHaarTilesGolden:
    def test_ll_and_trits_exact(self):
        ll, trits, tx, ty = P.proto_tile_haar_ternary(RGB, P.ProtoParams())
        assert (tx, ty) == (9, 6)
        g_ll = np.fromfile(os.path.join(GOLD, "golden_proto_tile_LL.bin"),
                           dtype=np.uint8)
        g_tr = np.fromfile(os.path.join(GOLD, "golden_proto_tile_trits.bin"),
                           dtype=np.int8)
        assert np.array_equal(np.asarray(ll), g_ll)
        assert np.array_equal(np.asarray(trits), g_tr)

    def test_reconstruction_exact(self):
        params = P.ProtoParams()
        ll, trits, tx, ty = P.proto_tile_haar_ternary(RGB, params)
        rec = np.asarray(P.proto_reconstruct_y_from_tiles(ll, trits, tx, ty,
                                                          params))
        g = np.fromfile(os.path.join(GOLD, "golden_proto_haar_recon.bin"),
                        dtype=np.uint8).reshape(rec.shape)
        assert np.array_equal(rec, g)

    def test_non_multiple_image_pads_by_resize(self):
        _, trits, tx, ty = P.proto_tile_haar_ternary(make_rgb(70, 45, 7),
                                                     P.ProtoParams())
        g = np.fromfile(os.path.join(GOLD, "golden_proto_tile_trits_pad.bin"),
                        dtype=np.int8)
        assert (tx, ty) == (9, 6)
        assert np.array_equal(np.asarray(trits), g)


class TestSpectralSketch:
    def test_golden_tolerance(self):
        """The DCT path is float32 matmul (MXU) vs the reference's sequential
        float accumulation — bin z-scores at the ternarize threshold can flip;
        allow <=2/64 trits to differ."""
        sk = np.asarray(P.proto_spectral_sketch(RGB, P.ProtoParams()))
        g = np.fromfile(os.path.join(GOLD, "golden_proto_sketch_trits.bin"),
                        dtype=np.int8)
        assert sk.shape == g.shape == (64,)
        assert (sk != g).sum() <= 2

    def test_balanced_range(self):
        sk = np.asarray(P.proto_spectral_sketch(RGB, P.ProtoParams()))
        assert set(np.unique(sk)).issubset({-1, 0, 1})


class TestAnisoRC:
    def test_golden_exact(self):
        art = P.proto_aniso_rc_encode(RGB, P.AnisoRCParams())
        g_ll = np.fromfile(os.path.join(GOLD, "golden_proto_rc_LL.bin"),
                           dtype=np.uint8)
        g_tr = np.fromfile(os.path.join(GOLD, "golden_proto_rc_trits.bin"),
                           dtype=np.int8)
        assert np.array_equal(art.block_ll, g_ll)
        assert np.array_equal(art.trits, g_tr)
        assert art.proj_len == 47 and art.angles_used == 8
        assert art.trits_per_block == 8 * 24  # (PL+1)//2 per angle, see
        # docs/DIVERGENCES.md #11

    def test_reconstruct_improves_over_dc(self):
        params = P.AnisoRCParams()
        art = P.proto_aniso_rc_encode(RGB, params)
        rec = P.proto_aniso_rc_reconstruct(art, params)
        assert rec.shape == (art.H, art.W)
        # reconstruction with details must beat DC-only blocks on the Y plane
        from ternary_image_codec_tpu.ops import quant as Q
        padded, W, H = P._pad_to_tiles_nn(jnp.asarray(RGB), params.block)
        yref = np.asarray(Q.rgb_to_ycbcr(padded))[..., 0]
        dc_only = np.repeat(np.repeat(
            art.block_ll.reshape(art.blocks_y, art.blocks_x), params.block,
            axis=0), params.block, axis=1)
        assert P.psnr_y(rec, yref) > P.psnr_y(dc_only, yref) - 0.5

    def test_no_ll_mode(self):
        params = P.AnisoRCParams(keep_ll_u8=False)
        art = P.proto_aniso_rc_encode(RGB, params)
        assert art.block_ll is None
        rec = P.proto_aniso_rc_reconstruct(art, params)
        assert rec.shape == (art.H, art.W)

    def test_fewer_angles(self):
        art = P.proto_aniso_rc_encode(RGB, P.AnisoRCParams(angles=4))
        assert art.angles_used == 4
        assert art.trits.size == art.blocks_x * art.blocks_y * 4 * 24


class TestProfilesRouting:
    def test_availability(self):
        assert not PR.encode_prototype_available(LC.ProtoProfile.NONE)
        assert PR.encode_prototype_available(LC.ProtoProfile.HAAR_TERNARY)
        assert PR.encode_prototype_available(LC.ProtoProfile.ANISO_RC)
        with pytest.raises(ValueError):
            PR.encode_prototype_ternary(RGB, PR.ProtoConfig())

    def test_describe_build(self):
        d = json.loads(PR.describe_prototype_build())
        names = {p["name"] for p in d["prototypes"]}
        assert names == {"HaarTernary", "AnisoRC"}

    @pytest.mark.parametrize("profile", [LC.ProtoProfile.HAAR_TERNARY,
                                         LC.ProtoProfile.ANISO_RC])
    def test_encode_meta_and_pack(self, profile):
        cfg = PR.ProtoConfig(profile=profile)
        bal, packed, meta = PR.encode_prototype_ternary(RGB, cfg)
        m = json.loads(meta)  # must be well-formed JSON
        assert m["counts"]["n_trits"] == bal.size
        assert m["counts"]["tail_trits"] == bal.size % 5
        assert m["counts"]["packed_bytes"] == packed.size
        assert m["counts"]["exact_n_trits"] is True
        assert m["layout"]["balanced"] is True
        # pack roundtrip
        back = PR.unpack_base243_to_balanced(packed, bal.size)
        assert np.array_equal(back, bal)
        # the t3proto n_trits inference chain must recover n_trits from meta
        assert LC.infer_ntrits_from_meta(72, 48, meta, packed.size) == bal.size

    def test_haar_layout_fields(self):
        bal, _, meta = PR.encode_prototype_ternary(
            RGB, PR.ProtoConfig(profile=LC.ProtoProfile.HAAR_TERNARY))
        m = json.loads(meta)
        assert m["layout"]["order"] == "tiles_then_sketch"
        assert m["layout"]["len_tiles"] + m["layout"]["len_sketch"] == bal.size
        assert m["params"]["tile"] == 8 and m["params"]["thresh"] == 6

    def test_t3proto_integration(self, tmp_path):
        cfg = PR.ProtoConfig(profile=LC.ProtoProfile.ANISO_RC)
        bal, packed, meta = PR.encode_prototype_ternary(RGB, cfg)
        p = str(tmp_path / "x.t3proto")
        LC.t3proto_write(p, LC.ProtoProfile.ANISO_RC, 72, 48, bal, packed, meta)
        prof, w, h, gb, gp, gm = LC.t3proto_read(p)
        assert prof == LC.ProtoProfile.ANISO_RC and (w, h) == (72, 48)
        assert np.array_equal(gb, bal)
        assert np.array_equal(gp, packed)
        assert gm == meta

    def test_no_pack_option(self):
        cfg = PR.ProtoConfig(profile=LC.ProtoProfile.HAAR_TERNARY,
                             pack_base243=False)
        bal, packed, meta = PR.encode_prototype_ternary(RGB, cfg)
        assert packed is None
        m = json.loads(meta)
        assert m["counts"]["packed_bytes"] == (bal.size + 4) // 5
