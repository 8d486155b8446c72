"""Superframe header + CRC-12 + scrambler + interleave tests."""
import numpy as np
import jax.numpy as jnp
import pytest

from ternary_image_codec_tpu.config import (CosetID, ProfileID, ScramblerSeed,
                                            SparseBeaconCfg, SubwordMode,
                                            SuperframeHeader, Tile2D,
                                            UEPLayout, uep_luma_priority)
from ternary_image_codec_tpu.ops import header, interleave, scramble


def sample_header():
    return SuperframeHeader(
        profile=ProfileID.P5_RS26_22_2D,
        uep=uep_luma_priority(),
        tile=Tile2D(8, 4),
        seed=ScramblerSeed(2, 1, 0),
        band_map_hash=12345 % (27 ** 3),
        frame_seq=777 % (27 ** 3),
        beacon=SparseBeaconCfg(words_period=13, band_slot=4, enabled=True),
        subword=SubwordMode.S21,
        centered=True,
        coset=CosetID.C2,
    )


class TestCRC12:
    def test_matrix_matches_lfsr(self):
        r = np.random.default_rng(9)
        M = header.crc12_matrix().astype(np.int64)
        for _ in range(20):
            m = r.integers(0, 3, size=header.MSG_TRITS)
            np.testing.assert_array_equal((m @ M) % 3, header.crc12_lfsr(m))

    def test_zero_message(self):
        np.testing.assert_array_equal(header.crc12_lfsr(np.zeros(69)), np.zeros(12))


class TestHeaderCodec:
    def test_roundtrip(self):
        h = sample_header()
        syms = header.pack(h)
        assert syms.shape == (27,) and syms.max() < 27 and syms.min() >= 0
        assert header.check(syms)
        h2 = header.unpack(syms)
        assert h2.profile == h.profile
        assert h2.uep == h.uep  # NB: self-consistent (ref swaps bands 0<->2)
        assert h2.tile == h.tile
        assert (h2.seed.a, h2.seed.b, h2.seed.s0) == (2, 1, 0)
        assert h2.band_map_hash == h.band_map_hash
        assert h2.frame_seq == h.frame_seq
        assert h2.beacon == h.beacon
        assert h2.subword == h.subword
        assert h2.centered == h.centered
        assert h2.coset == h.coset
        assert h2.magic == 0x0A2

    def test_corruption_detected(self):
        syms = header.pack(sample_header())
        for slot in range(27):
            bad = syms.copy()
            bad[slot] = (bad[slot] + 1) % 27
            assert not header.check(bad), f"slot {slot} corruption missed"

    def test_beacon_period_clamped(self):
        h = SuperframeHeader(beacon=SparseBeaconCfg(words_period=100,
                                                    band_slot=1, enabled=True))
        syms = header.pack(h)
        assert header.unpack(syms).beacon.words_period == 26

    def test_check_batched_device(self):
        syms = header.pack(sample_header())
        batch = np.stack([syms, (syms + 1) % 27])
        got = np.asarray(header.check_batched(jnp.asarray(batch)))
        np.testing.assert_array_equal(got, [True, False])


class TestScrambler:
    @pytest.mark.parametrize("a,b,s0", [(1, 1, 1), (0, 2, 1), (2, 1, 0),
                                        (2, 2, 2), (1, 0, 2), (0, 0, 0)])
    def test_closed_form_matches_serial(self, a, b, s0):
        n = 200
        got = np.asarray(scramble.offsets(n, a, b, s0))
        np.testing.assert_array_equal(got, scramble.np_offsets(n, a, b, s0))

    @pytest.mark.parametrize("a,b,s0", [(1, 1, 1), (2, 1, 0), (0, 2, 2)])
    def test_roundtrip(self, a, b, s0):
        r = np.random.default_rng(0)
        s = r.integers(0, 27, size=500)
        sc = scramble.scramble(jnp.asarray(s), a, b, s0)
        back = scramble.descramble(sc, a, b, s0)
        np.testing.assert_array_equal(np.asarray(back), s)

    def test_masked_leaves_cells(self):
        s = np.arange(27)
        keep = np.ones(27, dtype=bool)
        keep[5] = False
        sc = np.asarray(scramble.scramble_masked(jnp.asarray(s), 1, 1, 1,
                                                 jnp.asarray(keep)))
        assert sc[5] == 5

    def test_scramble_semantics_vs_reference(self):
        """Symbol scrambling = add st to each trit (old/.../v6_min.hpp:81-87)."""
        s, a, b, s0 = np.array([17]), 2, 1, 1
        st = scramble.np_offsets(1, a, b, s0)[0]
        d = [(17 % 3 + st) % 3, (17 // 3 % 3 + st) % 3, (17 // 9 % 3 + st) % 3]
        want = d[0] + 3 * d[1] + 9 * d[2]
        got = int(np.asarray(scramble.scramble(jnp.asarray(s), a, b, s0))[0])
        assert got == want


class TestInterleave:
    @pytest.mark.parametrize("n,w,h", [(96, 8, 4), (100, 8, 4), (31, 4, 4),
                                       (5, 4, 4), (0, 4, 4), (64, 1, 1)])
    def test_bijective(self, n, w, h):
        s = np.arange(n)
        il = interleave.interleave(jnp.asarray(s), w, h)
        back = interleave.deinterleave(il, w, h)
        np.testing.assert_array_equal(np.asarray(back), s)

    def test_snake_order_reference(self):
        """Full 4x3 tile: rows 0,2 forward, row 1 reversed
        (old/.../v6_min.hpp:749-780)."""
        got = np.asarray(interleave.interleave(jnp.arange(12), 4, 3))
        want = [0, 1, 2, 3, 7, 6, 5, 4, 8, 9, 10, 11]
        np.testing.assert_array_equal(got, want)

    def test_partial_chunk_matches_cpp_filter(self):
        """Partial final chunk uses snake order filtered to idx < take."""
        # n=10, tile 4x3 (A=12): second chunk? no -- single partial chunk
        got = np.asarray(interleave.interleave(jnp.arange(10), 4, 3))
        # snake order [0,1,2,3,7,6,5,4,8,9,10,11] filtered to <10
        want = [0, 1, 2, 3, 7, 6, 5, 4, 8, 9]
        np.testing.assert_array_equal(got, want)

    def test_zero_tile_passthrough(self):
        s = np.arange(7)
        np.testing.assert_array_equal(
            np.asarray(interleave.interleave(jnp.asarray(s), 0, 0)), s)
