"""Trit substrate tests (ports minitest_trits T1-T3, src/minitest_trits.cpp)."""
import numpy as np
import jax.numpy as jnp
import pytest

from ternary_image_codec_tpu.ops import trits


def rng():
    return np.random.default_rng(1)


def biased_trits(r, n):
    # 10% / 80% / 10% bias as in src/minitest_trits.cpp:146-153
    return r.choice([-1, 0, 1], size=n, p=[0.1, 0.8, 0.1]).astype(np.int8)


class TestT1BalancedRoundtrip:
    @pytest.mark.parametrize("n_mode", [27, 24, 21, 18, 15])
    def test_roundtrip(self, n_mode):
        r = rng()
        for _ in range(20):
            b = biased_trits(r, n_mode * 8)
            u = trits.bal_to_unb(b)
            back = trits.unb_to_bal(u)
            np.testing.assert_array_equal(np.asarray(back), b)

    def test_mapping_strict(self):
        np.testing.assert_array_equal(np.asarray(trits.bal_to_unb(np.array([-1, 0, 1]))),
                                      [0, 1, 2])
        np.testing.assert_array_equal(np.asarray(trits.unb_to_bal(np.array([0, 1, 2]))),
                                      [-1, 0, 1])
        # defensive: out-of-range unb maps to 1 (-> balanced 0)
        assert int(trits.unb_to_bal(np.array([7]))[0]) == 0


class TestT2SignedBalanced:
    @pytest.mark.parametrize("L", [5, 9, 13])
    def test_roundtrip_range(self, L):
        lim = (3 ** L - 1) // 2
        vals = np.concatenate([
            np.array([-lim, -1, 0, 1, lim]),
            rng().integers(-lim, lim + 1, size=200),
        ])
        tr = trits.int_to_balanced_fixed(vals, L)
        assert np.asarray(tr).min() >= -1 and np.asarray(tr).max() <= 1
        back = trits.balanced_fixed_to_int(tr)
        np.testing.assert_array_equal(np.asarray(back), vals)


class TestT3Base243:
    def test_pack_unpack_device(self):
        r = rng()
        t = r.integers(0, 3, size=1237).astype(np.int8)
        b = trits.trits_to_base243(t)
        assert np.asarray(b).max() <= 242
        back = trits.base243_to_trits(b, t.size)
        np.testing.assert_array_equal(np.asarray(back), t)

    def test_np_tail_aware(self):
        r = rng()
        for n in [0, 1, 4, 5, 6, 999, 1000]:
            t = r.integers(0, 3, size=n).astype(np.int8)
            by, tail = trits.np_trits_to_base243(t)
            assert tail == n % 5
            back = trits.np_base243_to_trits(by, n)
            np.testing.assert_array_equal(back, t)

    def test_np_stream_flavor(self):
        r = rng()
        t = r.integers(0, 3, size=777).astype(np.int8)
        buf = trits.np_ut_to_base243_stream(t)
        assert len(buf) == 4 + (777 + 4) // 5
        back = trits.np_base243_stream_to_ut(buf)
        np.testing.assert_array_equal(back, t)

    def test_byte_values_match_reference_formula(self):
        # LSD-first: v = t0 + 3 t1 + 9 t2 + 27 t3 + 81 t4
        t = np.array([2, 1, 0, 2, 1], dtype=np.int8)
        v = 2 + 3 * 1 + 27 * 2 + 81 * 1
        assert int(np.asarray(trits.trits_to_base243(t))[0]) == v


class TestPack3:
    def test_pack_unpack(self):
        s = np.arange(27)
        d = trits.unpack3(s)
        np.testing.assert_array_equal(np.asarray(trits.pack3(d[..., 0], d[..., 1], d[..., 2])), s)

    def test_word_bytes(self):
        r = rng()
        w = r.integers(0, 27, size=(11, 9))
        b = trits.words9_to_sym_bytes(w)
        np.testing.assert_array_equal(trits.sym_bytes_to_words9(b), w)
