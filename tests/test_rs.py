"""RS(26,k) tests: port of selftest_rs_unit (must PASS, unlike the reference
whose encoder is broken -- SURVEY.md section 0) plus algebraic validation."""
import numpy as np
import jax.numpy as jnp
import pytest

from ternary_image_codec_tpu.ops import gf27, rs

PROFILE_KS = [24, 22, 20, 18]


def ref_syndromes(cw, k):
    """Syndrome def from the reference decoder
    (old/include/ternary_image_codec_v6_min.hpp:549-560)."""
    r = 26 - k
    out = []
    for j in range(r):
        acc = 0
        for i in range(26):
            acc = gf27.np_gf_add(acc, gf27.np_gf_mul(int(cw[i]), int(gf27.np_alpha_pow((j + 1) * i))))
        out.append(int(acc))
    return out


class TestEncoder:
    @pytest.mark.parametrize("k", PROFILE_KS)
    def test_systematic(self, k):
        data = np.array([(i * 5 + 7) % 27 for i in range(k)])
        cw = np.asarray(rs.encode_jit(jnp.asarray(data[None, :]), k))[0]
        np.testing.assert_array_equal(cw[:k], data)

    @pytest.mark.parametrize("k", PROFILE_KS)
    def test_fresh_codewords_have_zero_syndromes(self, k):
        """The property the REFERENCE encoder fails (nonzero syndromes at
        0 errors, old/.../ternary_image_codec_v6_min.hpp:517-535)."""
        r = np.random.default_rng(7)
        data = r.integers(0, 27, size=(16, k))
        cw = np.asarray(rs.encode_jit(jnp.asarray(data), k))
        for b in range(16):
            assert ref_syndromes(cw[b], k) == [0] * (26 - k)

    @pytest.mark.parametrize("k", PROFILE_KS)
    def test_np_encode_matches_device(self, k):
        r = np.random.default_rng(3)
        data = r.integers(0, 27, size=(8, k))
        np.testing.assert_array_equal(np.asarray(rs.encode_jit(jnp.asarray(data), k)),
                                      rs.np_encode(data, k))

    @pytest.mark.parametrize("k", PROFILE_KS)
    def test_generator_poly_roots(self, k):
        g = rs.generator_poly(k)
        for i in range(1, 26 - k + 1):
            assert gf27.np_poly_eval(g, int(gf27.np_alpha_pow(i))) == 0


class TestDecoder:
    @pytest.mark.parametrize("k", PROFILE_KS)
    def test_clean_roundtrip(self, k):
        r = np.random.default_rng(11)
        data = r.integers(0, 27, size=(32, k))
        cw = rs.encode_jit(jnp.asarray(data), k)
        out, ok = rs.decode_jit(cw, k)
        assert bool(np.all(np.asarray(ok)))
        np.testing.assert_array_equal(np.asarray(out), data)

    @pytest.mark.parametrize("k", PROFILE_KS)
    def test_selftest_rs_unit(self, k):
        """Port of selftest_rs_unit (old/.../v6_min.hpp:1172-1207):
        deterministic data, inject exactly t errors at distinct positions."""
        t = (26 - k) // 2
        data = np.array([(i * 5 + 7) % 27 for i in range(k)])
        cw = np.asarray(rs.encode_jit(jnp.asarray(data[None, :]), k))[0].copy()
        r = np.random.default_rng(1)
        pos = r.choice(26, size=t, replace=False)
        for p in pos:
            cw[p] = gf27.np_gf_add(int(cw[p]), int(r.integers(1, 27)))
        out, ok = rs.decode_jit(jnp.asarray(cw[None, :]), k)
        assert bool(np.asarray(ok)[0])
        np.testing.assert_array_equal(np.asarray(out)[0], data)

    @pytest.mark.parametrize("k", PROFILE_KS)
    @pytest.mark.parametrize("nerr", [0, 1, "t"])
    def test_batched_random_errors(self, k, nerr):
        t = (26 - k) // 2
        ne = t if nerr == "t" else nerr
        if ne > t:
            pytest.skip("beyond capability")
        r = np.random.default_rng(42 + ne)
        B = 64
        data = r.integers(0, 27, size=(B, k))
        cw = np.asarray(rs.encode_jit(jnp.asarray(data), k)).copy()
        for b in range(B):
            pos = r.choice(26, size=ne, replace=False)
            for p in pos:
                cw[b, p] = gf27.np_gf_add(int(cw[b, p]), int(r.integers(1, 27)))
        out, ok = rs.decode_jit(jnp.asarray(cw), k)
        assert bool(np.all(np.asarray(ok)))
        np.testing.assert_array_equal(np.asarray(out), data)

    @pytest.mark.parametrize("k", PROFILE_KS)
    def test_uncorrectable_flags_not_crash(self, k):
        """t+1 random errors must either fail (ok=False) or miscorrect to a
        *valid* codeword -- never crash; most cases should flag."""
        t = (26 - k) // 2
        r = np.random.default_rng(5)
        B = 32
        data = r.integers(0, 27, size=(B, k))
        cw = np.asarray(rs.encode_jit(jnp.asarray(data), k)).copy()
        for b in range(B):
            pos = r.choice(26, size=t + 1, replace=False)
            for p in pos:
                cw[b, p] = gf27.np_gf_add(int(cw[b, p]), int(r.integers(1, 27)))
        out, ok = rs.decode_jit(jnp.asarray(cw), k)
        ok = np.asarray(ok)
        out = np.asarray(out)
        # flagged-ok blocks must decode to a valid codeword (possibly wrong data)
        for b in range(B):
            if ok[b]:
                cw2 = np.asarray(rs.encode_jit(jnp.asarray(out[b][None]), k))[0]
                assert ref_syndromes(cw2, k) == [0] * (26 - k)

    def test_erasureless_burst(self):
        """All-zero codeword + scattered errors decodes back to zeros."""
        k = 18
        cw = np.zeros((4, 26), dtype=np.int64)
        cw[1, 3] = 5
        cw[2, [0, 10]] = [7, 20]
        cw[3, [1, 5, 20, 25]] = [1, 2, 3, 4]
        out, ok = rs.decode_jit(jnp.asarray(cw), k)
        assert bool(np.all(np.asarray(ok)))
        assert np.all(np.asarray(out) == 0)
