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


class TestDecodePaged:
    """decode_dig_paged: page-compacted correction (pipeline fast path)."""

    def _mk(self, k, B, seed=0):
        r = np.random.default_rng(seed)
        data = r.integers(0, 3, size=(B, k, 3)).astype(np.int8)
        return data, np.asarray(rs.encode_dig(jnp.asarray(data), k))

    @pytest.mark.parametrize("k", [24, 20])
    def test_clean_matches_decode_dig(self, k):
        data, cw = self._mk(k, 1000)
        d, ok = rs.decode_dig_paged(jnp.asarray(cw), k, page=64)
        assert np.array_equal(np.asarray(d), data) and bool(jnp.all(ok))

    def test_scattered_errors_within_capacity(self):
        k = 22
        data, cw = self._mk(k, 2048, seed=1)
        bad = cw.copy()
        hit = [5, 300, 701, 1500, 2000]
        for b in hit:  # t=2 for k=22: inject 2 errors per hit block
            bad[b, 3, :] = (bad[b, 3, :] + 1) % 3
            bad[b, 17, :] = (bad[b, 17, :] + 2) % 3
        d, ok = rs.decode_dig_paged(jnp.asarray(bad), k, page=64,
                                    max_dirty_pages=8)
        assert np.array_equal(np.asarray(d), data)
        assert bool(jnp.all(ok))

    def test_beyond_page_capacity_flags_not_silent(self):
        """More dirty pages than capacity: overflow blocks return ok=False
        and uncorrected data -- fail-safe, never silently wrong."""
        k = 24
        data, cw = self._mk(k, 64 * 16, seed=2)
        bad = cw.copy()
        dirty_blocks = [i * 64 for i in range(16)]  # 16 pages dirty
        for b in dirty_blocks:
            bad[b, 7, 0] = (bad[b, 7, 0] + 1) % 3
        d, ok = rs.decode_dig_paged(jnp.asarray(bad), k, page=64,
                                    max_dirty_pages=4)
        d, ok = np.asarray(d), np.asarray(ok)
        # exactly 4 pages corrected, 12 overflow pages flagged
        n_fixed = sum(bool(ok[b]) for b in dirty_blocks)
        assert n_fixed == 4
        for b in dirty_blocks:
            if ok[b]:
                assert np.array_equal(d[b], data[b])
            else:
                assert np.array_equal(d[b], bad[b, :k])  # uncorrected
        # clean blocks untouched and ok
        clean = np.ones(len(ok), dtype=bool)
        clean[dirty_blocks] = False
        assert ok[clean].all()
        assert np.array_equal(d[clean], data[clean])

    def test_nonmultiple_page_and_tiny_batch(self):
        k = 18
        data, cw = self._mk(k, 77, seed=3)  # npage=2 with page=64, pad=51
        bad = cw.copy()
        bad[76, 0, :] = (bad[76, 0, :] + 1) % 3  # error in the padded page
        d, ok = rs.decode_dig_paged(jnp.asarray(bad), k, page=64)
        assert np.array_equal(np.asarray(d), data) and bool(jnp.all(ok))
        # tiny batch smaller than one page
        data2, cw2 = self._mk(k, 5, seed=4)
        bad2 = cw2.copy()
        bad2[2, 10, :] = (bad2[2, 10, :] + 2) % 3
        d2, ok2 = rs.decode_dig_paged(jnp.asarray(bad2), k, page=64)
        assert np.array_equal(np.asarray(d2), data2) and bool(jnp.all(ok2))

    def test_uncorrectable_in_gathered_page_flags(self):
        """3 errors > t=2 at k=22, with a pattern verified to defeat
        miscorrection (beyond-distance patterns CAN decode to a different
        valid codeword -- inherent to RS; this one does not)."""
        k = 22
        data, cw = self._mk(k, 128, seed=5)
        bad = cw.copy()
        for pos in (0, 5, 13):
            bad[10, pos, 0] = (bad[10, pos, 0] + 1) % 3
        d, ok = rs.decode_dig_paged(jnp.asarray(bad), k, page=64)
        ok = np.asarray(ok)
        assert not ok[10]
        others = np.arange(128) != 10
        assert ok[others].all()
        assert np.array_equal(np.asarray(d)[others], data[others])


class TestDecodeDelta:
    """decode_delta_pm_bk: sparse-correction API (pipeline hot path)."""

    def test_delta_matches_paged(self):
        k = 22
        r0 = np.random.default_rng(8)
        data = r0.integers(0, 3, size=(3, 18 * 20, k)).astype(np.int8)
        cw = np.asarray(rs.encode_pm_blocks(jnp.asarray(data), k))
        bad = cw.copy()
        for b in (5, 100, 250):
            bad[:, b, 7] = (bad[:, b, 7] + 1) % 3
        delta, ok = rs.decode_delta_pm_bk(jnp.asarray(bad), k, page=18)
        got = (np.asarray(bad)[:, :, :k] + np.asarray(delta)) % 3
        assert np.array_equal(got, data)
        assert bool(jnp.all(ok))
        # clean input -> all-zero delta
        d2, ok2 = rs.decode_delta_pm_bk(jnp.asarray(cw), k, page=18)
        assert not np.any(np.asarray(d2)) and bool(jnp.all(ok2))

    def test_delta_capacity_overflow_flags(self):
        k = 24
        r0 = np.random.default_rng(9)
        data = r0.integers(0, 3, size=(3, 16 * 12, k)).astype(np.int8)
        cw = np.asarray(rs.encode_pm_blocks(jnp.asarray(data), k))
        bad = cw.copy()
        dirty = [i * 16 for i in range(8)]  # 8 dirty pages, C=4
        for b in dirty:
            bad[0, b, 2] = (bad[0, b, 2] + 1) % 3
        delta, ok = rs.decode_delta_pm_bk(jnp.asarray(bad), k, page=16,
                                          max_dirty_pages=4)
        ok = np.asarray(ok)
        assert sum(bool(ok[b]) for b in dirty) == 4
        got = (np.asarray(bad)[:, :, :k] + np.asarray(delta)) % 3
        for b in dirty:
            if ok[b]:
                assert np.array_equal(got[:, b], data[:, b])
        clean = np.ones(len(ok), dtype=bool)
        clean[dirty] = False
        assert ok[clean].all()
        assert np.array_equal(got[:, clean], data[:, clean])

    def test_pick_page(self):
        assert rs.pick_page(1818) == 18
        assert rs.pick_page(909) == 9
        assert 8 <= rs.pick_page(64 * 7) <= 64
        assert rs.pick_page(101) is None  # prime beyond range


class TestMixedChain:
    """rs._correct_pm_mixed: one chain over blocks of different k must be
    bit-identical per block to the per-k _correct_pm -- data AND ok,
    including beyond-capacity (overflow/miscorrection) decisions."""

    def test_mixed_matches_per_k(self):
        rng = np.random.default_rng(7)
        ks = [24, 22, 20, 18]
        rmax = max(26 - k for k in ks)
        B_per = 96
        blocks, rvec, S_list, ref = [], [], [], []
        for k in ks:
            r = 26 - k
            cw = rs.np_encode(rng.integers(0, 27, size=(B_per, k)), k)
            dig = np.stack([cw % 3, cw // 3 % 3, cw // 9 % 3], 0)
            for b in range(B_per):      # 0 .. t+2 injected symbol errors
                ne = rng.integers(0, r // 2 + 3)
                for p in rng.choice(26, ne, replace=False):
                    dig[:, b, p] = rng.integers(0, 3, 3)
            pm = jnp.asarray(dig.transpose(0, 2, 1))     # (3, 26, B)
            S = rs.syndromes_pm(pm, k)
            ref.append(rs._correct_pm(pm, S, k))
            S_list.append(np.pad(np.asarray(S),
                                 ((0, 0), (0, rmax - r), (0, 0))))
            blocks.append(dig)
            rvec += [r] * B_per
        recv = jnp.asarray(np.concatenate(
            [d.transpose(0, 2, 1) for d in blocks], axis=2))
        fixed, ok = rs._correct_pm_mixed(
            recv, jnp.asarray(np.concatenate(S_list, axis=2)),
            np.asarray(rvec, np.int32), rmax)
        fixed, ok = np.asarray(fixed), np.asarray(ok)
        off = 0
        saw_overflow = False
        for (d_ref, ok_ref), k in zip(ref, ks):
            sl = slice(off, off + B_per)
            assert np.array_equal(fixed[:, :k, sl], np.asarray(d_ref))
            assert np.array_equal(ok[sl], np.asarray(ok_ref))
            saw_overflow |= not np.asarray(ok_ref).all()
            off += B_per
        assert saw_overflow  # the sweep exercised beyond-capacity blocks
