"""Pallas fused RS decoder vs the XLA oracle (interpret mode on CPU)."""
import numpy as np
import pytest
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from ternary_image_codec_tpu.ops import rs, rs_pallas
from ternary_image_codec_tpu.ops.gf27 import sym_to_dig


@pytest.mark.parametrize("k", [24, 22])
def test_fused_matches_oracle(k, monkeypatch):
    # interpret mode simulates every lane; shrink the tile so the CPU
    # emulation finishes quickly (the real TPU path uses the full tile)
    monkeypatch.setattr(rs_pallas, "_TILE", 128)
    rs_pallas.decode_dig_fused.clear_cache()
    r = np.random.default_rng(k)
    nblk = 40
    data = r.integers(0, 27, size=(nblk, k), dtype=np.int8)
    cw = np.asarray(rs.encode_jit(jnp.asarray(data), k)).copy()
    t = (26 - k) // 2
    for bi in range(nblk // 2):  # half the blocks get exactly t errors
        pos = r.choice(26, size=t, replace=False)
        for p in pos:
            cw[bi, p] = (cw[bi, p] + 1 + r.integers(0, 25)) % 27
    # and a few uncorrectable blocks (t+1 errors)
    for bi in range(nblk - 3, nblk):
        pos = r.choice(26, size=t + 1, replace=False)
        for p in pos:
            cw[bi, p] = (cw[bi, p] + 1 + r.integers(0, 25)) % 27
    dig = jnp.asarray(np.asarray(sym_to_dig(jnp.asarray(cw))))
    want, want_ok = rs.decode_dig(dig, k)
    with pltpu.force_tpu_interpret_mode():
        got, got_ok = rs_pallas.decode_dig_fused(dig, k)
    assert np.array_equal(np.asarray(got_ok), np.asarray(want_ok))
    # data compared only where decode succeeded (failed blocks carry
    # whatever the correction produced, in both implementations)
    okm = np.asarray(want_ok)
    assert np.array_equal(np.asarray(got)[okm], np.asarray(want)[okm])
    # truth check: within-capacity blocks (<= t errors) decode to the
    # original data.  (t+1-error blocks may legitimately alias onto a
    # different valid codeword with ok=True -- beyond-capacity behavior.)
    orig = np.asarray(sym_to_dig(jnp.asarray(data)))
    within = np.ones(nblk, dtype=bool)
    within[nblk - 3:] = False
    m = okm & within
    assert m[: nblk // 2].all()  # all t-error blocks decoded ok
    assert np.array_equal(np.asarray(got)[m], orig[m])
