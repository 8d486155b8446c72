"""Fused Pallas check-decode kernel vs the XLA check path (interpret mode).

The kernel (ops/dec_pallas.py) fuses the whole verify+extract superframe
decode -- digit unpack, descramble, full syndrome check, k-extract,
13-block-periodic restride, word assembly -- into one VMEM-resident
Pallas program.  It must be bit-identical to the XLA implementation
(pipeline._decode_body_fn, rs_mode="check", wire="planes") on clean
streams and must flag exactly the corrupted superframes dirty.
Reference semantics: old/include/ternary_image_codec_v6_min.hpp:938-993.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ternary_image_codec_tpu.config import (
    EncoderConfig, ProfileID, uep_luma_priority,
)
from ternary_image_codec_tpu.ops import dec_pallas, pipeline


def _stream(cfg, n_sf, seed=0):
    lay, dlay, enc, dec_chk = pipeline._stream_fns(
        cfg, 8, rs_mode="check", ok_per_sf=True)
    r = np.random.default_rng(seed)
    chunks = jnp.asarray(
        r.integers(0, 27, size=(n_sf, cfg.superframe_words, 9), dtype=np.int8))
    words = enc(chunks)
    return dlay, dec_chk, words


@pytest.mark.parametrize("profile", [ProfileID.P2_RS26_22,
                                     ProfileID.P1_RS26_24])
def test_fused_matches_xla_clean(profile):
    cfg = EncoderConfig(profile=profile, uep=uep_luma_priority())
    dlay, dec_chk, words = _stream(cfg, 16)
    assert dec_pallas.supported(dlay)
    fused = dec_pallas.check_decode_fn(dlay, interpret=True)
    body = words[:, :, pipeline.HEADER_WORDS:]
    out, ok = jax.jit(fused)(body)
    raw_x, ok_x = dec_chk(words)
    assert np.array_equal(np.asarray(raw_x), np.asarray(out))
    assert np.asarray(ok).all() and np.asarray(ok_x).all()


def test_fused_flags_dirty_superframes():
    cfg = EncoderConfig(profile=ProfileID.P2_RS26_22, uep=uep_luma_priority())
    dlay, _, words = _stream(cfg, 12, seed=3)
    fused = dec_pallas.check_decode_fn(dlay, interpret=True)
    bad = np.asarray(words[:, :, pipeline.HEADER_WORDS:]).copy()
    hit = [2, 7]
    for i, sfi in enumerate(hit):
        bad[sfi, (3 * i) % 9, 100 + 37 * i] = \
            (bad[sfi, (3 * i) % 9, 100 + 37 * i] + 1 + i) % 27
    out, ok = jax.jit(fused)(jnp.asarray(bad))
    ok = np.asarray(ok)
    assert not ok[hit].any()
    assert ok[[i for i in range(12) if i not in hit]].all()


def test_supported_gates():
    # beacon and P5 (2D interleave) configs must fall back to XLA
    from ternary_image_codec_tpu.config import Tile2D
    cfg = EncoderConfig(profile=ProfileID.P5_RS26_22_2D, tile=Tile2D(8, 4),
                        uep=uep_luma_priority())
    _, dlay, _, _ = pipeline._stream_fns(cfg, 8, rs_mode="check",
                                         ok_per_sf=True)
    assert not dec_pallas.supported(dlay)
