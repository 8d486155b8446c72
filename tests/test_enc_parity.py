"""Parity-only encode RS A/B equivalence: T3_ENC_RS=parity must produce
byte-identical wire words vs the full-G2 dot.

The RS(26,k) code is systematic (decode reads coeffs 0..k-1 as data,
ops/pipeline._decode_body_fn_pm2), so the full-codeword generator dot
recomputes the input in its first k output coeffs; the parity variant
emits only the r parity coeffs and splices data from the grid.  A pure
op-count restructure -- equality must be exact (perf A/B on chip).
"""
import numpy as np
import pytest

from ternary_image_codec_tpu.config import (EncoderConfig, ProfileID,
                                            SparseBeaconCfg,
                                            uep_luma_priority)
from ternary_image_codec_tpu.ops import pipeline


def _clear_caches():
    pipeline._encode_parts_pm.cache_clear()
    pipeline._encode_parts.cache_clear()
    pipeline._encode_fn.cache_clear()
    pipeline._stream_fns.cache_clear()


def _raw(n, seed=11):
    r = np.random.default_rng(seed)
    raw = r.integers(0, 27, size=(n, 9)).astype(np.int8)
    raw[:, 8] = r.integers(0, 9, size=n)
    return raw


CFGS = [
    EncoderConfig(profile=ProfileID.P2_RS26_22, uep=uep_luma_priority()),
    EncoderConfig(profile=ProfileID.P1_RS26_24,
                  beacon=SparseBeaconCfg(words_period=16, band_slot=4,
                                         enabled=True)),
]


@pytest.mark.parametrize("cfg", CFGS, ids=["uep", "beacon"])
def test_parity_encode_matches_full(cfg, monkeypatch):
    raw = _raw(2 * cfg.superframe_words + 100)
    monkeypatch.setenv("T3_ENC_RS", "full")
    _clear_caches()
    w_full = np.asarray(pipeline.encode_stream_superframes(raw, cfg,
                                                           sf_batch=2))
    monkeypatch.setenv("T3_ENC_RS", "parity")
    _clear_caches()
    w_par = np.asarray(pipeline.encode_stream_superframes(raw, cfg,
                                                          sf_batch=2))
    _clear_caches()
    assert np.array_equal(w_full, w_par)


def test_parity_encode_roundtrips(monkeypatch):
    cfg = CFGS[0]
    n = cfg.superframe_words + 17
    raw = _raw(n, seed=3)
    monkeypatch.setenv("T3_ENC_RS", "parity")
    _clear_caches()
    w = pipeline.encode_stream_superframes(raw, cfg, sf_batch=2)
    out, ok = pipeline.decode_stream_superframes(w, cfg, n, sf_batch=2)
    _clear_caches()
    assert bool(ok)
    assert np.array_equal(np.asarray(out), raw)
