"""D-major digit-plane A/B equivalence.

T3_ENC_COLS=dmaj (encode: three (9, sf) digit planes concatenated along
the leading axis + the _pack702_dm contraction) and T3_DEC_DIG=dmaj
(decode: d-major (27, H) grid, syndromes via dot dimension numbers,
assembly-dot constant row permutation) are pure layout restructures of
the digit extraction -- wire words, decoded streams, and ok flags must
be byte-identical to the default paths.  (The default word-major stack's
minor-dims tile padding measured ~29 ms/frame on each side -- the
round-2 prefix probe; perf A/B happens on chip, this is correctness.)

Also covers raw_wire="planes" (RAW input staged (9, n) plane-major).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from ternary_image_codec_tpu.config import (EncoderConfig, ProfileID,
                                            SparseBeaconCfg, Tile2D,
                                            uep_luma_priority)
from ternary_image_codec_tpu.ops import pipeline


def _clear_caches():
    pipeline._encode_parts_pm.cache_clear()
    pipeline._encode_parts_cm.cache_clear()
    pipeline._encode_parts.cache_clear()
    pipeline._encode_fn.cache_clear()
    pipeline._decode_body_fn_pm2.cache_clear()
    pipeline._decode_body_fn.cache_clear()
    pipeline._stream_fns.cache_clear()


def _with_env(monkeypatch, enc_cols=None, dec_dig=None, dec_m27=None):
    for var, val in (("T3_ENC_COLS", enc_cols), ("T3_DEC_DIG", dec_dig),
                     ("T3_DEC_M27", dec_m27)):
        if val is None:
            monkeypatch.delenv(var, raising=False)
        else:
            monkeypatch.setenv(var, val)
    _clear_caches()


def _raw(n, seed=7):
    r = np.random.default_rng(seed)
    raw = r.integers(0, 27, size=(n, 9)).astype(np.int8)
    raw[:, 8] = r.integers(0, 9, size=n)
    return raw


CFGS = [
    EncoderConfig(profile=ProfileID.P2_RS26_22, uep=uep_luma_priority()),
    EncoderConfig(profile=ProfileID.P1_RS26_24,
                  beacon=SparseBeaconCfg(words_period=16, band_slot=4,
                                         enabled=True)),
    EncoderConfig(profile=ProfileID.P5_RS26_22_2D,
                  tile=Tile2D(8, 8)),
]
IDS = ["uep", "beacon", "p5"]


@pytest.mark.parametrize("cfg", CFGS, ids=IDS)
def test_encode_dmaj_matches_default(cfg, monkeypatch):
    # p5/beacon exercise the fallback inside the dmaj gate
    raw = _raw(3 * cfg.superframe_words - 50)
    _with_env(monkeypatch)
    w_def = np.asarray(pipeline.encode_stream_superframes(raw, cfg,
                                                          sf_batch=2))
    _with_env(monkeypatch, enc_cols="dmaj")
    w_dm = np.asarray(pipeline.encode_stream_superframes(raw, cfg,
                                                         sf_batch=2))
    _clear_caches()
    assert np.array_equal(w_def, w_dm)


@pytest.mark.parametrize("enc_cols", [None, "dmaj"])
def test_encode_raw_planes_matches_words(enc_cols, monkeypatch):
    cfg = CFGS[0]
    sf = cfg.superframe_words
    raw = _raw(2 * sf)
    _with_env(monkeypatch, enc_cols=enc_cols)
    _l, _d, enc_w, _dec = pipeline._stream_fns(cfg, 2, rs_mode="check")
    _l, _d, enc_p, _dec = pipeline._stream_fns(cfg, 2, rs_mode="check",
                                               raw_wire="planes")
    chunks = raw.reshape(2, sf, 9)
    w_words = np.asarray(enc_w(jnp.asarray(chunks)))
    w_planes = np.asarray(enc_p(jnp.asarray(chunks.transpose(0, 2, 1))))
    _clear_caches()
    assert np.array_equal(w_words, w_planes)


@pytest.mark.parametrize("cfg", CFGS[:2], ids=IDS[:2])
@pytest.mark.parametrize("strategy", ["check", "none"])
@pytest.mark.parametrize("m27", [None, "grp"])
def test_decode_dmaj_matches_default(cfg, strategy, m27, monkeypatch):
    n = 3 * cfg.superframe_words - 50
    raw = _raw(n)
    _with_env(monkeypatch)
    w = pipeline.encode_stream_superframes(raw, cfg, sf_batch=2)
    # flip one symbol: check mode must FLAG dirty identically (ok False)
    wd = jnp.asarray(w).at[1, 700, 3].set((w[1, 700, 3] + 1) % 27)
    for words, label in ((jnp.asarray(w), "clean"), (wd, "dirty")):
        _with_env(monkeypatch, dec_dig=None, dec_m27=m27)
        out_b, ok_b = pipeline.decode_stream_superframes(
            words, cfg, n, sf_batch=2, strategy=strategy)
        _with_env(monkeypatch, dec_dig="dmaj", dec_m27=m27)
        out_d, ok_d = pipeline.decode_stream_superframes(
            words, cfg, n, sf_batch=2, strategy=strategy)
        assert bool(ok_b) == bool(ok_d), label
        assert np.array_equal(np.asarray(out_b), np.asarray(out_d)), label
    _clear_caches()


def test_two_phase_auto_with_dmaj(monkeypatch):
    # auto: phase 1 (check) runs dmaj, phase 2 repair takes the band-major
    # paged path -- the mix must still round-trip corrupted streams
    cfg = CFGS[0]
    n = 2 * cfg.superframe_words
    raw = _raw(n, seed=9)
    _with_env(monkeypatch, enc_cols="dmaj", dec_dig="dmaj")
    w = pipeline.encode_stream_superframes(raw, cfg, sf_batch=2)
    wd = jnp.asarray(w).at[0, 123, 5].set((w[0, 123, 5] + 2) % 27)
    out, ok = pipeline.decode_stream_superframes(wd, cfg, n, sf_batch=2)
    _clear_caches()
    assert bool(ok)
    assert np.array_equal(np.asarray(out), raw)
