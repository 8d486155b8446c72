"""Slab-assembly A/B equivalence: T3_ENC_ASM=slab / T3_DEC_M27=slab must
produce byte-identical wire words and decoded streams vs the per-band
("bands") structure, for every rs_mode, with and without a beacon band.

The slab variants keep per-k-group slabs end to end and ride the row
permutation on host-side constants (scrambler offset rows, the
_unpack702_bw contraction matrix) -- a pure op-count restructure, so
equality must be exact.  (Perf A/B happens on chip; this is correctness.)
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from ternary_image_codec_tpu.config import (EncoderConfig, ProfileID,
                                            SparseBeaconCfg,
                                            uep_luma_priority)
from ternary_image_codec_tpu.ops import pipeline


def _clear_caches():
    pipeline._encode_parts_pm.cache_clear()
    pipeline._encode_parts.cache_clear()
    pipeline._encode_fn.cache_clear()
    pipeline._decode_body_fn_pm2.cache_clear()
    pipeline._decode_body_fn.cache_clear()
    pipeline._stream_fns.cache_clear()


def _with_env(monkeypatch, enc_asm, dec_m27):
    monkeypatch.setenv("T3_ENC_ASM", enc_asm)
    monkeypatch.setenv("T3_DEC_M27", dec_m27)
    _clear_caches()


def _raw(n, seed=7):
    r = np.random.default_rng(seed)
    raw = r.integers(0, 27, size=(n, 9)).astype(np.int8)
    raw[:, 8] = r.integers(0, 9, size=n)    # 26-trit payload: 2-trit band 8
    return raw


CFGS = [
    EncoderConfig(profile=ProfileID.P2_RS26_22, uep=uep_luma_priority()),
    EncoderConfig(profile=ProfileID.P1_RS26_24,
                  beacon=SparseBeaconCfg(words_period=16, band_slot=4,
                                         enabled=True)),
]


@pytest.mark.parametrize("variant", ["slab", "grp"])
@pytest.mark.parametrize("cfg", CFGS, ids=["uep", "beacon"])
def test_encode_slab_matches_bands(cfg, variant, monkeypatch):
    # grp applies only to the beacon-free residue-class layout (uep cfg);
    # with a beacon it must silently fall back to the bands path.
    raw = _raw(3 * cfg.superframe_words - 50)
    _with_env(monkeypatch, "bands", "bands")
    w_bands = np.asarray(pipeline.encode_stream_superframes(raw, cfg,
                                                            sf_batch=2))
    _with_env(monkeypatch, variant, "bands")
    w_slab = np.asarray(pipeline.encode_stream_superframes(raw, cfg,
                                                           sf_batch=2))
    _clear_caches()
    assert np.array_equal(w_bands, w_slab)


@pytest.mark.parametrize("variant", ["slab", "grp"])
@pytest.mark.parametrize("cfg", CFGS, ids=["uep", "beacon"])
@pytest.mark.parametrize("strategy", ["check", "none", "full", "paged"])
def test_decode_slab_matches_bands(cfg, strategy, variant, monkeypatch):
    n = 3 * cfg.superframe_words - 50
    raw = _raw(n)
    _with_env(monkeypatch, "bands", "bands")
    w = pipeline.encode_stream_superframes(raw, cfg, sf_batch=2)
    # scattered corruption within RS capacity (skip for check/none, which
    # must still FLAG dirty identically -- tested via ok below)
    wd = jnp.asarray(w)
    if strategy in ("full", "paged"):
        wd = wd.at[1, 700, 3].set((wd[1, 700, 3] + 1) % 27)
    out_b, ok_b = pipeline.decode_stream_superframes(
        wd, cfg, n, sf_batch=2, strategy=strategy)
    _with_env(monkeypatch, "bands", variant)
    out_s, ok_s = pipeline.decode_stream_superframes(
        wd, cfg, n, sf_batch=2, strategy=strategy)
    _clear_caches()
    assert bool(ok_b) == bool(ok_s)
    assert np.array_equal(np.asarray(out_b), np.asarray(out_s))
    if strategy in ("full", "paged"):
        assert bool(ok_s) and np.array_equal(np.asarray(out_s), raw)


def test_two_phase_auto_with_slabs(monkeypatch):
    cfg = CFGS[0]
    n = 2 * cfg.superframe_words
    raw = _raw(n, seed=9)
    _with_env(monkeypatch, "slab", "slab")
    w = pipeline.encode_stream_superframes(raw, cfg, sf_batch=2)
    wd = jnp.asarray(w).at[0, 123, 5].set((w[0, 123, 5] + 2) % 27)
    out, ok = pipeline.decode_stream_superframes(wd, cfg, n, sf_batch=2)
    _clear_caches()
    assert bool(ok)
    assert np.array_equal(np.asarray(out), raw)
