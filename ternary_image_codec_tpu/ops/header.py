"""Superframe header (27 GF27 symbols) + ternary CRC-12.

Layout parity with HeaderCodec (old/include/ternary_image_codec_v6_min.hpp:
206-380) and old/documentation.txt:88-124:

  slot 0,1   magic (base-27 LE)          slot 12     subword + 9*centered
  slot 2     version                     slot 13-15  band_map_hash (base-27)
  slot 3     profile                     slot 16     coset (mod 3)
  slot 4-6   UEP bands (3 per symbol,    slot 17-19  frame_seq (base-27)
             MSD-first *within* symbol)  slot 20-22  CRC trits 0-8
  slot 7,8   tile w,h (mod 27)           slot 23     beacon enabled
  slot 9-11  seed a,b,s0 (mod 27)        slot 24     beacon band_slot
                                         slot 25     min(words_period, 26)
                                         slot 26     CRC trits 9-11

CRC-12 over GF(3): LFSR for g(x) = x^12 + x^7 + x^4 + x^3 + 1
(old/.../v6_min.hpp:179-204), computed over the trits of all symbols except
slots {20,21,22,26}, followed by 12 zero-flush steps.  The LFSR is linear
over GF(3), so the whole CRC is one precomputed (69 x 12) mod-3 matrix --
a single small matmul on device, the LFSR loop exists only as a host oracle.
"""
from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from ..config import (CosetID, ProfileID, ScramblerSeed, SparseBeaconCfg,
                      SubwordMode, SuperframeHeader, Tile2D, UEPLayout)
from .gf27 import mod3_matmul

CRC_L = 12
CRC_SLOTS = (20, 21, 22, 26)
MSG_SLOTS = tuple(i for i in range(27) if i not in CRC_SLOTS)  # 23 symbols
MSG_TRITS = len(MSG_SLOTS) * 3  # 69

_SUB_CODE = {SubwordMode.S27: 0, SubwordMode.S24: 1, SubwordMode.S21: 2,
             SubwordMode.S18: 3, SubwordMode.S15: 4}
_SUB_FROM_CODE = {v: k for k, v in _SUB_CODE.items()}


def crc12_lfsr(trits) -> np.ndarray:
    """Host oracle: mod-3 LFSR remainder (old/.../v6_min.hpp:179-204)."""
    r = np.zeros(CRC_L, dtype=np.int64)

    def step(t):
        fb = (t + r[CRC_L - 1]) % 3
        nx = np.empty_like(r)
        nx[0] = fb
        nx[1] = r[0]
        nx[2] = r[1]
        nx[3] = (r[2] + fb) % 3
        nx[4] = (r[3] + fb) % 3
        nx[5:7] = r[4:6]
        nx[7] = (r[6] + fb) % 3
        nx[8:12] = r[7:11]
        r[:] = nx

    for t in np.asarray(trits, dtype=np.int64):
        step(t)
    for _ in range(CRC_L):
        step(0)
    return r.copy()


@functools.cache
def crc12_matrix() -> np.ndarray:
    """(MSG_TRITS, 12) GF(3) matrix: crc = msg_trits @ M mod 3 (CRC is linear)."""
    M = np.zeros((MSG_TRITS, CRC_L), dtype=np.int8)
    for i in range(MSG_TRITS):
        e = np.zeros(MSG_TRITS, dtype=np.int64)
        e[i] = 1
        M[i] = crc12_lfsr(e)
    # sanity: linearity reproduces the LFSR on a random message
    rng = np.random.default_rng(0)
    m = rng.integers(0, 3, size=MSG_TRITS)
    assert np.array_equal((m @ M.astype(np.int64)) % 3, crc12_lfsr(m))
    return M


def _msg_trits_from_symbols(symbols: np.ndarray) -> np.ndarray:
    """(..., 27) symbols -> (..., 69) trits of non-CRC slots, LSD-first."""
    s = np.asarray(symbols, dtype=np.int64)[..., list(MSG_SLOTS)]
    d = np.stack([s % 3, (s // 3) % 3, (s // 9) % 3], axis=-1)
    return d.reshape(*s.shape[:-1], MSG_TRITS)


def _crc_syms_from_trits(r: np.ndarray) -> np.ndarray:
    """12 CRC trits -> 4 symbols for slots 20,21,22,26."""
    r = np.asarray(r, dtype=np.int64).reshape(*r.shape[:-1], 4, 3)
    return r[..., 0] + 3 * r[..., 1] + 9 * r[..., 2]


def pack(h: SuperframeHeader) -> np.ndarray:
    """Header -> 27 GF27 symbols (numpy int8), with CRC-12 filled in."""
    s = np.zeros(27, dtype=np.int64)
    s[0] = h.magic % 27
    s[1] = (h.magic // 27) % 27
    s[2] = h.version % 27
    s[3] = int(h.profile) % 27
    for g in range(3):  # UEP: 3 bands per symbol, first band most-significant
        u = 0
        for i in range(3 * g, 3 * g + 3):
            u = u * 3 + (h.uep.band_profile[i] % 3)
        s[4 + g] = u
    s[7] = h.tile.w % 27
    s[8] = h.tile.h % 27
    s[9] = h.seed.a % 27
    s[10] = h.seed.b % 27
    s[11] = h.seed.s0 % 27
    s[12] = (_SUB_CODE[h.subword] + 9 * (1 if h.centered else 0)) % 27
    s[13] = h.band_map_hash % 27
    s[14] = (h.band_map_hash // 27) % 27
    s[15] = (h.band_map_hash // 729) % 27
    s[16] = int(h.coset) % 3
    s[17] = h.frame_seq % 27
    s[18] = (h.frame_seq // 27) % 27
    s[19] = (h.frame_seq // 729) % 27
    s[23] = 1 if h.beacon.enabled else 0
    s[24] = h.beacon.band_slot % 27
    s[25] = min(h.beacon.words_period, 26)
    crc = (_msg_trits_from_symbols(s) @ crc12_matrix().astype(np.int64)) % 3
    s[list(CRC_SLOTS)] = _crc_syms_from_trits(crc)
    return s.astype(np.int8)


def check(symbols: np.ndarray) -> bool:
    """CRC check (old/.../v6_min.hpp:290-316)."""
    s = np.asarray(symbols, dtype=np.int64)
    crc = (_msg_trits_from_symbols(s) @ crc12_matrix().astype(np.int64)) % 3
    return bool(np.array_equal(_crc_syms_from_trits(crc), s[list(CRC_SLOTS)]))


def unpack(symbols: np.ndarray) -> SuperframeHeader:
    """27 symbols -> SuperframeHeader (old/.../v6_min.hpp:317-379)."""
    s = [int(x) % 27 for x in np.asarray(symbols)]
    uep = []
    for g in range(3):
        v = s[4 + g]
        t0, t1, t2 = v % 3, (v // 3) % 3, (v // 9) % 3
        # pack was MSD-first: u = b0*9 + b1*3 + b2
        uep.extend([t2, t1, t0])
    v12 = s[12]
    return SuperframeHeader(
        magic=s[0] + 27 * s[1],
        version=s[2],
        profile=ProfileID(s[3] % 5),
        uep=UEPLayout(tuple(uep)),
        tile=Tile2D(s[7], s[8]),
        seed=ScramblerSeed(s[9], s[10], s[11]),
        band_map_hash=s[13] + 27 * s[14] + 729 * s[15],
        coset=CosetID(s[16] % 3),
        frame_seq=s[17] + 27 * s[18] + 729 * s[19],
        beacon=SparseBeaconCfg(words_period=s[25], band_slot=s[24] % 9,
                               enabled=s[23] != 0),
        subword=_SUB_FROM_CODE.get(v12 % 9, SubwordMode.S27),
        centered=((v12 // 9) % 3) != 0,
    )


# Device-side batched CRC check (for batched multi-frame decode) -------------


def check_batched(symbols):
    """(..., 27) device symbols -> (...,) bool CRC-ok."""
    s = jnp.asarray(symbols).astype(jnp.int32)
    msg = s[..., list(MSG_SLOTS)]
    d = jnp.stack([msg % 3, (msg // 3) % 3, (msg // 9) % 3], axis=-1)
    d = d.reshape(*msg.shape[:-1], MSG_TRITS)
    crc = mod3_matmul(d, crc12_matrix()).reshape(*msg.shape[:-1], 4, 3)
    got = crc[..., 0] + 3 * crc[..., 1] + 9 * crc[..., 2]
    want = s[..., list(CRC_SLOTS)]
    return jnp.all(got == want, axis=-1)
