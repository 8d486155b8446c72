"""Device-side wire <-> base-243 byte serialization for serving.

The serve path (frames -> device encode -> T3V6 container on disk ->
approve-gated read -> device decode) needs the wire symbol stream as
BYTES on the host.  Packing on the host is off the table: the native
single-thread base-243 packer measured ~0.66 Gtrit/s (~0.65 s per 8K
frame's 432M trits) on this box's ONE cpu, so both directions run as
device ops fused into the codec dispatch -- the host only ever touches
the final byte buffer (CRC32 + file IO).

Byte-stream convention (documented for the container, byte-exact with
ops/trits base-243 semantics -- include/ternary_packing.hpp:18-27):
  * per superframe: the (9, total) wire plane grid in C order (band-major
    symbol stream), each GF(27) symbol expanded to 3 trits LSD-first,
    giving 9*total*3 trits;
  * trits packed 5-per-byte LSD-first (base 243), the superframe's tail
    byte zero-padded, so every superframe occupies exactly
    ceil(9*total*3/5) bytes and frames concatenate cleanly;
  * a frame's payload is its superframes' byte rows concatenated, padded
    to a multiple of 4 and viewed as <u4 for the T3V6 uint32 word ABI
    (include/io_t3p_t3v.hpp:16-84 -- the reference's own Word27-on-disk
    ABI stores only 16 of 27 trits, ternary_image_codec_v6_min.hpp:82-92,
    so the rebuild serializes the full stream the reference's base-243
    packing component defines instead; docs/DIVERGENCES.md).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .trits import sym_to_trits

_POW5 = np.array([1, 3, 9, 27, 81], dtype=np.int32)


def sf_bytes(total_words: int) -> int:
    """Packed bytes per superframe for a (9, total) wire plane grid."""
    return -(-9 * total_words * 3 // 5)


def pack_wire(planes):
    """(n_sf, 9, total) int8 wire symbols -> (n_sf, sf_bytes) uint8.

    Jit-safe; trit expansion uses the exact-f32 divmod (integer mod on
    the VPU is pathologically slow, docs/PERF.md).
    """
    n_sf = planes.shape[0]
    ntr = planes.shape[1] * planes.shape[2] * 3
    pad = (-ntr) % 5
    t = sym_to_trits(planes.reshape(n_sf, -1), 3).reshape(n_sf, ntr)
    if pad:
        t = jnp.pad(t, ((0, 0), (0, pad)))
    t = t.reshape(n_sf, -1, 5).astype(jnp.int32)
    by = jnp.sum(t * jnp.asarray(_POW5), axis=-1)
    return by.astype(jnp.uint8)


def unpack_wire(by, total_words: int):
    """(n_sf, sf_bytes) uint8 -> (n_sf, 9, total) int8 wire symbols."""
    n_sf = by.shape[0]
    ntr = 9 * total_words * 3
    t = sym_to_trits(by.astype(jnp.int32), 5).reshape(n_sf, -1)[:, :ntr]
    s = t.reshape(n_sf, 9 * total_words, 3).astype(jnp.int32)
    sym = s[..., 0] + 3 * s[..., 1] + 9 * s[..., 2]
    return sym.reshape(n_sf, 9, total_words).astype(jnp.int8)


def np_pack_wire(planes: np.ndarray) -> np.ndarray:
    """Host oracle for pack_wire (golden tests)."""
    planes = np.asarray(planes, dtype=np.int64)
    n_sf = planes.shape[0]
    ntr = planes.shape[1] * planes.shape[2] * 3
    d = planes.reshape(n_sf, -1, 1) // np.array([1, 3, 9]) % 3
    t = d.reshape(n_sf, ntr)
    pad = (-ntr) % 5
    if pad:
        t = np.concatenate([t, np.zeros((n_sf, pad), np.int64)], axis=1)
    return (t.reshape(n_sf, -1, 5) * _POW5).sum(-1).astype(np.uint8)
