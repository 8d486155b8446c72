"""Production serving path: device codec <-> T3V6 containers on disk.

This is the layer the reference actually ships as its product -- files on
disk (src/io_t3p_t3v.cpp:220-389) -- wired to the TPU codec with the
host kept OFF the hot byte path wherever possible:

  encode serve:  RAW chunks -> [device] stream encode + base-243 wire
                 pack (ops/wirepack.py) -> ONE D2H per frame -> host
                 CRC32 + sequential container write
  decode serve:  indexed, approve-gated frame read + CRC32 check -> ONE
                 H2D per frame -> [device] unpack + two-phase decode

Both directions run through runtime/executor.StreamExecutor so host IO
of frame i+1 overlaps device work on frame i (this box has ONE cpu, so
the host-side budget -- CRC + file IO + the tunnel RPC -- is the serve
throughput ceiling; see docs/PERF.md round-5 serve ledger).

The T3V6 layout is byte-exact with io/containers.py (same struct packs,
same CRC32 conventions, same meta-approval gate semantics: per-frame
meta must be approved BEFORE any payload byte is read,
include/io_t3p_t3v.hpp:35-55).  Every frame of a serve stream has the
same payload size, so the index is written up front (no second pass).
"""
from __future__ import annotations

import json
import struct
import zlib
from typing import Callable, Optional

import numpy as np

from ..config import SubwordMode
from .containers import (ApproveMetaFn, ContainerError, T3VFrameIndex,
                         _crc32, _t3v_hdr_crc)


class T3V6StreamWriter:
    """Streaming T3V6 writer for fixed-size frames (index up front).

    write_frame(i, payload_bytes) may be called once per i in any order
    (offsets are precomputed); payload length must equal frame_bytes.
    """

    def __init__(self, path: str, sub: SubwordMode, w: int, h: int,
                 n_frames: int, frame_bytes: int, meta_global: str = "",
                 meta_per_frame: str = ""):
        if frame_bytes % 4:
            raise ContainerError("serve frame payload must be 4-aligned "
                                 "(uint32 word ABI)")
        self.n_frames = n_frames
        self.frame_bytes = frame_bytes
        self._meta_f = meta_per_frame.encode("utf-8")
        metag = meta_global.encode("utf-8")
        self._f = open(path, "wb")
        f = self._f
        f.write(b"T3V6")
        f.write(struct.pack("<BBHHQI", 6, int(sub), w, h, n_frames,
                            len(metag)))
        f.write(struct.pack(
            "<I", _t3v_hdr_crc(6, int(sub), w, h, n_frames, len(metag))))
        f.write(metag)
        idx_pos = f.tell()
        data_start = idx_pos + 20 * n_frames
        rec = len(self._meta_f) + frame_bytes + 4
        self._offsets = [data_start + i * rec for i in range(n_frames)]
        for off in self._offsets:
            f.write(struct.pack("<QQI", off, frame_bytes // 4,
                                len(self._meta_f)))
        self._written = 0

    def write_frame(self, idx: int, payload) -> None:
        """payload: any contiguous buffer (bytes, memoryview, uint8
        ndarray) of length <= frame_bytes; the remainder is zero-padded.
        Buffer-protocol input avoids a per-frame tobytes() copy (~30 ms
        for a 112 MB 8K frame on this host, docs/PERF.md round-5)."""
        mv = memoryview(payload).cast("B")
        if len(mv) > self.frame_bytes:
            raise ContainerError("serve frame payload size mismatch")
        pad = self.frame_bytes - len(mv)
        f = self._f
        f.seek(self._offsets[idx])
        f.write(self._meta_f)
        f.write(mv)
        crc = _crc32(mv)
        if pad:
            zeros = b"\0" * pad
            f.write(zeros)
            crc = _crc32(zeros, crc)
        f.write(struct.pack("<I", crc & 0xFFFFFFFF))
        self._written += 1

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class T3V6StreamReader:
    """Indexed T3V6 frame reader: header parsed ONCE, per-frame
    approve-gated payload reads (containers.t3v_read_frame re-parses the
    whole header + index per call -- fine for random access, wrong shape
    for serving N frames)."""

    def __init__(self, path: str,
                 approve_meta: Optional[ApproveMetaFn] = None,
                 check_header_crc: bool = True):
        self._f = open(path, "rb")
        f = self._f
        if f.read(4) != b"T3V6":
            raise ContainerError("t3v: bad magic")
        ver, sub, w, h, fc, mg = struct.unpack("<BBHHQI", f.read(18))
        (hdr_crc,) = struct.unpack("<I", f.read(4))
        if check_header_crc and _t3v_hdr_crc(ver, sub, w, h, fc, mg) != hdr_crc:
            raise ContainerError("t3v: header crc mismatch")
        self.sub, self.w, self.h = SubwordMode(sub), w, h
        self.meta_global = f.read(mg).decode("utf-8") if mg else ""
        self.frame_count = fc
        self.index = []
        for _ in range(fc):
            off, words, ml = struct.unpack("<QQI", f.read(20))
            self.index.append(T3VFrameIndex(off, words, ml))
        self._approve = approve_meta

    def read_frame_bytes(self, i: int, check_crc: bool = True) -> bytes:
        if i >= self.frame_count:
            raise ContainerError("t3v: frame idx OOB")
        fi = self.index[i]
        f = self._f
        f.seek(fi.offset)
        meta = f.read(fi.meta_len).decode("utf-8") if fi.meta_len else ""
        if self._approve is not None and not self._approve(meta):
            raise ContainerError(
                "t3v: meta not approved -- frame payload not read")
        payload = f.read(fi.words * 4)
        if len(payload) != fi.words * 4:
            raise ContainerError("t3v: truncated frame payload")
        (pl_crc,) = struct.unpack("<I", f.read(4))
        if check_crc and pl_crc != (_crc32(payload) if fi.words else 0):
            raise ContainerError("t3v: frame payload crc mismatch")
        return payload

    def close(self) -> None:
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


# ---------------------------------------------------------------------------
# device serve codecs
# ---------------------------------------------------------------------------


def serve_codec_fns(cfg, n_raw: int, sf_batch: int = 128):
    """Build (enc_serve, dec_serve, geometry) for one (config, frame size).

    enc_serve: (n_sf, sf, 9) int8 RAW chunks -> (n_sf, sf_bytes) uint8
               packed wire bytes + a device checksum scalar (encode and
               wire pack fused in ONE dispatch)
    dec_serve: (n_sf, sf_bytes) uint8 -> (ok, checksum) -- unpack, check
               decode and the exactness checksum in ONE dispatch (the
               decoded planes stay on device; the checksum pins them)
    """
    import jax
    import jax.numpy as jnp
    from ..ops import pipeline, wirepack

    sf = cfg.superframe_words
    n_sf = -(-n_raw // sf)
    layout, dlayout, enc, dec = pipeline._stream_fns(cfg, sf_batch,
                                                     rs_mode="check")
    total = layout.total_words
    nbytes = wirepack.sf_bytes(total)

    def _checksum(planes):
        # order-sensitive int32 fold (a plain sum is permutation-blind)
        x = planes.astype(jnp.int32).reshape(planes.shape[0], -1)
        w = (jnp.arange(x.shape[1], dtype=jnp.int32) % 8191) + 1
        return jnp.sum(x * w[None, :], dtype=jnp.int32)

    @jax.jit
    def enc_serve(chunks):
        w = enc(chunks)
        return wirepack.pack_wire(w), _checksum(w)

    @jax.jit
    def dec_serve(by):
        w = wirepack.unpack_wire(by, total)
        out, ok = dec(w)
        return ok, _checksum(w), _checksum(out)

    geom = {"n_sf": n_sf, "total_words": total, "sf_bytes": nbytes,
            "frame_bytes": -(-n_sf * nbytes // 4) * 4,
            "n_out_words": dlayout.n_out_words}
    return enc_serve, dec_serve, geom


def serve_meta_global(cfg, n_raw: int, w: int, h: int,
                      extra: Optional[dict] = None) -> str:
    d = {"codec": "t3tpu-profile-wire-v1", "profile": int(cfg.profile),
         "n_raw": n_raw, "sf_words": cfg.superframe_words,
         "width": w, "height": h}
    if extra:
        d.update(extra)
    return json.dumps(d)
