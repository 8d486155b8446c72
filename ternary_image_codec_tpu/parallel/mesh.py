"""Multi-chip scaling via jax.sharding: frame-level data parallelism and
stream sharding.

The reference is single-machine single-threaded (SURVEY.md section 2.8);
the TPU-native scaling story is:

* DP over frames: a video batch is embarrassingly parallel -- shard the
  frame axis over the mesh's `data` axis; each chip runs the full encode or
  decode pipeline on its local frames.  Collectives appear only for global
  status reductions (psum of ok-flags / error counters over ICI).
* Stream sharding (the long-sequence analog): one huge frame's word stream
  is sharded over `data`; elementwise trit math stays local, and XLA inserts
  the boundary collectives for the few reshape/permute stages.

Both paths are exercised on a virtual CPU mesh in tests and by
__graft_entry__.dryrun_multichip.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec

from ..config import EncoderConfig
from ..ops import pipeline


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def encode_frames_dp(raw_frames, cfg: EncoderConfig, mesh: Mesh):
    """Encode a batch of identically-shaped RAW frames, frame-sharded.

    raw_frames: (B, n_raw, 9) int8.  Returns (B, total, 9) profile words,
    with B sharded over the mesh's data axis.
    """
    B, n_raw, _ = raw_frames.shape
    layout = pipeline.build_encode_layout(cfg, n_raw)
    enc_one = pipeline._encode_fn(layout)

    @functools.partial(
        jax.jit,
        in_shardings=NamedSharding(mesh, PSpec("data", None, None)),
        out_shardings=NamedSharding(mesh, PSpec("data", None, None)))
    def enc(frames):
        return jax.vmap(enc_one)(frames)

    return enc(jnp.asarray(raw_frames))


def decode_frames_dp(words, cfg: EncoderConfig, mesh: Mesh,
                     rs_mode: str = "paged"):
    """Decode a batch of identically-shaped profile frames, frame-sharded.

    words: (B, total, 9) int8 profile words (header + body per frame).
    Returns (raw (B, n_out, 9), ok (B,), all_ok) -- per-frame ok flags stay
    frame-sharded; the all_ok scalar is the cross-chip psum-style reduction
    (XLA lowers jnp.all over the sharded axis to an ICI collective).
    rs_mode selects the correction strategy (see pipeline._decode_body_fn).
    """
    from ..config import SuperframeHeader
    B, total, _ = words.shape
    sf_hdr = SuperframeHeader(profile=cfg.profile, uep=cfg.uep, tile=cfg.tile,
                              seed=cfg.seed, beacon=cfg.beacon,
                              subword=cfg.subword, centered=cfg.centered,
                              coset=cfg.coset)
    dec_layout = pipeline.build_decode_layout(
        sf_hdr, total - pipeline.HEADER_WORDS)
    dec_one = pipeline._decode_body_fn(dec_layout, rs_mode)

    @functools.partial(
        jax.jit,
        in_shardings=NamedSharding(mesh, PSpec("data", None, None)),
        out_shardings=(NamedSharding(mesh, PSpec("data", None, None)),
                       NamedSharding(mesh, PSpec("data")),
                       NamedSharding(mesh, PSpec())))
    def dec(ws):
        raw, ok = jax.vmap(
            lambda p: dec_one(p[pipeline.HEADER_WORDS:]))(ws)
        return raw, ok, jnp.all(ok)

    return dec(jnp.asarray(words))


def roundtrip_step_dp(raw_frames, cfg: EncoderConfig, mesh: Mesh):
    """Full encode->decode step over a frame batch with DP sharding.

    Returns (decoded_frames, all_ok).  The ok reduction is a cross-chip
    psum-style global reduce (XLA inserts the collective).
    """
    B, n_raw, _ = raw_frames.shape
    enc_layout = pipeline.build_encode_layout(cfg, n_raw)
    enc_one = pipeline._encode_fn(enc_layout)
    hdr = pipeline._encode_header_words(cfg)  # noqa: F841 (decode uses header below)
    # decode layout is derivable statically from the encoder config
    from ..config import SuperframeHeader
    sf = SuperframeHeader(profile=cfg.profile, uep=cfg.uep, tile=cfg.tile,
                          seed=cfg.seed, beacon=cfg.beacon, subword=cfg.subword,
                          centered=cfg.centered, coset=cfg.coset)
    dec_layout = pipeline.build_decode_layout(
        sf, enc_layout.total_words - pipeline.HEADER_WORDS)
    dec_one = pipeline._decode_body_fn(dec_layout)

    @functools.partial(
        jax.jit,
        in_shardings=NamedSharding(mesh, PSpec("data", None, None)),
        out_shardings=(NamedSharding(mesh, PSpec("data", None, None)),
                       NamedSharding(mesh, PSpec())))
    def step(frames):
        prof = jax.vmap(enc_one)(frames)
        raw, ok = jax.vmap(lambda p: dec_one(p[pipeline.HEADER_WORDS:]))(prof)
        return raw, jnp.all(ok)

    return step(jnp.asarray(raw_frames))


def roundtrip_superframes_dp(raw_words, cfg: EncoderConfig, mesh: Mesh,
                             sf_batch: int = 4):
    """Superframe-sharded encode+decode of ONE large frame.

    The frame is chunked into bounded superframes (cfg.superframe_words);
    the superframe axis shards over the mesh's data axis -- each chip
    encodes+decodes its local chunk of the stream, and only the ok-flag
    reduction crosses ICI.  This is the multi-chip scaling path for frames
    too large for one chip's HBM.
    """
    raw_words = jnp.asarray(raw_words)
    n = int(raw_words.shape[0])
    sf = cfg.superframe_words
    n_dev = mesh.devices.size
    n_sf = -(-n // sf)
    n_sf = -(-n_sf // n_dev) * n_dev  # round superframe count to mesh size
    pad = n_sf * sf - n
    if pad:
        raw_words = jnp.concatenate(
            [raw_words, jnp.zeros((pad, 9), dtype=raw_words.dtype)])
    chunks = raw_words.reshape(n_sf, sf, 9)
    # vmap (not lax.map) over the superframe axis: GSPMD partitions a
    # batched op cleanly across the mesh, whereas a scan/map axis would be
    # serialized (and gathered).  Per-chip live batch = n_sf / n_devices.
    enc_layout = pipeline.build_encode_layout(cfg, sf)
    enc_one = pipeline._encode_fn(enc_layout)
    from ..config import SuperframeHeader
    sf_hdr = SuperframeHeader(profile=cfg.profile, uep=cfg.uep, tile=cfg.tile,
                              seed=cfg.seed, beacon=cfg.beacon,
                              subword=cfg.subword, centered=cfg.centered,
                              coset=cfg.coset)
    dlayout = pipeline.build_decode_layout(
        sf_hdr, enc_layout.total_words - pipeline.HEADER_WORDS)
    dec_one = pipeline._decode_body_fn(dlayout)

    sharded = NamedSharding(mesh, PSpec("data", None, None))

    @functools.partial(jax.jit, in_shardings=sharded,
                       out_shardings=(sharded, NamedSharding(mesh, PSpec())))
    def step(c):
        prof = jax.vmap(enc_one)(c)
        out, ok = jax.vmap(
            lambda p: dec_one(p[pipeline.HEADER_WORDS:]))(prof)
        return out, jnp.all(ok)

    out, ok = step(chunks)
    raw_out = out[:, :sf, :].reshape(-1, 9)[:n]
    return raw_out, ok


def encode_stream_sharded(raw_words, cfg: EncoderConfig, mesh: Mesh):
    """Single big frame with the word stream sharded across chips."""
    n_raw = raw_words.shape[0]
    layout = pipeline.build_encode_layout(cfg, n_raw)
    enc_one = pipeline._encode_fn(layout)
    # the profile word count (header + RS-padded body) is rarely divisible
    # by the mesh size -- only pin the output sharding when it is, else let
    # GSPMD choose (omit out_shardings; a PSpec() pin would force a full
    # replication all-gather, n_devices x the HBM)
    if layout.total_words % mesh.devices.size == 0:
        fn = jax.jit(enc_one,
                     in_shardings=NamedSharding(mesh, PSpec("data", None)),
                     out_shardings=NamedSharding(mesh, PSpec("data", None)))
    else:
        fn = jax.jit(enc_one,
                     in_shardings=NamedSharding(mesh, PSpec("data", None)))
    return fn(jnp.asarray(raw_words))
