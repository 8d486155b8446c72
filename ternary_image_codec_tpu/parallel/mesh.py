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
* Pipeline parallelism (roundtrip_pipeline_pp): the codec stages split
  across a 2-stage mesh axis, microbatches handed off via lax.ppermute
  under shard_map, composing with DP within each stage.

All paths are exercised on a virtual CPU mesh in tests and by
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


def decode_superframes_fused_dp(words, cfg: EncoderConfig, mesh: Mesh,
                                repair_cap: int = 4):
    """Fused two-phase decode of a superframe-sharded stream in ONE
    sharded dispatch (multichip analog of pipeline._fused_auto_fn,
    docs/PERF.md round-5): each chip check-decodes its local superframes;
    the flagged indices are compacted ON DEVICE by a stable argsort over
    the (tiny) global flag vector -- the only data that crosses ICI
    besides the repair window itself; the paged corrector runs over a
    fixed repair_cap-slot window gathered from the flagged superframes
    and the fixes scatter back into the sharded output.  ok is the
    global reduction, fail-safe False when more than repair_cap
    superframes flag dirty.

    words: (n_sf, total_words, 9) profile words, n_sf a multiple of the
    mesh size.  Returns (raw (n_sf, n_out_words, 9), ok scalar).
    """
    words = jnp.asarray(words)
    sf = cfg.superframe_words
    enc_layout = pipeline.build_encode_layout(cfg, sf)
    from ..config import SuperframeHeader
    sf_hdr = SuperframeHeader(profile=cfg.profile, uep=cfg.uep,
                              tile=cfg.tile, seed=cfg.seed,
                              beacon=cfg.beacon, subword=cfg.subword,
                              centered=cfg.centered, coset=cfg.coset)
    dlayout = pipeline.build_decode_layout(
        sf_hdr, enc_layout.total_words - pipeline.HEADER_WORDS)
    dec_chk = pipeline._decode_body_fn(dlayout, "check")
    dec_fix = pipeline._decode_body_fn(dlayout, "paged")

    sharded = NamedSharding(mesh, PSpec("data", None, None))
    scalar = NamedSharding(mesh, PSpec())

    @functools.partial(jax.jit, in_shardings=sharded,
                       out_shardings=(sharded, scalar))
    def step(w):
        body = w[:, pipeline.HEADER_WORDS:, :]
        out, ok = jax.vmap(dec_chk)(body)
        nbad = jnp.sum(~ok)
        order = jnp.argsort(ok, stable=True)    # flagged (False) first
        idx = order[:repair_cap]
        fix, ok_fix = jax.vmap(dec_fix)(body[idx])
        out = out.at[idx].set(fix)
        return out, jnp.all(ok_fix) & (nbad <= idx.shape[0])

    return step(words)


def make_mesh_pp(n_devices: int | None = None,
                 stage_axis: str = "stage", data_axis: str = "data") -> Mesh:
    """2D (stage=2, data=n/2) mesh for pipeline x data parallelism."""
    devs = jax.devices()
    n = n_devices or len(devs)
    assert n % 2 == 0, "PP mesh needs an even device count"
    return Mesh(np.array(devs[:n]).reshape(2, n // 2), (stage_axis, data_axis))


def roundtrip_pipeline_pp(raw_frames, cfg: EncoderConfig, mesh: Mesh,
                          stage_axis: str = "stage", data_axis: str = "data",
                          wire_damage=None):
    """Two-stage pipeline parallelism over the codec stages (GPipe-style).

    Stage 0 of the mesh encodes microbatch t while stage 1 decodes
    microbatch t-1; the in-flight wire words cross ICI via
    `lax.ppermute` each step (the TPU idiom for a stage handoff -- the
    reference is single-threaded, SURVEY.md section 2.8, so this is the
    from-scratch scaling design, not a port).  Within each stage the
    frame axis is data-parallel over `data_axis`.

    For this stateless codec plain frame-DP usually wins (both stages
    have identical cost); PP is the right split when the two halves
    must live on different chips -- e.g. encode on ingest-attached
    chips and verify/decode on storage-attached chips, or when one
    stage's working set alone fills a chip's HBM.  The structure here
    (lax.scan over microbatches + ppermute handoff + psum delivery) is
    the reusable pattern either way.

    raw_frames: (T, db, n_raw, 9) int8 -- T microbatches of db frames;
    db must divide by the data-axis size.  Returns (decoded
    (T, db, n_out, 9), ok (T, db)) with n_out >= n_raw (RS-block
    padding; slice [:n_raw] for payload).

    wire_damage: optional (T, db, total_words, 9) int8 GF(27) deltas
    added (mod 27) to the in-flight wire words ON THE STAGE LINK --
    i.e. after stage 0's encode, before the ppermute handoff -- modeling
    channel damage between the ingest chips and the verify/decode chips.
    The decode stage runs the page-compacted RS corrector (rs_mode
    "paged", pipeline._decode_body_fn's default), so <= t symbol errors
    per RS block must be REPAIRED under PP (ok stays True, output
    exact); beyond-capacity damage clears exactly that frame's ok.
    """
    from jax import shard_map
    from ..config import SuperframeHeader
    from jax import lax
    T, db, n_raw, _ = raw_frames.shape
    ndata = mesh.shape[data_axis]
    assert db % ndata == 0, "microbatch size must divide the data axis"
    dbl = db // ndata
    enc_layout = pipeline.build_encode_layout(cfg, n_raw)
    enc_one = pipeline._encode_fn(enc_layout)
    sf_hdr = SuperframeHeader(profile=cfg.profile, uep=cfg.uep, tile=cfg.tile,
                              seed=cfg.seed, beacon=cfg.beacon,
                              subword=cfg.subword, centered=cfg.centered,
                              coset=cfg.coset)
    dec_layout = pipeline.build_decode_layout(
        sf_hdr, enc_layout.total_words - pipeline.HEADER_WORDS)
    dec_one = pipeline._decode_body_fn(dec_layout)
    total, n_out = enc_layout.total_words, dec_layout.n_out_words

    def stage_prog(frames, dmg):       # local: (T+1, dbl, n_raw|total, 9)
        sid = lax.axis_index(stage_axis)
        # constants and per-stage branch outputs must agree on
        # varying-manual-axes (shard_map's cond type check): everything in
        # the loop is varying over BOTH mesh axes
        vary = functools.partial(lax.pcast, to="varying")
        zero_wire = vary(jnp.zeros((dbl, total, 9), jnp.int8),
                         (stage_axis, data_axis))

        def body(inflight, xs):
            f_t, d_t = xs
            # encode this step's microbatch (stage 0 only -- the cond is
            # a real HLO conditional, stage 1 skips the encode compute)
            wire = lax.cond(
                sid == 0,
                # enc output inherits f_t's data-varying; add stage
                lambda x: vary(jax.vmap(enc_one)(x), (stage_axis,)),
                lambda x: zero_wire, f_t)
            # channel damage on the stage link (only the 0 -> 1 edge
            # carries data, so applying it on both stages is a no-op for
            # stage 1's discarded zero wire)
            wire = ((wire + vary(d_t, (stage_axis,))) % 27).astype(jnp.int8)
            # stage handoff over ICI; stage 0 receives zeros (no edge in)
            recv = lax.ppermute(wire, stage_axis, [(0, 1)])
            # decode LAST step's handoff (stage 1 only)
            zero_out = (vary(jnp.zeros((dbl, n_out, 9), jnp.int8),
                             (stage_axis, data_axis)),
                        vary(jnp.zeros((dbl,), bool),
                             (stage_axis, data_axis)))
            out, ok = lax.cond(
                sid == 1,
                # dec output inherits the carry's both-axes varying
                lambda w: jax.vmap(
                    lambda p: dec_one(p[pipeline.HEADER_WORDS:]))(w),
                lambda w: zero_out, inflight)
            return recv, (out, ok)

        _, (outs, oks) = lax.scan(body, zero_wire, (frames, dmg))
        # stage 1 decodes microbatch t at step t+1; drop the warmup step
        # and deliver stage 1's results to both stages (psum: stage 0
        # contributed zeros, so the sum IS stage 1's value)
        outs = lax.psum(outs[1:].astype(jnp.int32), stage_axis) \
            .astype(jnp.int8)
        oks = lax.psum(oks[1:].astype(jnp.int32), stage_axis) > 0
        return outs, oks

    spec_in = PSpec(None, data_axis, None, None)
    run = jax.jit(shard_map(
        stage_prog, mesh=mesh, in_specs=(spec_in, spec_in),
        out_specs=(PSpec(None, data_axis, None, None),
                   PSpec(None, data_axis))))
    # one drain step so the last microbatch's decode lands
    frames = jnp.concatenate(
        [jnp.asarray(raw_frames),
         jnp.zeros((1, db, n_raw, 9), jnp.int8)], axis=0)
    if wire_damage is None:
        dmg = jnp.zeros((T + 1, db, total, 9), jnp.int8)
    else:
        dmg = jnp.asarray(wire_damage, dtype=jnp.int8)
        assert dmg.shape == (T, db, total, 9), dmg.shape
        dmg = jnp.concatenate(
            [dmg, jnp.zeros((1, db, total, 9), jnp.int8)], axis=0)
    return run(frames, dmg)


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
