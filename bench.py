"""Headline benchmark: 8K-frame encode+decode throughput on one TPU chip.

Pipeline measured (the BASELINE.json north-star config): an 8K frame
(7680x4320, 2px/word9 -> 16.6M words) through the full profile pipeline --
26-trit repack, 9-band UEP RS(26,k) encode, scramble, beacon, header -- and
back through descramble, band demap, RS decode, and word rebuild.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: >= 30 fps encode+decode on a single v5e chip (BASELINE.md).
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from ternary_image_codec_tpu.config import (EncoderConfig, ProfileID,
                                                SuperframeHeader,
                                                uep_luma_priority)
    from ternary_image_codec_tpu.ops import pipeline

    W, H = 7680, 4320
    n_raw = W * H // 2  # word9: 2 px/word
    cfg = EncoderConfig(profile=ProfileID.P2_RS26_22, uep=uep_luma_priority())

    enc_layout = pipeline.build_encode_layout(cfg, n_raw)
    enc = pipeline._encode_fn(enc_layout)
    sf = SuperframeHeader(profile=cfg.profile, uep=cfg.uep, tile=cfg.tile,
                          seed=cfg.seed, beacon=cfg.beacon, subword=cfg.subword,
                          centered=cfg.centered, coset=cfg.coset)
    dec_layout = pipeline.build_decode_layout(
        sf, enc_layout.total_words - pipeline.HEADER_WORDS)
    dec = pipeline._decode_body_fn(dec_layout)

    r = np.random.default_rng(0)
    t = r.integers(0, 3, size=(n_raw, 27)).astype(np.int8)
    t[:, 26] = 0
    raw = jnp.asarray((t.reshape(n_raw, 9, 3) * np.array([1, 3, 9])).sum(-1)
                      .astype(np.int8))

    @jax.jit
    def step(x):
        prof = enc(x)
        out, ok = dec(prof[pipeline.HEADER_WORDS:])
        return out, ok

    # warmup / compile
    out, ok = step(raw)
    out.block_until_ready()
    assert bool(ok), "roundtrip failed"
    assert np.array_equal(np.asarray(out[:16])[: , :], np.asarray(raw[:16]))

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out, ok = step(raw)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "8k_frame_encode_decode_throughput",
        "value": round(fps, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
