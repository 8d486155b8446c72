"""main — image -> RAW word9 -> P2 profile encode -> .t3v (old rich) frame +
PNG roundtrip (old/src/main.cpp:11-30)."""
from __future__ import annotations

import argparse

import numpy as np
import jax.numpy as jnp

from ..config import (EncoderConfig, ProfileID, SparseBeaconCfg, SubwordMode,
                      Tile2D, centered_window, std_res_for)
from ..io import image as I
from ..io import legacy_containers as LC
from ..ops import pipeline as PL
from ..ops import quant as Q
from ..ops import wordcodec as WC


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="main",
                                 description="image -> profile .t3v + "
                                             "roundtrip PNG")
    ap.add_argument("input")
    ap.add_argument("output", help="out .t3v path")
    ap.add_argument("--roundtrip-png", default="roundtrip.png")
    args = ap.parse_args(argv)

    rgb = I.load_image_rgb8(args.input)
    h, w = rgb.shape[0], rgb.shape[1]
    q = Q.rgb_to_quant(jnp.asarray(rgb)).reshape(-1, 3)
    raw = WC.quant_to_words9(q)  # 2 px/word like the old full core

    cfg = EncoderConfig(profile=ProfileID.P2_RS26_22, tile=Tile2D(64, 64),
                        beacon=SparseBeaconCfg(26, 2, True))
    prof = np.asarray(PL.encode_profile_from_raw(raw, cfg))

    sw, sh = std_res_for(SubwordMode.S27)
    hdr = LC.T3VOldHeader(file_type=0, profile=cfg.profile,
                          subword=cfg.subword, centered=cfg.centered,
                          coset=cfg.coset, width=sw, height=sh,
                          aw=centered_window(SubwordMode.S27), fps_num=0,
                          fps_den=1)
    LC.t3v_old_write(args.output, hdr, [prof])

    # roundtrip for visual check (old/src/main.cpp:25-28)
    _hdr2, frames = LC.t3v_old_read_frames(args.output)
    raw2, _sfhdr, ok = PL.decode_profile_to_raw(jnp.asarray(frames[0],
                                                            dtype=np.int8))
    if not ok:
        print("decode failed")
        return 1
    qs = WC.words9_to_quant(raw2, n_pixels=w * h)
    rgb2 = np.asarray(Q.quant_to_rgb(qs)).reshape(h, w, 3)
    I.save_image_png(args.roundtrip_png, rgb2)
    print(f"OK. wrote {args.output} and {args.roundtrip_png}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
