"""minitest_aniso_rc — AnisoRC encode -> pack -> reconstruct QA with
PSNR-Y / bpp report (src/minitest_aniso_rc.cpp:80-130)."""
from __future__ import annotations

import argparse
import json

import numpy as np
import jax.numpy as jnp

from ..io import image as I
from ..ops import proto as P
from ..ops import quant as Q
from .. import profiles as PR


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="minitest_aniso_rc")
    ap.add_argument("--in", dest="infile", required=True)
    ap.add_argument("--png", default="aniso_recon.png")
    ap.add_argument("--block", type=int, default=32)
    ap.add_argument("--angles", type=int, default=8)
    ap.add_argument("--z", type=float, default=1.2)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)

    rgb = I.load_image_rgb8(args.infile)
    params = P.AnisoRCParams(block=args.block, angles=args.angles,
                             tern_thresh_z=args.z)
    art = P.proto_aniso_rc_encode(rgb, params)
    packed = PR.pack_base243_from_balanced(art.trits)
    yrec = P.proto_aniso_rc_reconstruct(art, params)

    # gray RGB PNG of the reconstructed Y plane (Cb=Cr=128)
    ycc = np.stack([yrec, np.full_like(yrec, 128), np.full_like(yrec, 128)],
                   axis=-1)
    I.save_image_png(args.png, np.asarray(Q.ycbcr_to_rgb(jnp.asarray(ycc))))

    # reference Y at padded dims
    padded, _w, _h = P._pad_to_tiles_nn(jnp.asarray(rgb), params.block)
    yref = np.asarray(Q.rgb_to_ycbcr(padded))[..., 0]
    psnr = P.psnr_y(yref, yrec)
    bpp = packed.size * 8.0 / (art.W * art.H)

    if args.json:
        print(json.dumps({"aniso_rc": {
            "input": args.infile, "W": art.W, "H": art.H,
            "block": params.block, "angles": art.angles_used,
            "proj_len": art.proj_len, "trits": int(art.trits.size),
            "packed_bytes": int(packed.size), "bpp": round(bpp, 3),
            "psnrY": round(psnr, 2), "png": args.png}}, indent=2))
    else:
        print(f"== aniso_rc ==\nimage: {args.infile}\n"
              f"dims: {art.W} x {art.H}  block={params.block}\n"
              f"angles: {art.angles_used}  proj_len={art.proj_len}\n"
              f"trits: {art.trits.size}  packed_bytes={packed.size}  "
              f"bpp={bpp:.3f}\nPSNR(Y): {psnr:.2f} dB\nout PNG: {args.png}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
