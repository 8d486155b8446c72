// Golden-data probe for the transform prototypes, run against the REFERENCE
// headers (include/proto_noentropy.hpp, include/proto_aniso_rc.hpp).
// Dumps tile_LL / tile_trits / sketch_trits / aniso trits+LL / Haar recon for
// a deterministic synthetic image.  Reference headers included, not copied.
//
// The reference's ImageU8 lacks a swap() member (its own io_image.hpp:281 and
// proto_aniso_rc.hpp:241 call one anyway — it does not compile as-is; see
// SURVEY.md §0.2).  For this probe we pre-include the std headers, then remap
// member `swap(x)` calls to `operator=(x)` (copy), which preserves the
// intended "replace contents" semantics in every call site (all are
// discard-the-argument patterns).
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <numeric>
#include <string>
#include <vector>

#define swap(x) operator=(x)
// Pull in the core + image headers first so their trit_bal_to_unb /
// trit_unb_to_bal are the canonical definitions...
#include "ternary_image_codec_v6_min.hpp"
#include "io_image.hpp"
// ...then rename the duplicate definitions inside proto_noentropy.hpp
// (identical semantics; the multiple-definition break from SURVEY.md §0.2).
// Its own includes of the above are no-ops thanks to include guards.
#define trit_bal_to_unb proto_dup_trit_bal_to_unb
#define trit_unb_to_bal proto_dup_trit_unb_to_bal
#include "proto_noentropy.hpp"
#undef trit_bal_to_unb
#undef trit_unb_to_bal
#include "proto_aniso_rc.hpp"
#undef swap

static ImageU8 make_rgb(int w, int h, unsigned seed) {
    ImageU8 im; im.w = w; im.h = h; im.c = 3;
    im.data.resize((size_t)w * h * 3);
    unsigned s = seed;
    for (size_t i = 0; i < im.data.size(); ++i) {
        s = s * 1103515245u + 12345u;
        im.data[i] = (uint8_t)((s >> 16) & 0xFF);
    }
    // overlay smooth gradient + a diagonal edge so transforms see structure
    for (int y = 0; y < h; ++y)
        for (int x = 0; x < w; ++x) {
            uint8_t* p = &im.data[(size_t)(y * w + x) * 3];
            p[0] = (uint8_t)((p[0] / 4) + (x * 192) / (w > 1 ? w - 1 : 1));
            p[1] = (uint8_t)((p[1] / 4) + (y * 192) / (h > 1 ? h - 1 : 1));
            p[2] = (uint8_t)((p[2] / 4) + ((x + y) % 2 ? 160 : 32));
        }
    return im;
}

static void dump(const std::string& path, const void* p, size_t n) {
    std::ofstream f(path, std::ios::binary);
    f.write((const char*)p, (std::streamsize)n);
}

int main(int argc, char** argv) {
    std::string dir = argc > 1 ? argv[1] : ".";
    ImageU8 rgb = make_rgb(72, 48, 42);  // not tile-multiple on purpose? 72,48 are multiples of 8
    dump(dir + "/golden_proto_rgb.bin", rgb.data.data(), rgb.data.size());

    // ---- Haar ternary tiles + sketch
    ProtoParams P;  // tile=8 thresh=6 sketch 32/256 bins 8x8 keep_LL
    ProtoArtifacts A;
    proto_tile_haar_ternary(rgb, P, A);
    proto_spectral_sketch(rgb, P, A);
    dump(dir + "/golden_proto_tile_LL.bin", A.tile_LL.data(), A.tile_LL.size());
    dump(dir + "/golden_proto_tile_trits.bin", A.tile_trits.data(), A.tile_trits.size());
    dump(dir + "/golden_proto_sketch_trits.bin", A.sketch_trits.data(), A.sketch_trits.size());

    ImageU8 reconY;
    proto_reconstruct_Y_from_tiles(A, P, reconY);
    dump(dir + "/golden_proto_haar_recon.bin", reconY.data.data(), reconY.data.size());

    // ---- non-multiple image exercises the NN-resize pad path
    ImageU8 rgb2 = make_rgb(70, 45, 7);
    ProtoArtifacts A2;
    proto_tile_haar_ternary(rgb2, P, A2);
    dump(dir + "/golden_proto_tile_trits_pad.bin", A2.tile_trits.data(), A2.tile_trits.size());
    std::printf("pad tiles: %dx%d trits=%zu\n", A2.tilesX, A2.tilesY, A2.tile_trits.size());

    // ---- AnisoRC encode (N=32, 8 angles, normalize, keep LL)
    AnisoRCParams RP;
    AnisoRCArtifacts RA;
    proto_aniso_rc_encode(rgb, RP, RA);
    dump(dir + "/golden_proto_rc_LL.bin", RA.block_LL.data(), RA.block_LL.size());
    dump(dir + "/golden_proto_rc_trits.bin", RA.trits.data(), RA.trits.size());
    std::printf("rc: W=%d H=%d blocks=%dx%d proj_len=%d angles=%d trits=%zu\n",
                RA.W, RA.H, RA.blocksX, RA.blocksY, RA.proj_len, RA.angles_used,
                RA.trits.size());
    std::printf("haar: tiles=%dx%d trits=%zu sketch=%zu\n",
                A.tilesX, A.tilesY, A.tile_trits.size(), A.sketch_trits.size());
    return 0;
}
