// Writes golden legacy-container files with the REFERENCE implementations
// (old-tree t3p/t3b/t3v/t3vi headers + new-tree t3p/t3v minimal + io_t3proto)
// for byte-exact differential tests. Includes reference headers only; no
// reference code is copied into this repository.
#include <cstdio>
#include <string>
#include <vector>

// Old tree: full core types (UTrit, Word27 with sym[9], SubwordMode, ...)
#include "ternary_image_codec_v6_min.hpp"
#include "ternary_packing.hpp"   // old tail-aware pack_trits_base243
#include "t3v_io.hpp"            // old .t3v (T3V1 rich header) + subword_to_code
#include "t3p_io.hpp"            // old .t3p (T3P1 rich header)
#include "t3b_io.hpp"            // .t3b
#include "t3v_indexed_io.hpp"    // .t3vi sidecar

static std::vector<UTrit> make_trits(size_t n, unsigned seed) {
    std::vector<UTrit> tr(n);
    unsigned s = seed;
    for (size_t i = 0; i < n; ++i) { s = s * 1103515245u + 12345u; tr[i] = (UTrit)((s >> 16) % 3u); }
    return tr;
}

static std::vector<Word27> make_words(size_t n, unsigned seed) {
    std::vector<Word27> w(n);
    unsigned s = seed;
    for (size_t i = 0; i < n; ++i)
        for (int k = 0; k < 9; ++k) { s = s * 1103515245u + 12345u; w[i].sym[k] = (GF27)((s >> 16) % 27u); }
    return w;
}

int main(int argc, char** argv) {
    std::string dir = argc > 1 ? argv[1] : ".";

    // ---- old .t3p (rich packed header) with a non-multiple-of-5 tail
    auto tr = make_trits(123, 7);
    if (!t3p_write_file(dir + "/golden_legacy_old.t3p", SubwordMode::S21, true, 1920, 1080, tr)) {
        printf("t3p_old write failed\n"); return 1;
    }
    // ---- .t3b same payload family, different magic
    auto trb = make_trits(40, 99);
    if (!t3b_write_file(dir + "/golden_legacy.t3b", SubwordMode::S18, false, 1280, 720, trb)) {
        printf("t3b write failed\n"); return 1;
    }
    // ---- old rich .t3v: header + 3 frames + index sidecar
    {
        FILE* f = t3v_fopen(dir + "/golden_legacy_old.t3v", "wb");
        if (!f) { printf("t3v open failed\n"); return 1; }
        ActiveWindow aw = centered_window(SubwordMode::S21);
        if (!t3v_write_header(f, ProfileID::P2_RS26_22, SubwordMode::S21, true,
                              CosetID::C1, 7680, 4320, aw, 30, 1, 3, 1)) {
            printf("t3v header failed\n"); return 1;
        }
        for (int i = 0; i < 3; ++i) {
            auto words = make_words(50 + i, 31 * (i + 1));
            if (!t3v_write_frame(f, words)) { printf("t3v frame failed\n"); return 1; }
        }
        t3v_fclose(f);
        if (!t3v_scan_and_index(dir + "/golden_legacy_old.t3v", dir + "/golden_legacy_old.t3vi")) {
            printf("t3vi index failed\n"); return 1;
        }
    }
    printf("golden legacy containers written\n");
    return 0;
}
