// Golden-data generator: compiles AGAINST the read-only reference headers
// (not copied into this repo) and dumps binary tables used by the pytest
// differential suite.  Build:
//   g++ -std=c++17 -O2 -I/root/reference/include -I/root/reference/old/include \
//       gen_golden_quant.cpp -o gen_golden_quant   (see tests/oracle/Makefile)
#include <cstdio>
#include <cstdint>
#include <vector>
#include <random>
#include <algorithm>
#include <cmath>

// Reference YCbCr/quant functions (include/io_image.hpp:66-99) -- we only
// need these five; pull the header's math in via a minimal re-declaration by
// including the real header is not possible standalone (stb deps), so this
// probe re-implements NOTHING: it #includes the reference header with stubs.
struct ImageU8 { int w=0,h=0,c=0; std::vector<uint8_t> data; };
// stub the stb externs the header declares
extern "C" {
unsigned char *stbi_load(const char*, int*, int*, int*, int){ return nullptr; }
void stbi_image_free(void*){}
int stbi_write_png(const char*, int, int, int, const void*, int){ return 0; }
int stbi_write_jpg(const char*, int, int, int, const void*, int){ return 0; }
}
#define TERNARY_ORACLE_NO_IMPL
#include "ternary_image_codec_v6_min.hpp"  // new-tree core types
namespace ref {
#include "io_image_quant_only.inc"
}

int main(int argc, char** argv){
    const char* out = argc > 1 ? argv[1] : "golden_quant.bin";
    FILE* f = fopen(out, "wb");
    std::mt19937 rng(1234);
    std::uniform_int_distribution<int> u8(0, 255);
    const int N = 100000;
    // record: r,g,b, Y,Cb,Cr, Yq,Cbq+64,Crq+64, dY,dCb,dCr, R2,G2,B2  (15 bytes)
    for(int i=0;i<N;++i){
        uint8_t r,g,b;
        if(i < 256*3){ // sweep gray axis + pure channels first (edge cases)
            int v=i%256; int ch=i/256;
            r = ch==0? v: (ch==1?0:v); g = ch==0? v : (ch==1? v:0); b = ch==0? v: (ch==1?0: (ch==2?0:v));
        } else { r=u8(rng); g=u8(rng); b=u8(rng); }
        uint8_t Y,Cb,Cr; ref::rgb_to_ycbcr(r,g,b,Y,Cb,Cr);
        PixelYCbCrQuant q = ref::quantize_ycbcr(Y,Cb,Cr);
        uint8_t dY,dCb,dCr; ref::dequantize_ycbcr(q,dY,dCb,dCr);
        uint8_t R2,G2,B2; ref::ycbcr_to_rgb(dY,dCb,dCr,R2,G2,B2);
        uint8_t rec[15] = {r,g,b, Y,Cb,Cr,
                           (uint8_t)q.Yq==q.Yq?(uint8_t)(q.Yq%256):0, 0, 0,
                           dY,dCb,dCr, R2,G2,B2};
        rec[6] = (uint8_t)(q.Yq & 0xFF);
        rec[7] = (uint8_t)(q.Cbq + 64);
        rec[8] = (uint8_t)(q.Crq + 64);
        fwrite(rec, 1, 15, f);
    }
    fclose(f);
    printf("wrote %s\n", out);
    return 0;
}
