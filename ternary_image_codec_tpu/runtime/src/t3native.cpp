// Native host runtime for the TPU ternary codec: byte-level hot paths that
// sit outside the XLA device graph (container IO packing, stream signatures).
// The device compute path stays JAX/XLA/Pallas; this mirrors the reference's
// C++ host layer (old/include/ternary_packing.hpp, src/t3dump.cpp:48-69).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
#include <cstddef>
#include <cstdint>
#include <cstring>

extern "C" {

// ---- CRC-12 (poly 0x80F, init 0), bit-faithful to src/t3dump.cpp:48-62 ----
uint16_t t3n_crc12_0x80f(const uint8_t* data, size_t len) {
    static uint16_t M[4096];
    static uint16_t K[256];
    static bool init = false;
    if (!init) {
        for (int state = 0; state < 4096; ++state) {
            uint16_t c = (uint16_t)state;
            for (int i = 0; i < 8; ++i) {
                uint16_t msb = (c >> 11) & 1u;
                c = (uint16_t)((c << 1) & 0xFFF);
                if (msb) c ^= 0x80F;
            }
            M[state] = c;
        }
        for (int byte = 0; byte < 256; ++byte) {
            uint16_t c = 0;
            for (int bit = 7; bit >= 0; --bit) {
                uint16_t inb = (uint16_t)((byte >> bit) & 1);
                uint16_t msb = (c >> 11) & 1u;
                c = (uint16_t)((c << 1) & 0xFFF);
                if (msb ^ inb) c ^= 0x80F;
            }
            K[byte] = c;
        }
        init = true;
    }
    uint16_t crc = 0;
    for (size_t i = 0; i < len; ++i) crc = (uint16_t)(M[crc] ^ K[data[i]]);
    return (uint16_t)(crc & 0xFFF);
}

// ---- base-243: 5 trits -> byte, tail-aware (old/include/ternary_packing.hpp
//      :10-59 semantics).  Returns number of bytes written; *tail_trits gets
//      n % 5.  out must hold ceil(n/5) bytes. -------------------------------
size_t t3n_pack_base243(const uint8_t* trits, size_t n, uint8_t* out,
                        uint8_t* tail_trits) {
    size_t i = 0, o = 0;
    while (i + 5 <= n) {
        uint32_t v = (uint32_t)(trits[i] % 3) + 3u * (trits[i + 1] % 3)
                   + 9u * (trits[i + 2] % 3) + 27u * (trits[i + 3] % 3)
                   + 81u * (trits[i + 4] % 3);
        out[o++] = (uint8_t)v;
        i += 5;
    }
    size_t left = n - i;
    if (tail_trits) *tail_trits = (uint8_t)left;
    if (left) {
        uint32_t v = 0, p = 1;
        for (size_t k = 0; k < left; ++k) { v += p * (uint32_t)(trits[i + k] % 3); p *= 3; }
        out[o++] = (uint8_t)v;
    }
    return o;
}

// ---- inverse: emit exactly total_trits trits from base-243 bytes ----------
// 256 x 5 digit LUT instead of the div/mod loop (the loop measured
// ~0.04 Gtrit/s on this box; whole bytes now copy 5 digits at once)
int t3n_unpack_base243(const uint8_t* data, size_t len, size_t total_trits,
                       uint8_t* out) {
    static uint8_t D[256][5];
    static bool init = false;
    if (!init) {
        for (int b = 0; b < 256; ++b) {
            uint32_t v = (uint32_t)b;
            for (int k = 0; k < 5; ++k) { D[b][k] = (uint8_t)(v % 3); v /= 3; }
        }
        init = true;
    }
    size_t full = total_trits / 5;
    if (len < (total_trits + 4) / 5) return -1;
    for (size_t i = 0; i < full; ++i)
        memcpy(out + 5 * i, D[data[i]], 5);
    size_t emitted = 5 * full;
    if (emitted < total_trits)
        memcpy(out + emitted, D[data[full]], total_trits - emitted);
    return 0;
}

// ---- word13 (1 px/word uint32) pack/unpack, host-side bulk path -----------
// code = Y + 243*((Cb+40) + 81*(Cr+40))  (src/ternary_image_codec_v6_min.cpp:44-61)
void t3n_pack13(const int32_t* yq, const int32_t* cbq, const int32_t* crq,
                size_t n, uint32_t* out) {
    for (size_t i = 0; i < n; ++i) {
        uint32_t y = (uint32_t)(yq[i] < 0 ? 0 : (yq[i] > 242 ? 242 : yq[i]));
        int32_t cb = cbq[i] < -40 ? -40 : (cbq[i] > 40 ? 40 : cbq[i]);
        int32_t cr = crq[i] < -40 ? -40 : (crq[i] > 40 ? 40 : crq[i]);
        out[i] = y + 243u * ((uint32_t)(cb + 40) + 81u * (uint32_t)(cr + 40));
    }
}

void t3n_unpack13(const uint32_t* code, size_t n, int32_t* yq, int32_t* cbq,
                  int32_t* crq) {
    for (size_t i = 0; i < n; ++i) {
        uint32_t v = code[i];
        yq[i] = (int32_t)(v % 243u); v /= 243u;
        cbq[i] = (int32_t)(v % 81u) - 40; v /= 81u;
        crq[i] = (int32_t)(v % 81u) - 40;
    }
}

int t3n_abi_version(void) { return 1; }

}  // extern "C"
