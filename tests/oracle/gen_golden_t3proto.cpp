// Writes a golden .t3proto file with the REFERENCE io_t3proto.hpp for
// byte-exact differential tests. Reference headers included, not copied.
#include <cstdio>
#include <string>
#include <vector>

#include "io_t3proto.hpp"

int main(int argc, char** argv) {
    std::string dir = argc > 1 ? argv[1] : ".";
    // Balanced trit stream with a deterministic pattern, plus a packed stream.
    std::vector<int8_t> bal(77);
    for (size_t i = 0; i < bal.size(); ++i) bal[i] = (int8_t)((int)(i % 3) - 1);
    // base-243 pack of the unbalanced mapping (bal+1), LSD-first, zero-pad
    // tail — pack_base243_from_balanced lives in the non-compiling
    // codec_profiles.cpp, so the probe packs inline per the documented layout.
    std::vector<uint8_t> packed;
    for (size_t i = 0; i < bal.size(); i += 5) {
        uint32_t v = 0, p = 1;
        for (size_t k = 0; k < 5 && i + k < bal.size(); ++k) {
            v += p * (uint32_t)(bal[i + k] + 1);
            p *= 3;
        }
        packed.push_back((uint8_t)v);
    }
    std::string meta = "{\"proto\":\"haar\",\"block\":8,\"n_trits\":77,\"tail_trits\":2}";
    if (!t3proto::t3proto_write(dir + "/golden_legacy.t3proto",
                                ProtoProfile::HaarTernary, 64, 48,
                                &bal, &packed, meta)) {
        printf("t3proto write failed\n");
        return 1;
    }
    // pack-only file exercising the n_trits inference path
    std::string meta2 = "{\"tail_trits\":2}";
    if (!t3proto::t3proto_write(dir + "/golden_legacy_packonly.t3proto",
                                ProtoProfile::AnisoRC, 32, 32,
                                nullptr, &packed, meta2)) {
        printf("t3proto pack-only write failed\n");
        return 1;
    }
    printf("golden t3proto written\n");
    return 0;
}
