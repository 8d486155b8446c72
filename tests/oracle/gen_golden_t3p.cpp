// Writes golden .t3p/.t3v files with the REFERENCE container implementation
// (src/io_t3p_t3v.cpp compiled from /root/reference) for byte-diff tests.
#include "io_t3p_t3v.hpp"
#include <cstdio>
#include <vector>
#include <string>

int main(int argc, char** argv){
    std::string dir = argc > 1 ? argv[1] : ".";
    using namespace T3Container;
    std::vector<Word27> words(100);
    for(size_t i=0;i<words.size();++i) words[i].u = (uint32_t)((i*2654435761u) % 1594323u);
    std::string meta = "{\"domain\":\"test.example\",\"route_ttl\":3,\"route_phase\":0}";
    std::string err;
    if(!t3p_write(dir + "/golden_ref.t3p", SubwordMode::S21, 1920, 1080, words, meta, &err)){
        printf("t3p_write failed: %s\n", err.c_str()); return 1;
    }
    // empty-payload t3p
    if(!t3p_write(dir + "/golden_ref_empty.t3p", SubwordMode::S27, 0, 0, {}, "", &err)){
        printf("t3p_write empty failed: %s\n", err.c_str()); return 1;
    }
    // t3v with 3 frames, per-frame metas
    std::vector<std::vector<Word27>> frames(3);
    for(int fi=0; fi<3; ++fi){
        frames[fi].resize(40 + fi);
        for(size_t i=0;i<frames[fi].size();++i) frames[fi][i].u = (uint32_t)((i*31u + fi*7u) % 1594323u);
    }
    std::vector<std::string> fmetas = {"{\"f\":0}", "{\"f\":1}", "{\"f\":2}"};
    if(!t3v_write(dir + "/golden_ref.t3v", SubwordMode::S18, 1280, 720, frames,
                  "{\"fps\":30}", fmetas, &err)){
        printf("t3v_write failed: %s\n", err.c_str()); return 1;
    }
    printf("golden containers written\n");
    return 0;
}
