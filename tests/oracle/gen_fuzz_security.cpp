// Fuzz oracle for the security policy engine: reads the randomized
// scenario file written by tests/security_fuzz.py (format documented
// there), runs every meta through the READ-ONLY reference decide_ex,
// and emits one decision line per meta:
//     sid|k|DECISION|redir|target|ttl_after|tick
// Compiled against /root/reference (no reference code copied here).
//
//   /tmp/gen_fuzz_security scenarios.txt golden_out.txt
#include "security_policy.hpp"
#include <cstdio>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

using namespace T3Security;

static const char* dname(Decision d){
    switch(d){ case Decision::INTERNAL: return "INTERNAL";
               case Decision::COEXIST_ACCEPTED: return "COEXIST";
               case Decision::UNKNOWN_SANDBOX: return "SANDBOX";
               default: return "REJECT"; }
}

static std::string untok(const std::string& s){ return s=="-"? "": s; }

// canned callbacks (must match tests/security_fuzz.py exactly)
static bool prep_suggest(const std::string&, const std::string& nb,
                         const BuildTag&, std::string& out, void*){
    out = nb + "prepared";
    return true;
}
static bool prep_refuse(const std::string&, const std::string&,
                        const BuildTag&, std::string&, void*){
    return false;
}
static bool acc_always(const std::string&, const std::string&,
                       const BuildTag&, void*){ return true; }
static bool acc_parity(const std::string& req, const std::string&,
                       const BuildTag&, void*){
    return (fnv1a64(req) & 1ull) == 0;
}
static bool nb_cam(const BuildTag& t, void*){
    return t.domain.find("cam") != std::string::npos;
}

int main(int argc, char** argv){
    if(argc < 3){ fprintf(stderr, "usage: %s scenarios out\n", argv[0]); return 2; }
    std::ifstream in(argv[1]);
    FILE* out = fopen(argv[2], "w");
    if(!in || !out){ fprintf(stderr, "open failed\n"); return 2; }

    std::string line;
    Policy pol;
    long sid = -1; int k = 0;
    while(std::getline(in, line)){
        if(line.empty()) continue;
        std::istringstream ss(line);
        std::string op; ss >> op;
        if(op == "S"){
            pol = Policy{};
            ss >> sid; k = 0;
        } else if(op == "M"){
            std::string p, h; unsigned long r;
            ss >> p >> h >> r;
            pol.memberships.push_back({untok(p), untok(h), (uint32_t)r});
        } else if(op == "SELF"){
            std::string p, h; unsigned long r;
            ss >> p >> h >> r;
            pol.self = {untok(p), untok(h), (uint32_t)r};
        } else if(op == "A"){
            std::string p, h; ss >> p >> h;
            pol.internal_allow.push_back({untok(p), untok(h)});
        } else if(op == "C"){
            std::string p, h; unsigned long r; unsigned cl;
            ss >> p >> h >> r >> cl;
            pol.coexist_allow.push_back({untok(p), untok(h), (uint32_t)r,
                                         (ProxClass)(uint8_t)cl});
        } else if(op == "ROOT"){
            std::string rt; ss >> rt;
            pol.allowed_roots.push_back(untok(rt));
        } else if(op == "DEPTH"){
            unsigned v; ss >> v; pol.max_depth = (uint8_t)v;
        } else if(op == "TTL"){
            unsigned v; ss >> v; pol.ttl_global_max = (uint8_t)v;
        } else if(op == "HOPS"){
            unsigned v; ss >> v; pol.hops_global_max = (uint8_t)v;
        } else if(op == "OV"){
            unsigned v; ss >> v; pol.enable_overlap_redirect = v != 0;
        } else if(op == "TICK"){
            unsigned long long v; ss >> v; pol.rotor.tick = v;
        } else if(op == "VW"){
            std::string v; ss >> v;
            pol.visual_whitelist_domains.push_back(untok(v));
        } else if(op == "RD"){
            std::string f, t; unsigned a, b;
            ss >> f >> t >> a >> b;
            pol.redirects.push_back({untok(f), untok(t), (uint8_t)a,
                                     (uint8_t)b});
        } else if(op == "CB"){
            unsigned p, a, n; ss >> p >> a >> n;
            pol.overlap_prepare_suggest =
                p == 1 ? prep_suggest : p == 2 ? prep_refuse : nullptr;
            pol.overlap_second_accept =
                a == 1 ? acc_always : a == 2 ? acc_parity : nullptr;
            pol.query_neighbor_accept = n == 1 ? nb_cam : nullptr;
        } else if(op == "X"){
            std::string meta = line.substr(2);
            DecisionEx R = decide_ex(pol, meta);
            fprintf(out, "%ld|%d|%s|%d|%s|%u|%llu\n",
                    sid, k, dname(R.decision),
                    R.next.should_redirect ? 1 : 0,
                    R.next.target_domain.c_str(),
                    (unsigned)R.next.ttl_after,
                    (unsigned long long)pol.rotor.tick);
            ++k;
        } // "E": nothing to do
    }
    fclose(out);
    printf("fuzz security golden written\n");
    return 0;
}
