// Golden generator for the security policy + route helper, compiled against
// the reference headers.  Emits a deterministic text log of decisions and
// route rewrites for differential testing.
#include "security_policy.hpp"
#include "security_route_helper.hpp"
#include <cstdio>
#include <string>
#include <vector>

using namespace T3Security;

static FILE* out;

static const char* dname(Decision d){
    switch(d){ case Decision::INTERNAL: return "INTERNAL";
               case Decision::COEXIST_ACCEPTED: return "COEXIST";
               case Decision::UNKNOWN_SANDBOX: return "SANDBOX";
               default: return "REJECT"; }
}

static void run(Policy& pol, const std::string& meta, const char* label){
    DecisionEx R = decide_ex(pol, meta);
    fprintf(out, "%s|%s|redir=%d|target=%s|ttl_after=%u|tick=%llu\n",
            label, dname(R.decision), R.next.should_redirect?1:0,
            R.next.target_domain.c_str(), (unsigned)R.next.ttl_after,
            (unsigned long long)pol.rotor.tick);
}

static bool prep_cb(const std::string& req, const std::string& nb,
                    const BuildTag&, std::string& out_t, void*){
    out_t = nb + "prepared";
    return true;
}

int main(int argc, char** argv){
    out = fopen(argc>1?argv[1]:"golden_security.txt", "w");

    Policy pol;
    pol.memberships.push_back({"acme/video/", "ab", 0});
    pol.memberships.push_back({"acme/", "", 0});
    pol.internal_allow.push_back({"partner/tools/", "ff"});
    pol.coexist_allow.push_back({"ext/cam/", "", 500, ProxClass::Near});
    pol.coexist_allow.push_back({"ext/depot/", "", 100, ProxClass::Local});
    pol.allowed_roots = {"acme/", "ext/", "partner/", "other/"};
    pol.max_depth = 3;
    pol.overlap_prepare_suggest = prep_cb;

    // 1) membership hit
    run(pol, "{\"domain\":\"acme/video/enc\",\"build_hash\":\"abcd\"}", "member");
    // 2) membership hash prefix miss but second membership catches
    run(pol, "{\"domain\":\"acme/video/enc\",\"build_hash\":\"zz\"}", "member2");
    // 3) internal allow
    run(pol, "{\"domain\":\"partner/tools/x\",\"build_hash\":\"ff12\"}", "allow");
    // 4) coexist within radius/class
    run(pol, "{\"domain\":\"ext/cam/7\",\"radius_m\":400,\"class\":\"near\"}", "coexist");
    // 5) coexist violated radius
    run(pol, "{\"domain\":\"ext/cam/7\",\"radius_m\":600,\"class\":\"near\"}", "coexist_far");
    // 6) unknown root
    run(pol, "{\"domain\":\"evil/x\"}", "badroot");
    // 7) too deep
    run(pol, "{\"domain\":\"acme/a/b/c\",\"build_hash\":\"zz\"}", "toodeep");
    //    NB: depth 4 > 3 but membership "acme/" matched first? no: guards run first
    // 8) overlap 2-round: phase 0 -> PREP; phase 1 -> ACCEPT redirect
    //    (radius 50 keeps both ext/ coexist candidates in the bottom tier)
    std::string m8 = "{\"domain\":\"ext/other/z\",\"radius_m\":50,\"route_ttl\":3,\"route_phase\":0}";
    run(pol, m8, "overlap_prep");
    std::string m8b = "{\"domain\":\"ext/other/z\",\"radius_m\":50,\"route_ttl\":3,\"route_phase\":1}";
    run(pol, m8b, "overlap_accept");
    // 8c) accept again: prep consumed -> sandbox
    run(pol, m8b, "overlap_reaccept");
    // 9) phase 1 with no prep -> sandbox
    std::string m9 = "{\"domain\":\"ext/other/q\",\"radius_m\":40,\"route_ttl\":2,\"route_phase\":1}";
    run(pol, m9, "overlap_noprep");
    // 9b) radius too large for any coexist candidate -> fallback redirect
    std::string m9c = "{\"domain\":\"ext/depot/z\",\"radius_m\":900,\"route_ttl\":3,\"route_phase\":0}";
    run(pol, m9c, "overlap_radius_fallback");
    // 10) fallback redirect path (no shared root): use root "other/"
    Policy pol2;
    pol2.memberships.push_back({"acme/", "", 0});
    pol2.coexist_allow.push_back({"ext/cam/", "", 500, ProxClass::Near});
    pol2.redirects.push_back({"other/", "acme/hub/", 1, 3});
    run(pol2, "{\"domain\":\"other/x\",\"route_ttl\":2}", "fallback_redirect");
    // 11) fallback membership redirect
    Policy pol3;
    pol3.memberships.push_back({"acme/", "", 0});
    run(pol3, "{\"domain\":\"other/x\",\"route_ttl\":2}", "fallback_member");
    // 12) visual whitelist break quirk
    Policy pol4;
    pol4.coexist_allow.push_back({"ext/", "", 500, ProxClass::Near});
    pol4.coexist_allow.push_back({"ext/cam/", "", 500, ProxClass::Near});
    pol4.visual_whitelist_domains = {"ext/screen/"};
    run(pol4, "{\"domain\":\"ext/cam/1\",\"radius_m\":1}", "visual_break");
    // 13) ttl clamping by global max
    Policy pol5;
    pol5.memberships.push_back({"acme/", "", 0});
    pol5.ttl_global_max = 2;
    run(pol5, "{\"domain\":\"other/x\",\"route_ttl\":9}", "ttl_clamp");

    // route helper rewrites
    {
        std::string m = "{\"domain\":\"ext/depot/z\", \"route_ttl\": 3, \"route_hops\": 1}";
        std::string o;
        T3Route::prepare_redirect_meta_prep(m, "acme/hub", 2, o);
        fprintf(out, "prep|%s\n", o.c_str());
        std::string o2;
        T3Route::prepare_redirect_meta_accept(o, "acme/hub", "ext/depot/", 1, o2);
        fprintf(out, "accept|%s\n", o2.c_str());
        T3Route::mark_accepted(o2);
        fprintf(out, "marked|%s\n", o2.c_str());
        std::string o3 = "{}";
        T3Route::mark_sandbox(o3);
        fprintf(out, "sandbox|%s\n", o3.c_str());
        std::string o4 = "";
        std::string o5;
        T3Route::prepare_redirect_meta_prep(o4, "", 1, o5);
        fprintf(out, "empty_prep|%s\n", o5.c_str());
        fprintf(out, "phase_get|%u\n", (unsigned)T3Route::get_phase_best_effort(o2));
        std::string nested = "{\"route\": {\"ttl\": 2, \"hops\": 4, \"phase\": 1}}";
        fprintf(out, "nested_get|%llu|%llu|%u\n",
                (unsigned long long)T3Route::get_uint_best_effort(nested, "route_ttl", "ttl"),
                (unsigned long long)T3Route::get_uint_best_effort(nested, "route_hops", "hops"),
                (unsigned)T3Route::get_phase_best_effort(nested));
    }
    fclose(out);
    printf("golden security written\n");
    return 0;
}
