"""Randomized differential scenarios for the security policy engine.

One generator (seeded, deterministic) produces a policy x meta x rotor x
callback matrix; the SAME scenario file drives both the compiled C++
reference oracle (tests/oracle/gen_fuzz_security.cpp, reads the file and
emits one decision line per meta) and the Python engine
(run_scenarios_python below).  tests/test_security.py diffs the outputs
line by line, so every branch interaction the reference takes
(membership/hash-prefix combos, proximity radius edges, visual-whitelist
break, two-round overlap with rotor + prep-cache state, TTL/hops edges,
nested route{} overrides, fallback redirect chains) is pinned by data,
not by 16 hand-picked cases (VERDICT round 4, weak #4).

Scenario file format (line-based; "-" = empty string; META takes the
rest of the line verbatim):

    S <sid>            start scenario
    M <prefix> <hash> <radius>          membership
    SELF <prefix> <hash> <radius>       legacy self
    A <prefix> <hash>                   internal allow
    C <prefix> <hash> <radius> <class>  coexist (class: 0|1|2|255)
    ROOT <root>                         allowed root (repeatable)
    DEPTH <n>  TTL <n>  HOPS <n>  OV <0|1>  TICK <n>
    VW <prefix>                         visual whitelist entry
    RD <from> <to> <tmin> <tmax>        redirect
    CB <prep 0|1|2> <acc 0|1|2> <nb 0|1>
    X <meta json ...>                   run decide_ex on this meta
    E                                   end scenario

Callback modes (identical canned behavior in C++ and Python):
  prep 0 none; 1 suggest neighbor+"prepared"; 2 refuse (no suggestion)
  acc  0 none; 1 always accept; 2 accept iff fnv1a64(requester) is even
  nb   0 none; 1 accept iff the tag domain contains "cam"

Policy-field wraps (uint8 depth/ttl/hops, uint32 radii, uint64 tick)
ARE exercised -- the Python dataclasses wrap in __post_init__ to match
the reference struct's C types (a real divergence this fuzz found).
Deliberately avoided (known, documented divergences of the ports'
integer types, not of the logic): meta numeric literals > 2^40 (C++
meta_find_uint accumulates uint64 with wrap, Python is unbounded),
domains with > 250 slashes (uint8 domain_depth wrap).
"""
from __future__ import annotations

import random

DNAMES = {0: "INTERNAL", 1: "COEXIST", 2: "SANDBOX", 3: "REJECT"}

ROOTS = ["acme/", "ext/", "partner/", "other/", "evil/", "zeta/"]
TAILS = ["", "video/", "video/enc", "cam/7", "cam/x/y", "depot/z",
         "a/b/c/d", "tools/x", "hub/", "screen/1", "other/z", "q"]
HASHES = ["", "ab", "ff", "zz", "abcd", "f", "ff12", "ffff", "abef"]
RADII = [0, 1, 40, 99, 100, 101, 400, 500, 501, 600, 900, 4294967295,
         4294967301]          # last one wraps uint32 -> 5
TTLS = [0, 1, 2, 3, 4, 9, 255, 300]
HOPSV = [0, 1, 5, 6, 7, 200]
CLASSES = ["local", "near", "far", "bogus", None]


def _dom(r: random.Random) -> str:
    return r.choice(ROOTS) + r.choice(TAILS)


def _meta(r: random.Random, domain: str | None = None,
          phase: int | None = None, ttl: int | None = None) -> str:
    """One randomized JSON-lite meta string (never contains a newline)."""
    parts = []
    d = domain if domain is not None else _dom(r)
    parts.append(f'"domain":"{d}"')
    if r.random() < 0.6:
        parts.append(f'"build_hash":"{r.choice(HASHES)}"')
    if r.random() < 0.3:
        th = r.choice(["fnv64:12ab", "fnv64:FFee09", "plainhash", ""])
        parts.append(f'"type_hash":"{th}"')
    if r.random() < 0.3:
        parts.append(f'"version":{r.randrange(0, 9)}')
    if r.random() < 0.6:
        parts.append(f'"radius_m":{r.choice(RADII)}')
    cls = r.choice(CLASSES)
    if cls is not None and r.random() < 0.7:
        parts.append(f'"class":"{cls}"')
    use_ttl = ttl if ttl is not None else r.choice(TTLS)
    if phase is not None or r.random() < 0.7:
        parts.append(f'"route_ttl":{use_ttl}')
        if r.random() < 0.5:
            parts.append(f'"route_hops":{r.choice(HOPSV)}')
        ph = phase if phase is not None else r.choice([0, 1, 2])
        if r.random() < 0.85 or phase is not None:
            parts.append(f'"route_phase":{ph}')
    if r.random() < 0.2:
        parts.append(f'"origin":"{_dom(r)}"')
    if r.random() < 0.25:
        # nested route{} object -- overrides the flat keys
        # (security_policy.hpp:112-172)
        sub = [f'"ttl": {r.choice(TTLS)}']
        if r.random() < 0.7:
            sub.append(f'"hops": {r.choice(HOPSV)}')
        if phase is None and r.random() < 0.7:
            sub.append(f'"phase": {r.choice([0, 1, 2])}')
        if r.random() < 0.3:
            sub.append(f'"origin": "{_dom(r)}"')
        parts.append('"route": {' + ", ".join(sub) + '}')
    if r.random() < 0.1:
        # scanner quirk food: a key name inside a string VALUE (the naive
        # substring scanners of BOTH implementations must agree on it)
        parts.append('"note":"radius_m x class near"')
    r.shuffle(parts)
    sep = " " if r.random() < 0.2 else ""
    return "{" + ("," + sep).join(parts) + "}"


def gen_scenarios(seed: int = 20250821, n_scenarios: int = 220):
    """Returns a list of scenario dicts; total meta count >= 1000."""
    r = random.Random(seed)
    out = []
    for sid in range(n_scenarios):
        sc = {"sid": sid, "members": [], "self": None, "allows": [],
              "coexists": [], "roots": [], "depth": r.choice([0, 2, 3, 4, 5, 260]),
              "vw": [], "redirects": [], "ttl_max": r.choice([0, 1, 2, 3, 9, 258]),
              "hops_max": r.choice([0, 1, 6, 200, 300]),
              "overlap": int(r.random() < 0.8), "tick": r.randrange(0, 6),
              "cb": (r.choice([0, 1, 1, 2]), r.choice([0, 0, 1, 2]),
                     r.choice([0, 0, 1])),
              "metas": []}
        for _ in range(r.randrange(0, 4)):
            sc["members"].append((r.choice(ROOTS) + r.choice(TAILS[:6]),
                                  r.choice(HASHES), r.choice(RADII[:8])))
        if r.random() < 0.3:
            sc["self"] = (r.choice(ROOTS), r.choice(HASHES),
                          r.choice(RADII[:8]))
        for _ in range(r.randrange(0, 3)):
            sc["allows"].append((r.choice(ROOTS) + r.choice(TAILS[:8]),
                                 r.choice(HASHES)))
        for _ in range(r.randrange(0, 4)):
            sc["coexists"].append((r.choice(ROOTS) + r.choice(TAILS[:8]),
                                   r.choice(HASHES), r.choice(RADII),
                                   r.choice([0, 1, 2, 255])))
        if r.random() < 0.75:
            sc["roots"] = r.sample(ROOTS, r.randrange(1, 5))
        for _ in range(r.randrange(0, 3)):
            sc["vw"].append(r.choice(ROOTS) + r.choice(TAILS[:8]))
        for _ in range(r.randrange(0, 3)):
            sc["redirects"].append((r.choice(ROOTS), r.choice(ROOTS)
                                    + r.choice(["hub/", "video/"]),
                                    r.choice([0, 1, 2]), r.choice([1, 3, 9])))
        n_meta = r.randrange(3, 8)
        i = 0
        while i < n_meta:
            if r.random() < 0.45 and i + 1 < n_meta:
                # two-round overlap pair on the same domain (phase 0 then 1)
                d = _dom(r)
                ttl = r.choice([1, 2, 3, 9])
                sc["metas"].append(_meta(r, domain=d, phase=0, ttl=ttl))
                sc["metas"].append(_meta(r, domain=d, phase=1, ttl=ttl))
                i += 2
            else:
                sc["metas"].append(_meta(r))
                i += 1
        out.append(sc)
    return out


def _tok(s: str) -> str:
    return s if s else "-"


def write_scenarios(scenarios, path: str) -> None:
    with open(path, "w") as f:
        for sc in scenarios:
            f.write(f"S {sc['sid']}\n")
            for p, h, rad in sc["members"]:
                f.write(f"M {_tok(p)} {_tok(h)} {rad}\n")
            if sc["self"]:
                p, h, rad = sc["self"]
                f.write(f"SELF {_tok(p)} {_tok(h)} {rad}\n")
            for p, h in sc["allows"]:
                f.write(f"A {_tok(p)} {_tok(h)}\n")
            for p, h, rad, cl in sc["coexists"]:
                f.write(f"C {_tok(p)} {_tok(h)} {rad} {cl}\n")
            for rt in sc["roots"]:
                f.write(f"ROOT {_tok(rt)}\n")
            f.write(f"DEPTH {sc['depth']}\nTTL {sc['ttl_max']}\n"
                    f"HOPS {sc['hops_max']}\nOV {sc['overlap']}\n"
                    f"TICK {sc['tick']}\n")
            for v in sc["vw"]:
                f.write(f"VW {_tok(v)}\n")
            for fr, to, tmin, tmax in sc["redirects"]:
                f.write(f"RD {_tok(fr)} {_tok(to)} {tmin} {tmax}\n")
            f.write(f"CB {sc['cb'][0]} {sc['cb'][1]} {sc['cb'][2]}\n")
            for m in sc["metas"]:
                f.write(f"X {m}\n")
            f.write("E\n")


def parse_scenarios(path: str):
    """Parse the scenario file back into scenario dicts (the test runs
    from the CHECKED-IN file, so generator drift cannot desync the two
    sides)."""
    scs, sc = [], None

    def untok(s):
        return "" if s == "-" else s

    for ln in open(path).read().splitlines():
        if not ln:
            continue
        op, _, rest = ln.partition(" ")
        t = rest.split()
        if op == "S":
            sc = {"sid": int(t[0]), "members": [], "self": None,
                  "allows": [], "coexists": [], "roots": [], "depth": 3,
                  "vw": [], "redirects": [], "ttl_max": 3, "hops_max": 6,
                  "overlap": 1, "tick": 0, "cb": (0, 0, 0), "metas": []}
        elif op == "M":
            sc["members"].append((untok(t[0]), untok(t[1]), int(t[2])))
        elif op == "SELF":
            sc["self"] = (untok(t[0]), untok(t[1]), int(t[2]))
        elif op == "A":
            sc["allows"].append((untok(t[0]), untok(t[1])))
        elif op == "C":
            sc["coexists"].append((untok(t[0]), untok(t[1]), int(t[2]),
                                   int(t[3])))
        elif op == "ROOT":
            sc["roots"].append(untok(t[0]))
        elif op == "DEPTH":
            sc["depth"] = int(t[0])
        elif op == "TTL":
            sc["ttl_max"] = int(t[0])
        elif op == "HOPS":
            sc["hops_max"] = int(t[0])
        elif op == "OV":
            sc["overlap"] = int(t[0])
        elif op == "TICK":
            sc["tick"] = int(t[0])
        elif op == "VW":
            sc["vw"].append(untok(t[0]))
        elif op == "RD":
            sc["redirects"].append((untok(t[0]), untok(t[1]), int(t[2]),
                                    int(t[3])))
        elif op == "CB":
            sc["cb"] = (int(t[0]), int(t[1]), int(t[2]))
        elif op == "X":
            sc["metas"].append(rest)
        elif op == "E":
            scs.append(sc)
            sc = None
    return scs


def run_scenarios_python(scenarios):
    """Run every scenario through the Python engine; returns output lines
    in the oracle's format: sid|k|DECISION|redir|target|ttl_after|tick."""
    from ternary_image_codec_tpu.security import policy as P

    lines = []
    for sc in scenarios:
        # construct via the dataclass constructors: the reference struct's
        # C-typed fields (uint8/uint32/uint64) wrap on assignment, which
        # the Python side models in __post_init__
        pol = P.Policy(
            memberships=[P.Membership(p, h, rad)
                         for p, h, rad in sc["members"]],
            internal_allow=[P.Allow(p, h) for p, h in sc["allows"]],
            coexist_allow=[P.Coexist(p, h, rad, P.ProxClass(cl))
                           for p, h, rad, cl in sc["coexists"]],
            allowed_roots=list(sc["roots"]),
            max_depth=sc["depth"],
            visual_whitelist_domains=list(sc["vw"]),
            redirects=[P.Redirect(fr, to, tmin, tmax)
                       for fr, to, tmin, tmax in sc["redirects"]],
            ttl_global_max=sc["ttl_max"],
            hops_global_max=sc["hops_max"],
            enable_overlap_redirect=bool(sc["overlap"]),
            rotor_tick=sc["tick"])
        if sc["self"]:
            p, h, rad = sc["self"]
            pol.self_ = P.Membership(p, h, rad)
        prep_m, acc_m, nb_m = sc["cb"]
        if prep_m == 1:
            pol.overlap_prepare_suggest = \
                lambda req, nb, tag: nb + "prepared"
        elif prep_m == 2:
            pol.overlap_prepare_suggest = lambda req, nb, tag: None
        if acc_m == 1:
            pol.overlap_second_accept = lambda req, tgt, tag: True
        elif acc_m == 2:
            pol.overlap_second_accept = \
                lambda req, tgt, tag: (P.fnv1a64(req) & 1) == 0
        if nb_m == 1:
            pol.query_neighbor_accept = lambda tag: "cam" in tag.domain
        for k, meta in enumerate(sc["metas"]):
            rx = P.decide_ex(pol, meta)
            lines.append(
                f"{sc['sid']}|{k}|{DNAMES[int(rx.decision)]}"
                f"|{int(rx.next.should_redirect)}|{rx.next.target_domain}"
                f"|{rx.next.ttl_after}|{pol.rotor_tick}")
    return lines
