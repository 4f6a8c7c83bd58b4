#!/usr/bin/env python3
"""Dev tool: compare two graft.Bench landed files (1x vs Nx replica)
and report per-query scaling ratios/exponents.

Usage: python3 tools/scaling_report.py <bench_1x.json> <bench_Nx.json> [N]
           [--isolated <isolate_Nx.json>] [--isolated-1x <isolate_1x.json>]

exponent = log_N(t_Nx / t_1x), so 1.0 = linear, 0 = flat. Times below
FLOOR seconds at BOTH scales are reported but not flagged: they are
fixed-overhead dominated and the ratio is noise.

--isolated files come from `graft.Bench --isolate g1,g2 --reps N` (the
variance-bounded protocol): for any gate present there, the MEDIAN of
its isolated draws replaces the single suite draw at that scale, and
the row is flagged `med/N ±spread` — single-JVM suite draws of heavy
gates swing >2x on identical code (sparse-cosine: 21.3/44.8/28.0 s),
so no super-linear verdict should rest on one draw.
"""
import json, math, sys

FLOOR = 0.35  # below this at both scales, the ratio measures JIT noise

def load(p):
    d = json.loads(open(p).read())
    return d["queries"]

def load_isolated(p):
    if not p:
        return {}
    d = json.loads(open(p).read())
    return d.get("gates", {})

def main():
    argv = list(sys.argv[1:])
    iso_n, iso_1 = None, None
    if "--isolated" in argv:
        i = argv.index("--isolated"); iso_n = argv[i + 1]; del argv[i:i + 2]
    if "--isolated-1x" in argv:
        i = argv.index("--isolated-1x"); iso_1 = argv[i + 1]; del argv[i:i + 2]
    a, b = load(argv[0]), load(argv[1])
    n = float(argv[2]) if len(argv) > 2 else 10.0
    med_n, med_1 = load_isolated(iso_n), load_isolated(iso_1)
    rows = []
    for q in sorted(set(a) & set(b)):
        t1, tn = a[q], b[q]
        iso_note = ""
        if q in med_1:
            t1 = med_1[q]["median"]
            iso_note = f" med/{len(med_1[q]['runs'])}"
        if q in med_n:
            tn = med_n[q]["median"]
            iso_note += (f" med/{len(med_n[q]['runs'])}"
                         f" x{med_n[q]['spread']:.2f}")
        if t1 <= 0 or tn <= 0:
            rows.append((q, t1, tn, None, None, "ERR"))
            continue
        ratio = tn / t1
        exp = math.log(ratio, n)
        flag = ""
        if t1 < FLOOR and tn < FLOOR:
            flag = "floor"
        elif exp > 1.05:
            flag = "SUPER"
        elif exp > 0.85:
            flag = "~linear"
        rows.append((q, t1, tn, ratio, exp, flag + iso_note))
    rows.sort(key=lambda r: -(r[4] if r[4] is not None else 99))
    print(f"{'query':34s} {'t1x':>7s} {'tNx':>7s} {'ratio':>6s} {'exp':>5s}  flag")
    for q, t1, tn, ratio, exp, flag in rows:
        r = f"{ratio:6.2f}" if ratio else "   n/a"
        e = f"{exp:5.2f}" if exp is not None else "  n/a"
        print(f"{q:34s} {t1:7.3f} {tn:7.3f} {r} {e}  {flag}")
    meas = [r for r in rows if r[4] is not None
            and not r[5].startswith("floor")]
    sup = [r for r in meas if r[5].startswith("SUPER")]
    exps = sorted(r[4] for r in meas)
    if exps:
        med = exps[len(exps) // 2]
        print(f"\n{len(meas)} measurable (non-floor) queries; median exp "
              f"{med:.2f}; {len(sup)} super-linear: {[r[0] for r in sup]}")
    only_a = set(a) - set(b)
    if only_a:
        print(f"missing at Nx: {sorted(only_a)}")

if __name__ == "__main__":
    main()
