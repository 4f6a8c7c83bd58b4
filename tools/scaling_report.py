#!/usr/bin/env python3
"""Dev tool: compare two graft.Bench landed files (1x vs Nx replica)
and report per-query scaling ratios/exponents.

Usage: python3 tools/scaling_report.py <bench_1x.json> <bench_Nx.json> [N]

exponent = log_N(t_Nx / t_1x), so 1.0 = linear, 0 = flat. Times below
FLOOR seconds at BOTH scales are reported but not flagged: they are
fixed-overhead dominated and the ratio is noise.
"""
import json, math, sys

FLOOR = 0.35  # below this at both scales, the ratio measures JIT noise

def load(p):
    d = json.loads(open(p).read())
    return d["queries"]

def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    n = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    rows = []
    for q in sorted(set(a) & set(b)):
        t1, tn = a[q], b[q]
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
        rows.append((q, t1, tn, ratio, exp, flag))
    rows.sort(key=lambda r: -(r[4] if r[4] is not None else 99))
    print(f"{'query':34s} {'t1x':>7s} {'tNx':>7s} {'ratio':>6s} {'exp':>5s}  flag")
    for q, t1, tn, ratio, exp, flag in rows:
        r = f"{ratio:6.2f}" if ratio else "   n/a"
        e = f"{exp:5.2f}" if exp is not None else "  n/a"
        print(f"{q:34s} {t1:7.3f} {tn:7.3f} {r} {e}  {flag}")
    meas = [r for r in rows if r[4] is not None and r[5] != "floor"]
    sup = [r for r in meas if r[5] == "SUPER"]
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
