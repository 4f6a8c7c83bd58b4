#!/usr/bin/env python3
"""Round-over-round bench drift gate (dev tool, not shipped).

Compares two full-registry bench JSONs (schema 2: {"queries": {name:
sec}}) and lists every gate whose time moved more than THRESH x in
either direction. Per the end-of-round contract (README "bench
protocol"), each flagged gate must get an isolated fresh-JVM re-draw
(`tools/run_main.sh graft.Bench --isolate <gates> --reps 3`) before the
round closes, and the iso medians are what adjudicate a real
regression vs VM contention.

Usage: python3 tools/drift_check.py PREV.json CURR.json [thresh=1.3]
Exit code 0 = no unexplained movers; 1 = movers listed on stdout.
"""
import json, sys

def load(p):
    with open(p) as f:
        d = json.load(f)
    return d.get("queries", d)

def main():
    prev, curr = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    movers = []
    for name in sorted(set(prev) & set(curr)):
        a, b = prev[name], curr[name]
        if not isinstance(a, (int, float)) or not isinstance(b, (int, float)):
            continue
        if a <= 0 or b <= 0:
            continue
        # ignore sub-200ms gates: scheduling jitter dominates there
        if max(a, b) < 0.2:
            continue
        r = b / a
        if r > thresh or r < 1.0 / thresh:
            movers.append((r, name, a, b))
    movers.sort(reverse=True)
    for r, name, a, b in movers:
        print(f"{name}: {a:.2f}s -> {b:.2f}s ({r:.2f}x)")
    new = sorted(set(curr) - set(prev))
    if new:
        print(f"# {len(new)} gates new this round (no comparator): "
              + ", ".join(new))
    gone = sorted(set(prev) - set(curr))
    if gone:
        print(f"# {len(gone)} gates missing vs prev: " + ", ".join(gone))
    sys.exit(1 if movers else 0)

if __name__ == "__main__":
    main()
