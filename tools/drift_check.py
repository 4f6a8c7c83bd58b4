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
                [--min-abs [SECS]] [--iso BENCH_iso_*.json ...]
Exit code 0 = no UNADJUDICATED movers; 1 = unadjudicated movers listed.

--min-abs SECS (default 0.5 when the flag is given, 0 otherwise) is an
absolute-delta floor (r15 judge item 5): a mover whose |curr - prev| is
below the floor is still PRINTED (tagged "below --min-abs floor") but
does not fail the gate — sub-half-second ratio movers are scheduling
noise at suite scale and each used to cost a sentence of human
adjudication without ever being a real regression.

--iso files are graft.Bench --isolate artifacts ({"gates": {name:
{"median": sec, ...}}}). A SLOWDOWN mover is ADJUDICATED only when its
iso median REFUTES the regression (iso_median <= thresh x prev) — an
iso re-draw that lands at the regressed time CONFIRMS it and the gate
still fails (r14 advice: presence alone used to excuse the mover). A
speedup mover with an iso median is adjudicated either way: the iso
tells you whether the improvement is real or noise, and neither answer
is a regression.
"""
import json, sys

def load(p):
    with open(p) as f:
        d = json.load(f)
    # accept all three shapes: a bare Bench line, the Bench landed
    # file, and the driver's BENCH_r*.json wrapper ({"parsed": line})
    if isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    return d.get("queries", d)

def load_iso(paths):
    adjudicated = {}
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        for name, g in d.get("gates", {}).items():
            med = g.get("median")
            if isinstance(med, (int, float)):
                adjudicated[name] = med
    return adjudicated

def main():
    args = sys.argv[1:]
    # parse --min-abs BEFORE --iso: --iso greedily consumes the rest of
    # the argv as iso file paths, so a later --min-abs would be read as
    # a (nonexistent) file and crash the gate
    min_abs = 0.0
    if "--min-abs" in args:
        i = args.index("--min-abs")
        nxt = args[i + 1] if i + 1 < len(args) else None
        try:
            min_abs = float(nxt)
            del args[i:i + 2]
        except (TypeError, ValueError):
            min_abs = 0.5
            del args[i]
    iso_paths = []
    if "--iso" in args:
        i = args.index("--iso")
        iso_paths = args[i + 1:]
        args = args[:i]
    prev, curr = load(args[0]), load(args[1])
    thresh = float(args[2]) if len(args) > 2 else 1.3
    iso = load_iso(iso_paths)
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
    open_movers = 0
    for r, name, a, b in movers:
        below_floor = abs(b - a) < min_abs
        floor_tag = (f" [below --min-abs floor {min_abs:g}s — informational]"
                     if below_floor else "")
        if name in iso:
            med = iso[name]
            if r > thresh and med / a > thresh:
                # iso re-draw lands at the regressed time: CONFIRMED
                if not below_floor:
                    open_movers += 1
                print(f"{name}: {a:.2f}s -> {b:.2f}s ({r:.2f}x) "
                      f"[CONFIRMED by iso median {med:.2f}s = "
                      f"{med / a:.2f}x prev — real regression]{floor_tag}")
            else:
                print(f"{name}: {a:.2f}s -> {b:.2f}s ({r:.2f}x) "
                      f"[ADJUDICATED: iso median {med:.2f}s = "
                      f"{med / a:.2f}x prev]")
        else:
            if not below_floor:
                open_movers += 1
            print(f"{name}: {a:.2f}s -> {b:.2f}s ({r:.2f}x){floor_tag}")
    new = sorted(set(curr) - set(prev))
    if new:
        print(f"# {len(new)} gates new this round (no comparator): "
              + ", ".join(new))
    gone = sorted(set(prev) - set(curr))
    if gone:
        print(f"# {len(gone)} gates missing vs prev: " + ", ".join(gone))
    sys.exit(1 if open_movers else 0)

if __name__ == "__main__":
    main()
