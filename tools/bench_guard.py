#!/usr/bin/env python3
"""Calibration-guarded bench draw (dev tool, r13 judge item 2).

The r13 official bench was a 1.13x-reading of 1.01x code because the
draw landed in a VM storm. This wraps `tools/run_main.sh graft.Bench`
with the mechanical health check the round ran by hand: graft.Bench
stamps every artifact with calib_pre/calib_post (best-of-2 of the
fixed calibration gate q1_pricing_summary, taken immediately before
and after the draw). A draw is ACCEPTED only when

  1. calib_post is not more than TOL slower than calib_pre (a storm
     did not develop mid-draw), and
  2. neither is more than TOL SLOWER than the rolling median of the
     calibration readings in the given --ref artifacts.

  Both checks are ONE-SIDED on purpose: a storm makes calibration
  SLOW. A post reading FASTER than pre is the systematic warm-up
  asymmetry (page cache + compiled-plan caches after a full suite;
  measured on the first guarded draw: pre 0.687s, post 0.323s on a
  healthy VM), and a draw faster than the rolling median just means
  the refs were taken on a noisier session (the r13 situation) — in
  both cases the resulting artifact is conservative, never
  flattering.

Otherwise the draw is rejected and re-drawn (up to --max-tries, with
a cool-down sleep). If no draw passes, the one with the best (lowest)
max-deviation is kept and the script exits 1 so the round log shows
the round closed on an unguarded draw.

Usage:
  python3 tools/bench_guard.py SF_DIR OUT_FILE \
      [--ref BENCH_a.json ...] [--tol 1.2] [--max-tries 3] [--sleep 60]

Refs may be older artifacts without calib stamps; for those the
queries.q1_pricing_summary suite time substitutes (same gate, same
best-of-2 methodology, just taken mid-suite instead of at the edges).
"""
import json, os, shutil, subprocess, sys, time


def ref_calibs(paths):
    vals = []
    for p in paths:
        try:
            with open(p) as f:
                d = json.load(f)
        except Exception:
            continue
        for k in ("calib_pre", "calib_post"):
            v = d.get(k)
            if isinstance(v, (int, float)) and v > 0:
                vals.append(float(v))
        if not any(k in d for k in ("calib_pre", "calib_post")):
            q = d.get("queries", {}).get("q1_pricing_summary")
            if isinstance(q, (int, float)) and q > 0:
                vals.append(float(q))
    return vals


def median(xs):
    s = sorted(xs)
    return s[len(s) // 2] if s else None


def main():
    args = sys.argv[1:]
    refs, tol, tries, cool = [], 1.2, 3, 60
    if "--ref" in args:
        i = args.index("--ref")
        j = i + 1
        while j < len(args) and not args[j].startswith("--"):
            refs.append(args[j]); j += 1
        args = args[:i] + args[j:]
    for flag, cast in (("--tol", float), ("--max-tries", int), ("--sleep", int)):
        if flag in args:
            i = args.index(flag)
            v = cast(args[i + 1])
            if flag == "--tol": tol = v
            elif flag == "--max-tries": tries = v
            else: cool = v
            args = args[:i] + args[i + 2:]
    sf_dir, out_file = args[0], args[1]
    roll = median(ref_calibs(refs))
    print(f"[guard] rolling calib median: "
          f"{f'{roll:.3f}s' if roll else 'none (no refs)'} tol {tol}x",
          flush=True)

    best = None  # (max_dev, tmp_path, draw_index)
    for t in range(1, tries + 1):
        tmp = f"{out_file}.draw{t}"
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
                   SPARK_GRAFT_BENCH_OUT=tmp)
        print(f"[guard] draw {t}/{tries} -> {tmp}", flush=True)
        r = subprocess.run(["tools/run_main.sh", "graft.Bench"],
                           cwd=os.path.dirname(os.path.dirname(
                               os.path.abspath(__file__))),
                           env=env, capture_output=True, text=True)
        if r.returncode != 0 or not os.path.exists(tmp):
            sys.stderr.write(r.stderr[-3000:])
            print(f"[guard] draw {t} FAILED to run", flush=True)
            continue
        with open(tmp) as f:
            d = json.load(f)
        pre, post = d.get("calib_pre", -1), d.get("calib_post", -1)
        if pre <= 0 or post <= 0:
            print(f"[guard] draw {t} missing calib stamps — rejected", flush=True)
            continue
        # all one-sided: slow = sick, fast = warm/healthy (see module doc)
        devs = [max(post / pre, 1.0)]
        if roll:
            devs += [max(pre / roll, 1.0), max(post / roll, 1.0)]
        dev = max(devs)
        ok = dev <= tol
        print(f"[guard] draw {t}: calib_pre={pre:.3f}s calib_post={post:.3f}s"
              f" max_dev={dev:.2f}x -> {'ACCEPT' if ok else 'REJECT'}",
              flush=True)
        if best is None or dev < best[0]:
            best = (dev, tmp, t)
        if ok:
            shutil.copyfile(tmp, out_file)
            print(f"[guard] landed {out_file} (draw {t})", flush=True)
            sys.exit(0)
        if t < tries:
            print(f"[guard] cooling down {cool}s before re-draw", flush=True)
            time.sleep(cool)

    if best is not None:
        shutil.copyfile(best[1], out_file)
        print(f"[guard] NO draw passed calibration; landed least-bad draw "
              f"{best[2]} (max_dev={best[0]:.2f}x) — treat with suspicion",
              flush=True)
    sys.exit(1)


if __name__ == "__main__":
    main()
