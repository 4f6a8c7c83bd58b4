#!/usr/bin/env python3
"""Calibration-guarded bench draw (dev tool, r13 judge item 2).

The r13 official bench was a 1.13x-reading of 1.01x code because the
draw landed in a VM storm. This wraps `tools/run_main.sh graft.Bench`
with the mechanical health check the round ran by hand: graft.Bench
stamps every artifact with calib_pre/calib_post (best-of-2 of the
fixed calibration gate q1_pricing_summary, taken immediately before
and after the draw). A draw is ACCEPTED only when

  1. calib_post is not more than TOL slower than calib_pre (a storm
     did not develop mid-draw),
  2. calib_pre is not more than ASYM_BOUND slower than calib_post
     (r14 advice: a storm that covered the FIRST half of the draw
     leaves a sick pre and a healthy post — post/pre < 1 alone would
     accept it. The systematic healthy warm-up asymmetry is ~2x
     (measured 0.687s -> 0.323s); beyond 3x the first half was sick),
  3. neither is more than TOL slower than the committed rolling
     median for its OWN edge — pre vs the pre-median, post vs the
     post-median (r14 advice: pooling them let accumulating warm post
     readings drag the pooled median down until healthy cold pre
     readings were spuriously rejected).

  Checks 1 and 3 are ONE-SIDED on purpose: a storm makes calibration
  SLOW; faster than the median is just a warm/healthy VM, and the
  resulting artifact is conservative, never flattering. Check 2 is
  the one place "pre much slower than post" is itself the sickness
  signature.

Reference medians come from tools/calib_median.json (committed, keyed
by SF, split pre/post) by default; --ref artifacts override it. With
neither, the only checks are 1 and 2 and the script says so LOUDLY.

Otherwise the draw is rejected and re-drawn (up to --max-tries, with
a cool-down sleep). If no draw passes, the one with the best (lowest)
max-deviation is kept and the script exits 1 so the round log shows
the round closed on an unguarded draw.

Usage:
  python3 tools/bench_guard.py SF_DIR OUT_FILE \
      [--ref BENCH_a.json ...] [--tol 1.2] [--max-tries 3] [--sleep 60]

Refs may be older artifacts without calib stamps; for those the
queries.q1_pricing_summary suite time substitutes on the PRE side
(same gate, same best-of-2 methodology, taken mid-suite).
"""
import json, os, shutil, subprocess, sys, time

ASYM_BOUND = 3.0  # healthy pre/post warm-up asymmetry is ~2x; 3x = sick first half


def ref_calibs(paths):
    """(pre_readings, post_readings) from --ref artifacts."""
    pres, posts = [], []
    for p in paths:
        try:
            with open(p) as f:
                d = json.load(f)
        except Exception:
            continue
        if isinstance(d.get("parsed"), dict):
            d = d["parsed"]
        v = d.get("calib_pre")
        if isinstance(v, (int, float)) and v > 0:
            pres.append(float(v))
        v = d.get("calib_post")
        if isinstance(v, (int, float)) and v > 0:
            posts.append(float(v))
        if not any(k in d for k in ("calib_pre", "calib_post")):
            q = d.get("queries", {}).get("q1_pricing_summary")
            if isinstance(q, (int, float)) and q > 0:
                pres.append(float(q))
    return pres, posts


def committed_medians(sf_dir):
    """(pre, post) medians for this SF from tools/calib_median.json."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "calib_median.json")
    try:
        with open(path) as f:
            d = json.load(f)
    except Exception:
        return None
    base = os.path.basename(sf_dir.rstrip("/"))
    for key in ("sf0.01", "sf0.1", "sf1"):
        if key in base and key in d:
            return float(d[key]["pre"]), float(d[key]["post"])
    return None


def median(xs):
    s = sorted(xs)
    return s[len(s) // 2] if s else None


def calib_dev(d, roll_pre, roll_post, tol):
    """Max calibration deviation of a landed Bench artifact dict, or
    None if the calib stamps are missing. Shared with bench_pair.py so
    the pair protocol accepts draws by EXACTLY the same rule."""
    pre, post = d.get("calib_pre", -1), d.get("calib_post", -1)
    if pre <= 0 or post <= 0:
        return None
    # one-sided vs own-edge medians (slow = sick, fast = warm), plus
    # the two window-shape checks (post/pre storm, pre/post asymmetry)
    devs = [max(post / pre, 1.0), max(pre / post / ASYM_BOUND * tol, 1.0)]
    if roll_pre:
        devs.append(max(pre / roll_pre, 1.0))
    if roll_post:
        devs.append(max(post / roll_post, 1.0))
    return max(devs)


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
    if refs:
        pres, posts = ref_calibs(refs)
        roll_pre, roll_post = median(pres), median(posts)
        src = f"{len(refs)} --ref artifacts"
    else:
        m = committed_medians(sf_dir)
        roll_pre, roll_post = (m if m else (None, None))
        src = "tools/calib_median.json" if m else None
    if roll_pre is None and roll_post is None:
        print("[guard] WARNING: no reference medians (no --ref, no "
              "committed entry for this SF) — only the post/pre and "
              "asymmetry checks run; a uniformly-sick window would be "
              "ACCEPTED. Supply --ref or extend calib_median.json.",
              flush=True)
    else:
        print(f"[guard] rolling medians from {src}: "
              f"pre={roll_pre:.3f}s post={roll_post:.3f}s tol {tol}x",
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
        dev = calib_dev(d, roll_pre, roll_post, tol)
        if dev is None:
            print(f"[guard] draw {t} missing calib stamps — rejected", flush=True)
            continue
        pre, post = d.get("calib_pre", -1), d.get("calib_post", -1)
        ok = dev <= tol
        print(f"[guard] draw {t}: calib_pre={pre:.3f}s calib_post={post:.3f}s"
              f" guard={d.get('calib_guard', '?')}"
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
