#!/usr/bin/env python3
"""Matching-pair bench protocol (dev tool, r15 judge item 3).

The round contract wants TWO independent full-suite draws that agree,
so a single lucky/unlucky window can never be the round's record. In
r15 the pair membership was chosen AFTER the fact from five accepted
draws — honest, but narrative. This tool makes the rule mechanical and
runs it to completion:

  draw guarded benches (the bench_guard.calib_dev acceptance rule,
  same medians, same tolerance) until TWO ACCEPTED draws agree —
  total within --agree (default 5%) AND headline within
  --headline-agree (default 0.5%) — then STOP. The pair is the FIRST
  agreeing pair in acceptance order; no post-hoc selection exists.

The landed artifact is the pair's FIRST member with machine-readable
pair metadata injected:

  "pair": [i, j]              draw indices of the pair members
  "pair_files": [...]         the two full per-query draw files
  "pair_totals": [...]        full-suite seconds, in pair order
  "pair_headlines": [...]     headline seconds, in pair order
  "pair_total_ratio": r       max/min of the totals
  "pair_headline_ratio": r    max/min of the headlines

If --max-draws is exhausted without an agreeing pair, the CLOSEST
accepted pair (smallest normalized disagreement) is landed with
"pair_unsatisfied": true and the tool exits 1, so the round log shows
the protocol did not converge.

Usage:
  python3 tools/bench_pair.py SF_DIR OUT_FILE [--tol 1.2]
      [--agree 0.05] [--headline-agree 0.005] [--max-draws 6]
      [--sleep 60]

Run with the machine otherwise idle (no sbt/spark), inside tmux.
"""
import json, os, subprocess, sys, time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import bench_guard as bg


def ratio(a, b):
    return max(a, b) / min(a, b) if min(a, b) > 0 else float("inf")


def land(out_file, first_path, meta):
    with open(first_path) as f:
        d = json.load(f)
    d.update(meta)
    with open(out_file, "w") as f:
        json.dump(d, f)
    print(f"[pair] landed {out_file} <- {first_path} with {meta}", flush=True)


def main():
    args = sys.argv[1:]
    tol, agree, hagree, max_draws, cool = 1.2, 0.05, 0.005, 6, 60
    for flag, cast in (("--tol", float), ("--agree", float),
                       ("--headline-agree", float), ("--max-draws", int),
                       ("--sleep", int)):
        if flag in args:
            i = args.index(flag)
            v = cast(args[i + 1])
            if flag == "--tol": tol = v
            elif flag == "--agree": agree = v
            elif flag == "--headline-agree": hagree = v
            elif flag == "--max-draws": max_draws = v
            else: cool = v
            args = args[:i] + args[i + 2:]
    sf_dir, out_file = args[0], args[1]
    m = bg.committed_medians(sf_dir)
    roll_pre, roll_post = (m if m else (None, None))
    if m:
        print(f"[pair] medians pre={roll_pre:.3f}s post={roll_post:.3f}s "
              f"tol {tol}x; agree {agree:.3f}/{hagree:.3f} "
              f"(total/headline)", flush=True)
    else:
        print("[pair] WARNING: no committed medians for this SF — "
              "acceptance is window-shape only", flush=True)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    accepted = []   # (draw_idx, path, total, headline), acceptance order
    best = None     # (score, meta) for the no-convergence fallback
    for t in range(1, max_draws + 1):
        tmp = f"{out_file}.draw{t}"
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
                   SPARK_GRAFT_BENCH_OUT=tmp)
        print(f"[pair] draw {t}/{max_draws} -> {tmp}", flush=True)
        r = subprocess.run(["tools/run_main.sh", "graft.Bench"],
                           cwd=repo, env=env, capture_output=True, text=True)
        if r.returncode != 0 or not os.path.exists(tmp):
            sys.stderr.write(r.stderr[-3000:])
            print(f"[pair] draw {t} FAILED to run", flush=True)
            continue
        with open(tmp) as f:
            d = json.load(f)
        dev = bg.calib_dev(d, roll_pre, roll_post, tol)
        total = d.get("value")
        head = d.get("headline_value")
        if (dev is None or not isinstance(total, (int, float))
                or not isinstance(head, (int, float))):
            # headline_value is REQUIRED: pairing a draw without it
            # would silently re-run the strict 0.5% headline gate
            # against the 5% totals — a MATCH on an agreement that was
            # never measured
            print(f"[pair] draw {t} missing calib/total/headline stamps "
                  "— rejected", flush=True)
            continue
        ok = dev <= tol
        print(f"[pair] draw {t}: total={total:.2f}s headline={head:.2f}s "
              f"calib max_dev={dev:.2f}x -> "
              f"{'ACCEPT' if ok else 'REJECT (calib)'}", flush=True)
        if ok:
            for (pi, pp, pt, ph) in accepted:
                tr, hr = ratio(pt, total), ratio(ph, head)
                meta = {"pair": [pi, t], "pair_files": [pp, tmp],
                        "pair_totals": [pt, total],
                        "pair_headlines": [ph, head],
                        "pair_total_ratio": round(tr, 5),
                        "pair_headline_ratio": round(hr, 5)}
                score = max((tr - 1.0) / agree, (hr - 1.0) / hagree)
                if best is None or score < best[0]:
                    best = (score, pp, meta)
                if tr - 1.0 <= agree and hr - 1.0 <= hagree:
                    print(f"[pair] MATCH: draws {pi} and {t} agree "
                          f"(total {tr:.4f}x, headline {hr:.4f}x)",
                          flush=True)
                    land(out_file, pp, meta)
                    sys.exit(0)
            accepted.append((t, tmp, total, head))
        if t < max_draws:
            print(f"[pair] cooling down {cool}s", flush=True)
            time.sleep(cool)

    if best is not None:
        _, pp, meta = best
        meta = dict(meta, pair_unsatisfied=True)
        print("[pair] NO agreeing pair within --max-draws; landing the "
              "closest accepted pair — treat with suspicion", flush=True)
        land(out_file, pp, meta)
    else:
        print("[pair] no two accepted draws at all — nothing landed",
              flush=True)
    sys.exit(1)


if __name__ == "__main__":
    main()
