#!/usr/bin/env python3
"""Automated bench A/B (NOT part of the library): the worktree discipline
that separated machine-state drift from code deltas in rounds 11-14, as a
tool instead of a manual checklist.

What it does:
  1. `git worktree add` the reference commit (the OLD tree) and `sbt
     compile` it once.
  2. Split the query list into N groups and run them BATCH-INTERLEAVED:
     old(group1), new(group1), old(group2), new(group2), ... — each pair
     of runs is minutes apart instead of a full suite apart, so
     hour-scale machine drift (the 198-256s same-code band of round 14)
     cancels within each pair.
  3. Merge into BENCH_AB.json: per-query [old, new, ratio], the MEDIAN
     ratio across all queries (the machine-drift estimator — most queries
     are untouched by any one change, so the median isolates ambient
     state), and each query's drift-normalized ratio (ratio / median).
     A normalized ratio near 1.0 is machine state; far from 1.0 is code.

Usage: python3 tools/bench_ab.py <old-ref> [--groups N] [--sf DIR]
       [--prefix q_...]  (repeatable filter for a targeted A/B)

  4. ADJUDICATE (round 16: fully automatic to conviction): single-run
     pairs on heavy queries carry ±40-60% run-to-run variance that
     pairing cannot remove (measured same-code: round 14's q_mm_resize
     5.03 vs 3.16 same day; round 15's q_dedup_keep_best read
     old-slower AND new-slower in alternating pairs — the manual rule
     those rounds applied was "direction must reproduce across >= 3
     samples"). The tool now runs that rule itself: every flagged query
     is re-measured once (pass 2); anything still outside [0.8, 1.25]
     on min-of-samples gets a THIRD sample; the final verdict is
     "code_regression"/"code_improvement" ONLY when all three sample
     pairs agree in direction AND the min-ratio stays outside the band,
     else "noise" (round 15's first full run flagged
     q_corpus_split_safe at 2.26x; the adjudication pair read 1.10x).
     BENCH_AB.json carries every sample, so the conviction is auditable
     without reruns.

Caveats: filtered Bench runs skip the requalification medians and never
write BENCH_LOCAL.json (by design); this tool captures their stdout JSON
lines. Worktree builds share the coursier cache (offline mode) but have
their own target/, so the first old-tree compile costs a few minutes.
Store-backed serving queries (persisted minhash/lex/vector indexes under
/tmp) are CONFOUNDED in the old-then-new order: the old tree pays any
cold one-time store build, the new tree serves warm — large apparent
improvements on *_indexed/*_persisted/*_deleted queries are usually this,
not code; adjudication re-measures both warm and settles it.
"""
import argparse
import json
import os
import re
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(cmd, cwd, capture=False):
    print(f"[ab] $ {' '.join(cmd)}  (cwd={cwd})", file=sys.stderr)
    if capture:
        return subprocess.run(cmd, cwd=cwd, check=True,
                              stdout=subprocess.PIPE, text=True).stdout
    subprocess.run(cmd, cwd=cwd, check=True)
    return None


def bench_json(tree, names, sf):
    """Run graft.Bench in `tree` filtered to `names`; parse its stdout line."""
    arg = " ".join(["graft.Bench"] + names)
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf)
    out = subprocess.run(
        ["sbt", "-batch", f"runMain {arg}"], cwd=tree, env=env, check=True,
        stdout=subprocess.PIPE, text=True).stdout
    for line in out.splitlines():
        line = line.strip()
        if line.startswith('{"metric":"total"'):
            return json.loads(line)
    raise RuntimeError(f"no bench JSON line in output from {tree}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old_ref")
    ap.add_argument("--groups", type=int, default=4)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--prefix", action="append", default=[])
    args = ap.parse_args()

    old_tree = f"/tmp/graft_ab_{args.old_ref.replace('/', '_')}"
    if not os.path.isdir(old_tree):
        sh(["git", "worktree", "add", old_tree, args.old_ref], cwd=REPO)
    sh(["sbt", "-batch", "compile"], cwd=old_tree)
    sh(["sbt", "-batch", "compile"], cwd=REPO)

    # query list = the last committed full record's keys (both trees will
    # silently skip names they don't know via the prefix filter)
    with open(os.path.join(REPO, "BENCH_LOCAL.json")) as f:
        names = sorted(json.load(f)["queries"].keys())
    if args.prefix:
        names = [n for n in names if any(n.startswith(p) for p in args.prefix)]
    k = max(1, (len(names) + args.groups - 1) // args.groups)
    groups = [names[i:i + k] for i in range(0, len(names), k)]

    old_q, new_q = {}, {}
    old_meta, new_meta = [], []
    for gi, g in enumerate(groups):
        print(f"[ab] group {gi + 1}/{len(groups)}: {len(g)} queries",
              file=sys.stderr)
        o = bench_json(old_tree, g, args.sf)
        n = bench_json(REPO, g, args.sf)
        old_q.update(o["queries"]); new_q.update(n["queries"])
        old_meta.append({k2: o.get(k2) for k2 in
                         ("calib_sec", "calib_par_sec", "loadavg", "contended")})
        new_meta.append({k2: n.get(k2) for k2 in
                         ("calib_sec", "calib_par_sec", "loadavg", "contended")})

    common = sorted(set(old_q) & set(new_q))
    pairs = {}
    ratios = []
    for q in common:
        a, b = old_q[q], new_q[q]
        if a and b and a > 0 and b > 0:
            r = b / a
            pairs[q] = [round(a, 3), round(b, 3), round(r, 4)]
            if a >= 0.2:  # noise floor: sub-200ms queries carry no signal
                ratios.append(r)
        else:
            pairs[q] = [a, b, None]
    med = statistics.median(ratios) if ratios else None
    norm = {q: round(v[2] / med, 4) for q, v in pairs.items()
            if v[2] is not None and med} if med else {}
    flagged = {q: r for q, r in norm.items()
               if (r > 1.25 or r < 0.8) and max(pairs[q][0], pairs[q][1]) >= 0.5}

    # adjudicate: the rule rounds 14-15 applied by hand — a code-delta
    # conviction needs the DIRECTION to reproduce across >= 3 samples,
    # because single pairs on heavy queries carry +/-40-60% same-code
    # variance. Pass 2 re-measures every flagged query once (kills the
    # one-unlucky-GC case); anything still outside the band gets a THIRD
    # sample, and the final verdict is three-class:
    #   noise            — min-of-samples ratio back inside [0.8, 1.25],
    #                      or the per-sample directions disagree
    #   code_regression  — all sample pairs slower AND min-ratio > 1.25
    #   code_improvement — all sample pairs faster AND min-ratio < 0.8
    # The tool emits the conviction; round notes cite it, no manual reruns.
    adjudicated = {}
    if flagged:
        fq = sorted(flagged)
        samples_old = {q: [pairs[q][0]] for q in fq}
        samples_new = {q: [pairs[q][1]] for q in fq}
        print(f"[ab] adjudicating {len(fq)} flagged queries (pass 2)",
              file=sys.stderr)
        o2 = bench_json(old_tree, fq, args.sf)["queries"]
        n2 = bench_json(REPO, fq, args.sf)["queries"]
        for q in fq:
            if o2.get(q): samples_old[q].append(o2[q])
            if n2.get(q): samples_new[q].append(n2[q])
        still = [q for q in fq
                 if (min(samples_new[q]) / min(samples_old[q]) / med) > 1.25
                 or (min(samples_new[q]) / min(samples_old[q]) / med) < 0.8]
        if still:
            print(f"[ab] third sample for {len(still)} still-flagged",
                  file=sys.stderr)
            o3 = bench_json(old_tree, still, args.sf)["queries"]
            n3 = bench_json(REPO, still, args.sf)["queries"]
            for q in still:
                if o3.get(q): samples_old[q].append(o3[q])
                if n3.get(q): samples_new[q].append(n3[q])
        for q in fq:
            a = min(samples_old[q])
            b = min(samples_new[q])
            r = round(b / a / med, 4)
            # a re-bench run can omit a query on one tree (crash, -1
            # sentinel): zip would silently truncate the pair list, the
            # len>=3 conviction bar would become unreachable, and a real
            # regression would land as 'noise' with no diagnostic —
            # unequal sample counts are their own verdict instead
            balanced = len(samples_old[q]) == len(samples_new[q])
            if not balanced:
                print(f"[ab] {q}: unbalanced samples "
                      f"old={len(samples_old[q])} new={len(samples_new[q])}"
                      " — marking insufficient_samples", file=sys.stderr)
            per_sample = [sn / so / med for so, sn in
                          zip(samples_old[q], samples_new[q])]
            same_dir = (all(x > 1.0 for x in per_sample) or
                        all(x < 1.0 for x in per_sample))
            verdict = "noise" if balanced else "insufficient_samples"
            if balanced and r > 1.25 and same_dir and len(per_sample) >= 3:
                verdict = "code_regression"
            elif balanced and r < 0.8 and same_dir and len(per_sample) >= 3:
                verdict = "code_improvement"
            adjudicated[q] = {
                "samples_old": [round(x, 3) for x in samples_old[q]],
                "samples_new": [round(x, 3) for x in samples_new[q]],
                "per_sample_normalized": [round(x, 4) for x in per_sample],
                "direction_reproduced": same_dir,
                "old_min": round(a, 3), "new_min": round(b, 3),
                "normalized_ratio": r, "verdict": verdict}
        flagged = {q: v["normalized_ratio"] for q, v in adjudicated.items()
                   if v["verdict"] != "noise"}

    record = {
        "old_ref": args.old_ref,
        "sf": args.sf,
        "groups": len(groups),
        "n_queries": len(common),
        "median_ratio_machine_drift": round(med, 4) if med else None,
        "pairs": pairs,
        "normalized_ratio": norm,
        "adjudication": adjudicated,
        "flagged_code_deltas": flagged,
        "old_meta": old_meta,
        "new_meta": new_meta,
    }
    out = os.path.join(REPO, "BENCH_AB.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(f"[ab] wrote {out}: median drift ratio "
          f"{record['median_ratio_machine_drift']}, "
          f"{len(flagged)} flagged code deltas: {flagged}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
