#!/usr/bin/env python3
"""Build a v2 bench_ref.json (the drift-tripwire floor file) from N
Bench detail files recorded at ONE commit under ONE protocol.

The v1 floor file carried a scalar floor per query, accreted across
harness eras (pre-warm-up, pre-retry); v2 records, per query, the
pooled {best, p50, spread, reps} across every repetition of every
input run, plus run-level provenance, so the tripwire compares
like-to-like and a reader can judge how trustworthy each floor is.
Bench.scala accepts both formats (it reads v2's `best`).

Record floor runs with the tripwire DISABLED (SPARK_GRAFT_BENCH_REF=
/nonexistent): no adaptive retries fire, so every query contributes a
uniform best-of-RUNS per run — same-protocol order statistics
(ADVICE r11: varying rep counts make cross-run bests incomparable).

Usage: python3 tools/bench_rebase.py out.json detail1.json [detail2 ...]
"""
import json
import statistics
import subprocess
import sys


def main(out_path, detail_paths):
    runs = []
    for p in detail_paths:
        with open(p) as f:
            runs.append(json.load(f))

    # enforce the stated protocol instead of merely documenting it: a
    # detail file recorded WITH adaptive retries gives its tripwired
    # queries extra samples (non-same-protocol order statistics), and
    # mixed reps-per-run would falsify the provenance block below
    for p, d in zip(detail_paths, runs):
        if d["retry_n"] != 0:
            sys.exit(f"{p}: retry_n={d['retry_n']} — floor runs must be "
                     "recorded with the tripwire disabled "
                     "(SPARK_GRAFT_BENCH_REF=/nonexistent)")
        if d["runs"] != runs[0]["runs"]:
            sys.exit(f"{p}: runs={d['runs']} differs from "
                     f"{detail_paths[0]}'s {runs[0]['runs']} — one protocol "
                     "per floor file")
        # sf/cpus/order are protocol too (ADVICE r12): a pool mixing a
        # cpus=8 run into cpus=4 floors would deflate every floor with
        # no trace beyond a multi-valued provenance array nobody gates on
        for field in ("sf", "cpus", "order"):
            if d[field] != runs[0][field]:
                sys.exit(f"{p}: {field}={d[field]} differs from "
                         f"{detail_paths[0]}'s {runs[0][field]} — one "
                         "protocol per floor file")
        if sorted(d["reps"].keys()) != sorted(runs[0]["reps"].keys()):
            sys.exit(f"{p}: query set differs from {detail_paths[0]} — "
                     "all floor runs must cover the same suite")

    pooled = {}
    for d in runs:
        for q, rr in d["reps"].items():
            pooled.setdefault(q, []).extend(r["sec"] for r in rr)

    queries = {}
    for q, ss in sorted(pooled.items()):
        best = min(ss)
        queries[q] = {
            "best": round(best, 4),
            "p50": round(statistics.median(ss), 4),
            "spread": round(max(ss) / best, 2),
            "reps": len(ss),
        }

    # fail, don't record commit "" — the provenance field is the whole
    # point of the v2 format (ADVICE r12)
    rev = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                         capture_output=True, text=True)
    if rev.returncode != 0:
        sys.exit(f"git rev-parse failed ({rev.stderr.strip()}) — floor "
                 "files must record the commit they were measured at")
    commit = rev.stdout.strip()
    doc = {
        "format": 2,
        "commit": commit,
        "protocol": {
            "runs": len(runs),
            "reps_per_run": runs[0]["runs"],
            # scalars: the rejection loop above guarantees these are
            # uniform across inputs (arrays here were the old ambiguity)
            "order": runs[0]["order"],
            "sf": runs[0]["sf"],
            "cpus": runs[0]["cpus"],
            "warmup": "uniform full pass (unrecorded)",
            "retries": "disabled (uniform rep counts)",
            "run_totals_best_sec": [round(sum(d["best"].values()), 2)
                                    for d in runs],
        },
        "value": round(sum(v["best"] for v in queries.values()), 3),
        "queries": queries,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(f"wrote {out_path}: {len(queries)} queries, "
          f"total-of-bests {doc['value']} s")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2:])
