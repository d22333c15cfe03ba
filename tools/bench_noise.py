#!/usr/bin/env python3
"""Digest one or more Bench detail files (SPARK_GRAFT_BENCH_DETAIL) into
the BENCH_NOISE.md evidence tables: per-run environment summary, per-query
best/median/spread across every recorded repetition, and floor ratios
against bench_ref.json. Dev-side only (like oracle_check.py).

Usage: python3 tools/bench_noise.py bench_detail_run1.json [run2.json ...]
"""
import json
import statistics
import sys


def main(paths):
    runs = []
    for p in paths:
        with open(p) as f:
            runs.append((p, json.load(f)))
    with open("bench_ref.json") as f:
        raw = json.load(f)["queries"]
    # v1 floors are scalars; v2 carries {best,p50,spread,reps} per query
    ref = {q: (v["best"] if isinstance(v, dict) else v) for q, v in raw.items()}

    print("## Per-run environment summary\n")
    print("| run | order | total(best) s | wall s | gc s | proc-cpu s | "
          "load1(end) | tripped pre>post | retries |")
    print("|---|---|---|---|---|---|---|---|---|")
    for p, d in runs:
        total = sum(d["best"].values())
        print(f"| {p} | {d['order']} | {total:.2f} | {d['wall_sec']} | "
              f"{d['gc_ms_total']/1e3:.1f} | {d['cpu_sec_total']} | "
              f"{d['load1_end']} | {len(d['tripped_pre'])}>"
              f"{len(d['tripped_post'])} | {d['retry_n']} |")

    # pool every repetition across runs
    pooled = {}
    for _, d in runs:
        for q, rr in d["reps"].items():
            pooled.setdefault(q, []).extend(r["sec"] for r in rr)

    rows = []
    for q, ss in sorted(pooled.items()):
        best, med, worst = min(ss), statistics.median(ss), max(ss)
        fl = ref.get(q)
        rows.append((q, best, med, worst, worst / best,
                     best / fl if fl else None, len(ss)))

    print("\n## Noisiest queries (worst/best across all pooled reps)\n")
    print("| query | reps | best s | median s | worst s | spread x | best/floor |")
    print("|---|---|---|---|---|---|---|")
    for q, best, med, worst, spread, vf, n in sorted(
            rows, key=lambda r: -r[4])[:15]:
        vfs = f"{vf:.2f}x" if vf else "-"
        print(f"| {q} | {n} | {best:.2f} | {med:.2f} | {worst:.2f} | "
              f"{spread:.2f}x | {vfs} |")

    print("\n## Queries over the trip line on pooled BEST (grading risk)\n")
    # r12 trip line: max(1.5x floor, floor + 0.5s) — mirrors Bench.scala
    flagged = [r for r in rows
               if r[5] and r[1] > max(1.5 * ref[r[0]], ref[r[0]] + 0.5)]
    if not flagged:
        print("(none — every query's pooled best is under its trip line)")
    else:
        print("| query | best s | floor s | ratio |")
        print("|---|---|---|---|")
        for q, best, med, worst, spread, vf, n in sorted(
                flagged, key=lambda r: -r[5]):
            print(f"| {q} | {best:.2f} | {ref[q]:.2f} | {vf:.2f}x |")

    watch = ["op_dedup_minhash_incremental", "op_dedup_minhash",
             "op_stream_minhash_probe",
             # r11 weak set, cleared in r12 — kept as regression canaries
             "op_dedup_cc", "op_graph_pagerank", "op_dedup_simhash"]
    print("\n## Watched ops (r12 driver ratio head: the minhash family "
          "— 1.85x/1.68x/1.48x in BENCH_r12 vs <=1.39x local — plus "
          "the cleared r11 weak set as canaries)\n")
    # per-run bests carry their rep counts: adaptive retries make sample
    # sizes vary run-to-run, so bests across runs are NOT same-protocol
    # order statistics — compare only with n in view (ADVICE r11)
    print("| query | floor s | pooled best | ratio | per-run best(n) |")
    print("|---|---|---|---|---|")
    for q in watch:
        if q not in pooled:
            continue
        per_run = " / ".join(
            f"{min(r['sec'] for r in d['reps'][q]):.2f}(n={len(d['reps'][q])})"
            for _, d in runs if q in d["reps"])
        best = min(pooled[q])
        fl = ref.get(q)
        floor_s = f"{fl:.2f}" if fl else "-"
        ratio = f"{best/fl:.2f}x" if fl else "-"
        print(f"| {q} | {floor_s} | {best:.2f} | {ratio} | {per_run} |")


if __name__ == "__main__":
    main(sys.argv[1:])
