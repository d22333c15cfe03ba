#!/usr/bin/env python3
"""Pool per-query bests across N bench detail files; print sorted table
(and optional comparison with a second pool). Dev-only."""
import json, sys, glob

def pool(pats):
    best = {}
    n = 0
    for pat in pats:
        for p in glob.glob(pat):
            n += 1
            for k, v in json.load(open(p))["best"].items():
                if k not in best or v < best[k]:
                    best[k] = v
    return best, n

if __name__ == "__main__":
    args = sys.argv[1:]
    if "--vs" in args:
        i = args.index("--vs")
        a, na = pool(args[:i]); b, nb = pool(args[i+1:])
        rows = sorted(a, key=lambda k: -a[k])
        print(f"{'op':36s} {'base':>7s} {'now':>7s} {'speedup':>8s}  (pools: {na} vs {nb})")
        for k in rows:
            if k in b:
                print(f"{k:36s} {a[k]:7.2f} {b[k]:7.2f} {a[k]/b[k]:8.2f}")
        common = [k for k in a if k in b]
        ta, tb = sum(a[k] for k in common), sum(b[k] for k in common)
        print(f"{'TOTAL (common)':36s} {ta:7.2f} {tb:7.2f} {ta/tb:8.2f}")
    else:
        a, na = pool(args)
        print(f"# pooled over {na} files, total {sum(a.values()):.2f}s")
        for k in sorted(a, key=lambda k: -a[k]):
            print(f"{a[k]:7.2f} {k}")
