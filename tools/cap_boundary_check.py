#!/usr/bin/env python3
"""Dev-only tooling (NOT part of the shipped Scala library).

DuckDB side of the truncating-regime cap certification (r15): after
`sbt "Test/runMain graft.tools.CapBoundaryCheck"` has written the
degenerate corpus to /tmp/capcheck and the Spark results to
/tmp/capcheck_out, this runs each cap-affected op's oracle SQL (taken
from a regular Verify dump's oracle_sql.json) over the SAME degenerate
corpus and compares string-exact, oracle_check.py-style. Unlike the
sf0.01 gate — where HotBucketSpec proves every cap truncates nothing —
every bucket here is far past its cap, so this exercises the declared
rank-cap semantics on BOTH engines where they actually bite.

Usage: python3 tools/cap_boundary_check.py [verifyOutDir]
       (verifyOutDir defaults to /tmp/vout; only oracle_sql.json is
        read from it)
"""
import json
import sys

import duckdb
import pandas as pd

CORPUS = "/tmp/capcheck"
OUT = "/tmp/capcheck_out"
NAMES = ["op_dedup_minhash", "op_dedup_cc", "op_dedup_simhash",
         "op_dedup_embedding", "op_dedup_minhash_incremental"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def main(verify_out: str) -> int:
    with open(f"{verify_out}/oracle_sql.json") as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        # Spark writes each table as a DIRECTORY of part files
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM '{CORPUS}/{t}.parquet/*.parquet'")
    # sanity: the regime is actually truncating (uncapped bucket of the
    # whole base cluster vs the 64-doc band cap)
    n = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert n > 64, f"degenerate corpus too small to exceed the cap: {n}"
    n_fail = 0
    for name in NAMES:
        got = norm(pd.read_parquet(f"{OUT}/{name}"))
        want = norm(con.execute(oracles[name]).fetchdf())
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} vs {len(want)}")
        elif list(got.columns) != list(want.columns):
            problems.append(f"cols {list(got.columns)} vs {list(want.columns)}")
        elif list(got.dtypes.astype(str)) != list(want.dtypes.astype(str)):
            problems.append("dtypes " + str(list(
                zip(got.columns, got.dtypes.astype(str),
                    want.dtypes.astype(str)))))
        else:
            gs, ws = got.astype(str), want.astype(str)
            if not gs.equals(ws):
                bad = (gs != ws).any(axis=1)
                problems.append(f"values differ in {int(bad.sum())} rows")
        if problems:
            n_fail += 1
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"ok    {name} (rows={len(got)}, caps ACTIVE)")
    print(f"\n{len(NAMES) - n_fail}/{len(NAMES)} capped ops match past the boundary")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout"))
