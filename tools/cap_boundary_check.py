#!/usr/bin/env python3
"""Dev-only tooling (NOT part of the shipped Scala library).

DuckDB side of the truncating-regime certification (r15, extended
r16): after `sbt "Test/runMain graft.tools.CapBoundaryCheck"` has
written the degenerate corpus to /tmp/capcheck and the Spark results
(plus the oracle SQL of that very build) to /tmp/capcheck_out, this
runs each dumped op's oracle SQL over the SAME degenerate corpus and
compares string-exact, oracle_check.py-style. Unlike the sf0.01 gate —
where HotBucketSpec proves every cap truncates nothing — every bucket
here is far past its cap, so this exercises the declared rank-cap
semantics (and, since r16, the B58/e2e codebook rule in its
all-ties single-cell extreme) on BOTH engines where they actually
bite.

The op list is derived from the Spark dump's result directories (the
Scala tool is the single owner of which ops are cap-affected — a name
maintained in two languages would certify silently partially on
drift), and both caps are parsed from the Scala constants so the
truncating-regime sanity asserts can never go stale against a cap
change.

Usage: python3 tools/cap_boundary_check.py [oracleJsonDir]
       (defaults to the Spark dump dir itself, whose oracle_sql.json
        the Scala tool wrote from the same compiled build — ADVICE
        r15: a prior Verify dump could be stale against an oracle
        edit)
"""
import glob
import json
import os
import re
import sys

import duckdb
import pandas as pd

CORPUS = "/tmp/capcheck"
OUT = "/tmp/capcheck_out"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def scala_const(path: str, name: str) -> int:
    src = open(os.path.join(REPO, path)).read()
    # tolerate a type ascription / extra spaces; fail with a named
    # error instead of an opaque AttributeError on .group (ADVICE r15)
    m = re.search(rf"val\s+{name}(?::\s*Int)?\s*=\s*(\d+)", src)
    assert m, f"constant {name} not found as an int literal in {path}"
    return int(m.group(1))


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def main(verify_out: str) -> int:
    with open(f"{verify_out}/oracle_sql.json") as f:
        oracles = json.load(f)
    names = sorted(os.path.basename(p) for p in glob.glob(f"{OUT}/*")
                   if os.path.isdir(p))
    assert names, f"no Spark dumps under {OUT} — run CapBoundaryCheck first"
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        # Spark writes each table as a DIRECTORY of part files
        con.execute(
            f"CREATE VIEW {t} AS SELECT * "
            f"FROM '{CORPUS}/{t}.parquet/*.parquet'")

    # sanity: the regime actually truncates for BOTH cap families.
    # Docs: identical text ⇒ the base cluster alone fills one band
    # bucket per band. Vectors: identical ⇒ one sign bucket holds the
    # post-union corpus (base + the op's +0.01 variants, which cannot
    # flip a sign on the all-positive generator).
    max_docs = scala_const(
        "src/main/scala/graft/operators/LlmPipeline.scala", "MaxBucketDocs")
    max_vecs = scala_const(
        "src/main/scala/graft/operators/TrainingData.scala", "MaxBucketVecs")
    nd = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    nv = con.execute("SELECT count(*) FROM embeddings").fetchone()[0]
    nv_union = nv + (nv + 4) // 5  # op's corpus: base + vec_id%5==0 variants
    assert nd > max_docs, \
        f"doc cluster {nd} does not exceed MaxBucketDocs={max_docs}"
    assert nv_union > max_vecs, \
        f"embedding bucket {nv_union} does not exceed MaxBucketVecs={max_vecs}"

    missing = [n for n in names if n not in oracles]
    assert not missing, (
        f"dumped ops with no oracle entry (stale {OUT}? rerun "
        f"CapBoundaryCheck, which clears it): {missing}")
    n_fail = 0
    for name in names:
        got = norm(pd.read_parquet(f"{OUT}/{name}"))
        want = norm(con.execute(oracles[name]).fetchdf())
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} vs {len(want)}")
        if list(got.columns) != list(want.columns):
            problems.append(f"cols {list(got.columns)} vs {list(want.columns)}")
        if not problems:
            if list(got.dtypes.astype(str)) != list(want.dtypes.astype(str)):
                problems.append("dtypes " + str(list(
                    zip(got.columns, got.dtypes.astype(str),
                        want.dtypes.astype(str)))))
            gs, ws = got.astype(str), want.astype(str)
            if not gs.equals(ws):
                bad = (gs != ws).any(axis=1)
                idx = list(got.index[bad])[:3]
                problems.append(
                    f"values differ in {int(bad.sum())} rows, first at {idx}:\n"
                    f"  got:  {got.loc[idx].to_dict('records')}\n"
                    f"  want: {want.loc[idx].to_dict('records')}")
        if problems:
            n_fail += 1
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"ok    {name} (rows={len(got)}, caps ACTIVE)")
    # the single-sign-bucket construction makes the embedding bound
    # exact: a truncated bucket of max_vecs members emits C(max_vecs, 2)
    if "op_dedup_embedding" in names:
        n = len(pd.read_parquet(f"{OUT}/op_dedup_embedding"))
        expect = max_vecs * (max_vecs - 1) // 2
        assert n == expect, \
            f"embedding pair count {n} != C({max_vecs},2)={expect} — cap not exactly binding"
    print(f"\n{len(names) - n_fail}/{len(names)} capped ops match past the boundary")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else OUT))
