#!/usr/bin/env python3
"""Local pre-check mimicking the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dir under <verifyOutDir>: load the Spark parquet result and
the DuckDB oracle result (oracle_sql.json), canonicalize (sort columns by
name, sort rows, round doubles, format timestamps), and compare row count,
schema, and a value hash. Dev-only tool — not part of the shipped library.
"""
import sys, os, json, glob, hashlib, re
import duckdb
import pandas as pd
import numpy as np


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if np.issubdtype(s.dtype, np.floating):
            out[c] = s.round(6)
        elif np.issubdtype(s.dtype, np.datetime64):
            out[c] = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        else:
            out[c] = s
    df = pd.DataFrame(out)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def h(df: pd.DataFrame) -> str:
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


def main(sf_dir, out_dir, skip_re=None):
    # skip_re: optional regex of entries to SKIP (reported, not silently
    # dropped) — used by the scale-proof runs, where a handful of oracles
    # are O(n^2) ALL-PAIRS ground truths (near-dup Jaccard/cosine over the
    # full corpus square) that DuckDB cannot finish at 10x; the OPERATORS
    # under test are banded/bucketed and scale fine (see BENCH_NOTES).
    skip = re.compile(skip_re) if skip_re else None
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        # Fixture tables may be single files (driver-generated) or Spark
        # output DIRECTORIES of part files (GenScale's 10x replicas).
        src = p if os.path.isfile(p) else os.path.join(p, "*.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(qdir):
            continue
        qname = os.path.basename(qdir)
        if skip and skip.search(qname):
            results[qname] = {"rows": -1, "oracle": "skipped (quadratic oracle at scale)"}
            continue
        try:
            spark_df = pd.concat(
                [pd.read_parquet(f) for f in glob.glob(os.path.join(qdir, "*.parquet"))],
                ignore_index=True)
        except Exception as e:
            results[qname] = {"error": f"spark read: {e}"}
            continue
        if qname not in oracle:
            results[qname] = {"rows": len(spark_df), "oracle": "none (rows-only)"}
            continue
        try:
            duck_df = con.execute(oracle[qname]).fetchdf()
        except Exception as e:
            results[qname] = {"error": f"duckdb: {e}"}
            continue
        a, b = canon(spark_df), canon(duck_df)
        res = {
            "rows_match": len(a) == len(b),
            "schema_match": list(a.dtypes.astype(str)) == list(b.dtypes.astype(str)),
            "hash_match": False,
            "rows": (len(a), len(b)),
            "schema": (list(zip(a.columns, a.dtypes.astype(str))),
                       list(zip(b.columns, b.dtypes.astype(str)))),
        }
        if res["rows_match"]:
            res["hash_match"] = h(a) == h(b)
            if not res["hash_match"]:
                neq = (a != b) & ~(a.isna() & b.isna())
                bad_cols = [c for c in a.columns if neq[c].any()]
                res["diff_cols"] = bad_cols
                for c in bad_cols[:2]:
                    i = neq[c].idxmax()
                    res.setdefault("example", {})[c] = [str(a[c][i]), str(b[c][i])]
        results[qname] = res
    ok = [q for q, r in results.items()
          if r.get("hash_match") or "oracle" in r]
    bad = {q: r for q, r in results.items()
           if not (r.get("hash_match") or "oracle" in r)}
    print(f"OK {len(ok)}/{len(results)}: {' '.join(ok)}")
    for q, r in bad.items():
        print(f"FAIL {q}: {json.dumps(r, default=str)[:600]}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None)
