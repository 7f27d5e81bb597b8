#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate (dev tooling only, not
part of the shipped library): runs DuckDB oracle SQL over the testdata
parquet and compares against the Verify.scala parquet dumps.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return round(v, 6)
        if isinstance(v, (list, tuple)) or str(type(v)).endswith("ndarray'>"):
            return tuple(norm(x) for x in v)
        return v

    out = df.map(norm) if hasattr(df, "map") else df.applymap(norm)
    return out.sort_values(by=list(out.columns), ignore_index=True,
                           key=lambda s: s.astype(str))


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            failures.append((name, f"spark output unreadable: {e}"))
            continue
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            failures.append((name, f"oracle failed: {e}"))
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            failures.append((name, f"columns: spark={list(g.columns)} duck={list(w.columns)}"))
            continue
        if len(g) != len(w):
            failures.append((name, f"rowcount: spark={len(g)} duck={len(w)}"))
            continue
        if not g.astype(str).equals(w.astype(str)):
            diff = (g.astype(str) != w.astype(str)).any(axis=1)
            idx = diff[diff].index[:3]
            detail = "; ".join(
                f"row{int(i)}: spark={g.loc[i].to_dict()} duck={w.loc[i].to_dict()}"
                for i in idx)
            failures.append((name, f"values differ ({int(diff.sum())} rows): {detail}"))
            continue
        print(f"  OK {name} ({len(g)} rows)")
    for name, why in failures:
        print(f"FAIL {name}: {why}")
    print(f"{len(oracle) - len(failures)}/{len(oracle)} oracle queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
