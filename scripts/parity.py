#!/usr/bin/env python3
"""Dev-side replica of the driver's correctness gate.

Usage: python3 scripts/parity.py <sfDir> <verifyOutDir>

Loads each <name>.parquet produced by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB over the same sf tables, and
compares (column names sorted, rows sorted, values stringified).
Not part of the engine — pure pre-flight tooling.
"""
import json
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df):
    df = df[sorted(df.columns)]
    df = df.astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    fails = 0
    for name, sql in sorted(oracle.items()):
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"FAIL {name}: no spark output")
            fails += 1
            continue
        spark_df = pq.read_table(str(res_dir)).to_pandas()
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            fails += 1
            continue
        s, d = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(d.columns)}")
            fails += 1
        elif len(s) != len(d):
            print(f"FAIL {name}: rows {len(s)} vs {len(d)}")
            fails += 1
        elif not s.equals(d):
            neq = (s != d).any(axis=1)
            print(f"FAIL {name}: {neq.sum()} differing rows, first:")
            print("  spark:", s[neq].head(2).to_dict("records"))
            print("  duck :", d[neq].head(2).to_dict("records"))
            fails += 1
        else:
            print(f"OK   {name}: {len(s)} rows")
    print(f"{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
