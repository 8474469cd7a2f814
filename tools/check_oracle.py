#!/usr/bin/env python3
"""DEV-ONLY differential checker (mirrors the driver's t2 gate).

Not part of the engine: the Scala library never uses Python. This
script replays the driver's comparison locally so correctness problems
surface before a round ends:
  1. run `graft.Verify <sfDir> <outDir>` (caller does this via sbt),
  2. for each query: load the Spark parquet result, run the oracle SQL
     in DuckDB over views of the same testdata parquet,
  3. compare schema (column names sorted), row counts, and values.

Usage: python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json, math, os, sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.reset_index(drop=True)


def values_equal(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None or (isinstance(a, float) and math.isnan(a)):
            return (a is None or math.isnan(a)) and (b is None or math.isnan(b))
        return a == b  # exact: engine is designed for bit-identical output
    return a == b


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if "--present-only" in sys.argv:  # subset Verify runs: skip undumped
        oracle = {n: s for n, s in oracle.items()
                  if os.path.exists(f"{out_dir}/{n}")}
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = norm(pd.read_parquet(f"{out_dir}/{name}"))
            duck_df = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: load/exec error: {e}")
            failures += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} != {list(duck_df.columns)}")
            failures += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} != {len(duck_df)}")
            failures += 1
            continue
        bad = 0
        for col in spark_df.columns:
            sa, da = spark_df[col].tolist(), duck_df[col].tolist()
            for i, (x, y) in enumerate(zip(sa, da)):
                if not values_equal(x, y):
                    if bad == 0:
                        print(f"FAIL {name}: col {col} row {i}: spark={x!r} duck={y!r}")
                    bad += 1
        if bad:
            print(f"FAIL {name}: {bad} mismatched cells")
            failures += 1
        else:
            print(f"OK   {name}: {len(spark_df)} rows")
    # queries without an oracle: rows-only existence check
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if os.path.isdir(p) and d not in oracle:
            n = len(pd.read_parquet(p))
            print(f"ROWS {d}: {n} rows (no oracle)")
    return failures


if __name__ == "__main__":
    paths = [a for a in sys.argv[1:] if not a.startswith("--")]
    sys.exit(main(paths[0], paths[1]))
