"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet tables, then compares row count, column
names and an order-insensitive value multiset.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import Counter

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(v).lower()
    if v is None:
        return ""
    return str(v)


def df_multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = Counter()
    for row in rows:
        out["\x1f".join(norm_cell(row[i]) for i in order)] += 1
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName("oracle-check").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            cols = sdf.columns
            rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        spark_t = time.time() - t0
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(rows)} rows "
                  f"({spark_t:.1f}s) cols={cols}")
            if len(rows) == 0:
                print(f"  WARNING {name}: zero rows")
            continue
        try:
            rel = con.sql(oracles[name])
            orows = rel.fetchall()
            ocols = [d[0] for d in rel.description]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        ok = True
        if sorted(cols) != sorted(ocols):
            print(f"FAIL {name}: columns {sorted(cols)} != {sorted(ocols)}")
            ok = False
        elif len(rows) != len(orows):
            print(f"FAIL {name}: rows {len(rows)} != {len(orows)}")
            ok = False
        else:
            ms, mo = df_multiset(rows, cols), df_multiset(orows, ocols)
            if ms != mo:
                diff = (ms - mo) + (mo - ms)
                sample = list(diff.items())[:3]
                print(f"FAIL {name}: value mismatch; e.g. {sample}")
                ok = False
        if ok:
            print(f"PASS {name}: {len(rows)} rows ({spark_t:.1f}s)")
        else:
            failures += 1
    print(f"== failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
