#!/usr/bin/env python
"""Self-check harness mimicking the driver's CORRECTNESS gate: run every
__spark_entry__.queries() entry and its oracle_sql() in DuckDB on the same
parquet tables, compare row count + schema-sorted values.

Usage: python scripts/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6).fillna(-9.999925e12)
        elif str(df[c].dtype) == "bool":
            df[c] = df[c].astype(int)
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from blink_reloaded_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR {type(e).__name__}: {e}"))
            print(f"FAIL  {name}: spark error {e}")
            continue
        sql = os_.get(name)
        if sql is None:
            print(f"skip  {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            ddf = con.sql(sql).df()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR {type(e).__name__}: {e}"))
            print(f"FAIL  {name}: duckdb error {e}")
            continue
        a, b = normalize(sdf), normalize(ddf)
        # dtype-strict gate: the driver's value hash is type-sensitive (the
        # round-1 q12 HUGEINT-vs-BIGINT miss passed the value compare but
        # failed the driver), so raw dtypes must match BEFORE normalization
        raw_sd = [str(sdf[c].dtype) for c in sorted(sdf.columns)]
        raw_dd = [str(ddf[c].dtype) for c in sorted(ddf.columns)]
        status = "ok"
        if list(a.columns) != list(b.columns):
            status = f"SCHEMA mismatch: {list(a.columns)} vs {list(b.columns)}"
        elif raw_sd != raw_dd:
            status = f"DTYPE mismatch: spark={raw_sd} vs duck={raw_dd}"
        elif len(a) != len(b):
            status = f"ROWS mismatch: {len(a)} vs {len(b)}"
        else:
            neq = (a.values != b.values)
            if neq.any():
                i = int(neq.any(axis=1).argmax())
                status = (
                    f"VALUES mismatch ({int(neq.any(axis=1).sum())} rows), first at"
                    f" {i}:\n  spark={a.iloc[i].to_dict()}\n  duck ={b.iloc[i].to_dict()}"
                )
        ok = status == "ok"
        if not ok:
            failures.append((name, status))
        print(f"{'ok   ' if ok else 'FAIL '} {name}: {len(a)} rows, "
              f"{time.time()-t0:.1f}s{'' if ok else ' — ' + status}")
    print(f"\n{len(failures)} failures / {len(qs)} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
