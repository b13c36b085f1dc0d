"""Targeted oracle compare for a subset of queries (r12 optimization loop).

Usage: python tools/compare_some.py <sf_dir> <query> [query...]
Runs each named query under a vanilla local[8] session (the driver shape)
and compares against its DuckDB oracle. Exit 1 on any failure.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("compare-some")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    import __spark_entry__ as e
    from tools.compare import compare_query, duckdb_conn

    qs, osql = e.queries(), e.oracle_sql()
    con = duckdb_conn(sf_dir)
    bad = 0
    for name in names:
        t0 = time.time()
        try:
            df = qs[name](spark, sf_dir)
            if name not in osql:
                print("ROWS-ONLY", name, df.count())
                continue
            r = compare_query(name, df, con, osql[name])
            if not r.ok:
                bad += 1
            print(
                "OK " if r.ok else "FAIL",
                name,
                r.spark_rows,
                f"{time.time() - t0:.1f}s",
                r.detail[:160],
            )
        except Exception as ex:  # noqa: BLE001
            bad += 1
            print("ERR", name, str(ex)[:240])
    print("FAILURES:", bad)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
