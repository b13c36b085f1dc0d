"""Full oracle sweep at an arbitrary scale factor (default sf0.1).

The driver's correctness gate runs at sf0.01; some cross-engine hazards
only materialize at larger data volumes (round 2 example: DuckDB `/` on
integers yields DOUBLE and CAST rounds half-up vs Spark floor() — the
fractions only crossed 0.5 once per-source token counts exceeded half a
bin). This sweep runs every declared query against its oracle at a bigger
SF to flush out scale-dependent divergence.

Usage: python tools/sweep_sf.py [sf_dir]   (~13 min at sf0.1 on local[24])
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[24]")
        .appName("sweep-sf")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "24")
        .getOrCreate()
    )
    import __spark_entry__ as e
    from tools.compare import compare_query, duckdb_conn

    qs, osql = e.queries(), e.oracle_sql()
    con = duckdb_conn(sf_dir)
    bad = 0
    t0 = time.time()
    for name in sorted(qs):
        try:
            df = qs[name](spark, sf_dir)
            if name not in osql:
                continue
            r = compare_query(name, df, con, osql[name])
            if not r.ok:
                bad += 1
                print("FAIL", name, r.spark_rows, r.oracle_rows, r.detail[:160])
        except Exception as ex:  # noqa: BLE001
            bad += 1
            print("ERR", name, str(ex)[:200])
    print(f"TOTAL {len(qs)} FAILURES: {bad} elapsed {round(time.time() - t0)}s")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
