"""Round-13: same-session A/B of streaming shuffle-partition policies.

For each named query, times warm min-of-3 under (a) the adaptive default
and (b) SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS=<n> forced, interleaved
A/B/A/B so host drift hits both arms equally.

Usage: python tools/stream_ab.py <forced_n> <query> [query...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    forced = sys.argv[1]
    names = sys.argv[2:]

    from streamprocessors_spark import plans
    from streamprocessors_spark.session import get_spark

    plans.load_all()
    spark = get_spark(
        app_name="stream-ab",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.range(1_000_000).selectExpr("sum(id*2)").collect()

    for name in names:
        q = plans.REGISTRY[name]
        q.fn(spark, SF_DIR).count()  # session warm-up for this query
        a, b = [], []
        for _ in range(3):
            os.environ.pop("SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS", None)
            t0 = time.perf_counter()
            q.fn(spark, SF_DIR).count()
            a.append(time.perf_counter() - t0)
            os.environ["SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS"] = forced
            t0 = time.perf_counter()
            q.fn(spark, SF_DIR).count()
            b.append(time.perf_counter() - t0)
        os.environ.pop("SPARK_GRAFT_STREAM_SHUFFLE_PARTITIONS", None)
        print(
            f"{name}: adaptive={min(a):.3f} forced{forced}={min(b):.3f}"
            f"  (all a={[round(x,2) for x in a]} b={[round(x,2) for x in b]})"
        )
    spark.stop()


if __name__ == "__main__":
    main()
