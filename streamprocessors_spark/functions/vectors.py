"""Embedding similarity fragments: cosine, sign-LSH buckets.

Similarity search over an ``array<float>`` column (BASELINE north-star):
- brute-force top-k: broadcast the (small) query set against the full
  vector table, rank by cosine — the exact baseline;
- sign-LSH buckets: the scale path. Bucket id = sign bits of the first
  ``LSH_SIGN_DIMS`` coordinates (a fixed axis-aligned random-hyperplane
  family — deterministic, so the DuckDB oracle can mirror it). At 100 TB
  the bucket column becomes the shuffle/cluster key: candidates co-locate
  and the quadratic rank runs per-bucket instead of globally.

Cosine itself lives in dialect.cosine (double-precision, order-stable,
parity-verified).
"""

from __future__ import annotations

from streamprocessors_spark.functions import dialect as D

LSH_SIGN_DIMS = 8  # 2^8 = 256 buckets


def sign_bucket(d: str, vec: str) -> str:
    """Bucket id in [0, 2^LSH_SIGN_DIMS) from coordinate sign bits."""
    coord = D.element(d, vec, "j + 1")
    term = f"case when {coord} >= 0 then {D.shiftleft1(d, 'j')} else 0 end"
    return D.agg_sum_bigint(d, D.seq0(d, str(LSH_SIGN_DIMS)), "j", term)
