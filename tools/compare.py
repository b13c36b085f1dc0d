"""Local replica of the driver's Spark-vs-DuckDB correctness comparison.

For each declared query the driver runs the Spark plan and the DuckDB oracle
over the same parquet fixtures and compares row count, schema (column names,
sorted) and an order-insensitive value hash. This module reproduces that
check locally so every operator can be validated before the round ends.
"""

from __future__ import annotations

import hashlib
import math
import os
from dataclasses import dataclass

import duckdb

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_conn(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _norm_cell(v: object) -> str:
    """Normalize a cell to a hashable canonical string (both engines)."""
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            # Type normalization only (Spark floor() yields BIGINT where
            # DuckDB yields DOUBLE) — not a precision concession.
            return str(int(v))
        # Full precision: repr() is the shortest round-tripping string, so
        # different doubles ALWAYS canonicalize differently. The round-2
        # `%.6g` form collapsed 107357.17 and 107357.16 to "107357" and
        # masked the q22 driver failure — the local comparator must never
        # be laxer than the driver.
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_norm_cell(x)}" for k, x in sorted(v.items())) + "}"
    return str(v)


def value_hash(rows: list[tuple], columns: list[str]) -> str:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "\x1f".join(_norm_cell(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    schema_match: bool
    hash_match: bool
    detail: str = ""


def compare_query(name, spark_df, con, oracle: str) -> CompareResult:
    sp_rows = [tuple(r) for r in spark_df.collect()]
    sp_cols = spark_df.columns
    res = con.execute(oracle)
    du_cols = [d[0] for d in res.description]
    du_rows = res.fetchall()

    schema_match = sorted(sp_cols) == sorted(du_cols)
    sh = value_hash(sp_rows, sp_cols)
    dh = value_hash(du_rows, du_cols)
    hash_match = sh == dh
    ok = schema_match and hash_match and len(sp_rows) == len(du_rows)
    detail = ""
    if not schema_match:
        detail = f"schema: spark={sorted(sp_cols)} duckdb={sorted(du_cols)}"
    elif not hash_match:
        # Show a few differing rows for debugging.
        order_s = sorted(range(len(sp_cols)), key=lambda i: sp_cols[i])
        order_d = sorted(range(len(du_cols)), key=lambda i: du_cols[i])
        s_set = {
            "\x1f".join(_norm_cell(r[i]) for i in order_s) for r in sp_rows
        }
        d_set = {
            "\x1f".join(_norm_cell(r[i]) for i in order_d) for r in du_rows
        }
        only_s = list(s_set - d_set)[:3]
        only_d = list(d_set - s_set)[:3]
        detail = f"spark-only={only_s} duckdb-only={only_d}"
    return CompareResult(
        name=name,
        ok=ok,
        spark_rows=len(sp_rows),
        oracle_rows=len(du_rows),
        schema_match=schema_match,
        hash_match=hash_match,
        detail=detail,
    )
