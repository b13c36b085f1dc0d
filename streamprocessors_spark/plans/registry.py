"""Query registry: name -> (Spark plan, DuckDB oracle SQL).

Contract (driver-facing, see __spark_entry__.py):
- the Spark callable takes (spark, sf_dir) and returns a DataFrame;
- the oracle is ANSI SQL DuckDB can run against views named
  region/nation/customer/supplier/part/orders/lineitem/events/documents/
  embeddings over the same parquet files;
- column names must match exactly (the comparison sorts columns by name);
- ``oracle=None`` marks a genuinely non-SQL-expressible operator — the
  driver then records a weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: SparkQueryFn
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[SparkQueryFn], SparkQueryFn]:
    """Decorator registering a declared query."""

    def deco(fn: SparkQueryFn) -> SparkQueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco
