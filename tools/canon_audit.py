"""Audit every declared query for driver-canonicalizer hazards.

The driver's comparator pandas-sorts both result sets before hashing, so a
query is only safely comparable when BOTH sides produce flat, hashable,
type-stable columns. Two classes of hazard bit round 1:

1. DuckDB HUGEINT (int128): ``sum(BIGINT)`` returns HUGEINT, which pandas
   coerces through float64 — the canonical string can then differ from
   Spark's int64 even when values are equal (es_timestamp_stats).
2. LIST/STRUCT/MAP outputs: pandas ``sort_values`` factorizes cells and dies
   on unhashable lists (doc_fingerprint_winnow).

This tool runs ``DESCRIBE`` on every oracle (cheap, no execution) and
inspects every Spark plan's schema (lazy, no job) and fails loudly on:
- oracle column types containing HUGEINT/INT128/UHUGEINT/LIST/STRUCT/MAP/UNION
- Spark columns of Array/Map/Struct type

A third hazard class (round 2's q22 driver red row) is VALUE-level, not
type-level: ``floor(sum(<double>))`` / ``round(avg(<double>))`` assume the
inner double aggregate is bit-identical across engines, but double
summation is order-dependent — a last-ulp difference lands on the
quantization boundary and flips a full unit. The audit greps every oracle
for floor/round applied over a raw sum/avg (``cast(round(x)*scale as
bigint)`` per-ROW quantization, functions/money.py, is the safe form and
does not match).

Usage: python tools/canon_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BAD_DUCK = ("HUGEINT", "INT128", "LIST", "STRUCT", "MAP", "UNION", "[]")

# floor(/round( whose first argument starts with sum(/avg( — i.e. the
# quantizer wraps the AGGREGATE (order-dependent) instead of the per-row
# value. Whitespace-insensitive; matches across the oracle's pretty-print.
_FLOAT_AGG_HAZARD = re.compile(
    r"\b(floor|round)\s*\(\s*(sum|avg)\s*\(", re.IGNORECASE
)
# Safe exception: sum(...) of already-integer per-row units, i.e. the inner
# expression is itself cast(round(...) as bigint)/cast(floor(...) as bigint).
_SAFE_INNER = re.compile(
    r"\b(floor|round)\s*\(\s*(sum|avg)\s*\(\s*cast\s*\(\s*(round|floor)\s*\(",
    re.IGNORECASE,
)


def _float_agg_hazards(oracle: str) -> list[str]:
    out = []
    for m in _FLOAT_AGG_HAZARD.finditer(oracle):
        if _SAFE_INNER.match(oracle, m.start()):
            continue
        snippet = " ".join(oracle[m.start() : m.start() + 60].split())
        out.append(snippet)
    return out


# collect_list/collect_set materialize a whole group as ONE row — a skewed
# key becomes a single-task array AQE cannot split (the r3 minhash bucket
# hazard class). Every call site must carry a '# bounded:' comment within
# the 6 preceding lines stating WHY the group is bounded (protocol cap,
# fixed dimensionality, explicit size filter); unannotated sites fail.
_COLLECT_RE = re.compile(r"collect_(list|set)\s*\(")


# A forced F.broadcast() on a data-dependent-sized frame is the r4 hazard
# class (labels/vocab): at 100 TB the frame outgrows the driver/broadcast
# budget and the hint becomes an OOM, where an unhinted join lets AQE
# broadcast only when the runtime size is genuinely small. Every hint must
# carry a '# bounded:' rationale within the 6 preceding lines stating WHY
# the frame size is independent of corpus scale (fixed dim, single-row
# aggregate, k-row centroid table, user-sized probe batch...).
_BROADCAST_RE = re.compile(r"\bF\.broadcast\s*\(")


# A Window.orderBy with no partitionBy moves EVERY row of its input to ONE
# task (WindowExec "No Partition Defined") — fine only when the input is
# structurally bounded (a vocabulary/symbol table, a LIMIT'd top-k, a
# partition-count frame). Every global-window site must say WHY within the
# 6 preceding lines; SF-proportional rationales are rejected by the
# rationale rule like everywhere else (VERDICT r9 #5).
_GLOBAL_WINDOW_RE = re.compile(r"\bWindow\.orderBy\s*\(")


# .collect()/.toPandas() materialize a frame ON THE DRIVER — the operator
# stops being distributed at that point, and an SF-proportional frame
# becomes a driver OOM at 100 TB. Legitimate uses are (a) structurally
# bounded frames (one-row aggregates, per-source maps, k-row tables) and
# (b) control-plane scalars (convergence probes, loop bounds). Every call
# site must say which, via '# bounded:'/'# bounded collect:' or
# '# control-plane' within the 6 preceding lines (VERDICT r10 #7); the
# rationale rule rejects SF-proportional excuses like everywhere else.
_DRIVER_COLLECT_RE = re.compile(r"\.(collect|toPandas)\s*\(\s*\)")

# Exact accepted marker forms (colon-terminated where the rationale
# follows on the same line): a substring like '# boundedness unclear'
# must NOT satisfy the gate.
_BOUNDED_MARKERS = ("# bounded:", "# bounded collect:")
_COLLECT_MARKERS = ("# bounded:", "# bounded collect:", "# control-plane")


def _annotation_hazards(root: str) -> list[str]:
    out = []
    pkg = os.path.join(root, "streamprocessors_spark")
    rules = [
        (_COLLECT_RE, "collect_list/set", "hot-key skew hazard", _BOUNDED_MARKERS),
        (
            _BROADCAST_RE,
            "F.broadcast hint",
            "data-dependent-size hazard",
            _BOUNDED_MARKERS,
        ),
        (
            _GLOBAL_WINDOW_RE,
            "global Window.orderBy (no partitionBy)",
            "single-partition window hazard",
            _BOUNDED_MARKERS,
        ),
        (
            _DRIVER_COLLECT_RE,
            ".collect()/.toPandas() driver materialization",
            "driver-memory hazard",
            _COLLECT_MARKERS,
        ),
    ]
    for dirpath, _dirs, files in os.walk(pkg):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            with open(path) as fh:
                lines = fh.readlines()
            for i, line in enumerate(lines):
                code = line.split("#")[0]
                for rx, what, why, markers in rules:
                    if not rx.search(code):
                        continue
                    window = "".join(lines[max(0, i - 6) : i + 1])
                    if not any(m in window for m in markers):
                        rel = os.path.relpath(path, root)
                        out.append(
                            f"{rel}:{i + 1}: {what} without a"
                            f" {'/'.join(markers)!r} size rationale ({why})"
                        )
    return out


# A '# bounded:' rationale that itself concedes the frame scales with the
# corpus ("SF-proportional", "scales with sf", "at sf0.01", "grows with")
# is not a size bound — it is the hazard restated politely (the r8 q9
# regression: hints were ANNOTATED instead of dropped). Such rationales
# fail the audit outright.
_UNBOUNDED_RATIONALE = re.compile(
    r"sf[- ]proportional|proportional to (the )?(sf|corpus|scale)"
    r"|scales? with (the )?(sf|corpus|data)|grows? with"
    r"|at sf\d", re.IGNORECASE
)


def _rationale_hazards(root: str) -> list[str]:
    out = []
    pkg = os.path.join(root, "streamprocessors_spark")
    for dirpath, _dirs, files in os.walk(pkg):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            with open(path) as fh:
                lines = fh.readlines()
            for i, line in enumerate(lines):
                marker = next(
                    (
                        m
                        for m in (
                            "# bounded collect:",
                            "# bounded:",
                            "# control-plane",
                        )
                        if m in line
                    ),
                    None,
                )
                if marker is None:
                    continue
                # the rationale may wrap over following comment lines
                block = [line.split(marker, 1)[1]]
                j = i + 1
                while j < len(lines) and lines[j].lstrip().startswith("#"):
                    block.append(lines[j].lstrip().lstrip("#"))
                    j += 1
                text = " ".join(block)
                if _UNBOUNDED_RATIONALE.search(text):
                    rel = os.path.relpath(path, root)
                    out.append(
                        f"{rel}:{i + 1}: '# bounded:' rationale concedes the"
                        " frame is corpus/SF-scaling — not a size bound"
                    )
    return out


_unbounded_collects = _annotation_hazards  # back-compat alias


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from pyspark.sql import types as T

    from streamprocessors_spark import plans
    from streamprocessors_spark.session import get_spark
    from tools.compare import duckdb_conn

    plans.load_all()
    spark = get_spark()
    con = duckdb_conn(sf_dir)

    problems: list[str] = []
    for name, q in plans.REGISTRY.items():
        if q.oracle is not None:
            try:
                desc = con.execute(f"DESCRIBE {q.oracle}").fetchall()
            except Exception as e:  # noqa: BLE001
                problems.append(f"{name}: oracle DESCRIBE failed: {e}")
                desc = []
            for col, typ, *_ in desc:
                up = str(typ).upper()
                if any(b in up for b in BAD_DUCK):
                    problems.append(f"{name}: oracle column {col} is {typ}")
            for snip in _float_agg_hazards(q.oracle):
                problems.append(
                    f"{name}: quantizer over float aggregate (order-dependent"
                    f" across engines): {snip!r}"
                )
        try:
            schema = q.fn(spark, sf_dir).schema
        except Exception as e:  # noqa: BLE001
            problems.append(f"{name}: spark plan failed to build: {e}")
            continue
        for f in schema.fields:
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
                problems.append(
                    f"{name}: spark column {f.name} is {f.dataType.simpleString()}"
                )

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    problems.extend(_unbounded_collects(repo_root))
    problems.extend(_rationale_hazards(repo_root))

    for p in problems:
        print("HAZARD:", p)
    print(f"audited {len(plans.REGISTRY)} queries, {len(problems)} hazards")
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
