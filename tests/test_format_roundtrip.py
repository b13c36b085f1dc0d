"""CSV/JSONL interchange fidelity pins for source_format_roundtrip.

The r8 ADVICE finding: a CSV read with default multiLine=false mis-parses
a quoted text cell containing an embedded newline (the writer quotes it
correctly, the reader splits it into two broken records). The production
function now reads with multiLine=true and RFC-4180 quote-doubling; this
test pins that exact option set against a hostile corpus (newlines,
quotes, commas, backslashes) and also pins that the roundtrip query
cleans up its scratch directory.
"""

import glob
import os

import pytest


HOSTILE = [
    (1, 'plain text', "en", 10),
    (2, 'embedded\nnewline row', "en", 20),
    (3, 'quote " and comma, and \\ backslash', "fr", 33),
    (4, '"fully quoted"\r\nwith CRLF', "de", 25),
    (5, '', "en", 0),
]


def test_csv_roundtrip_survives_embedded_newlines(spark, tmp_path):
    df = spark.createDataFrame(
        HOSTILE, "doc_id bigint, text string, lang string, n_chars bigint"
    )
    out = str(tmp_path / "csv")
    (
        df.write.mode("overwrite")
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .csv(out)
    )
    back = (
        spark.read.schema(
            "doc_id bigint, text string, lang string, n_chars bigint"
        )
        .option("header", True)
        .option("multiLine", True)
        .option("quote", '"')
        .option("escape", '"')
        .csv(out)
    )
    got = {r.doc_id: (r.text, r.lang, r.n_chars) for r in back.collect()}
    want = {i: (t if t else None, g, n) for i, t, g, n in HOSTILE}
    assert got == want


def test_roundtrip_query_cleans_scratch_dir(spark):
    from streamprocessors_spark.plans.relational import (
        source_format_roundtrip,
    )

    before = set(glob.glob("/tmp/spgraft_fmt_*"))
    df = source_format_roundtrip(spark, "/root/testdata/sf0.001")
    rows = {r.fmt: (r.n_rows, r.id_sum, r.nchar_sum, r.text_sum)
            for r in df.collect()}
    after = set(glob.glob("/tmp/spgraft_fmt_*"))
    assert after - before == set(), "scratch dir leaked"
    # all three formats must agree on every checksum
    assert rows["csv"] == rows["parquet"] == rows["jsonl"]
