"""Unit tests for the canon_audit static rules (no Spark/DuckDB needed).

Pins the r8→r9 tightening: a ``# bounded:`` rationale that concedes the
frame scales with the corpus ("SF-proportional", "grows with the data")
must FAIL the audit — annotating a scale-hazardous broadcast hint is not
a size bound (the q9 regression class).
"""

import os
import tempfile

from tools.canon_audit import (
    _annotation_hazards,
    _rationale_hazards,
)


def _repo_with(source: str):
    """Create a throwaway repo-shaped dir with one package file."""
    root = tempfile.mkdtemp()
    pkg = os.path.join(root, "streamprocessors_spark")
    os.makedirs(pkg)
    with open(os.path.join(pkg, "mod.py"), "w") as fh:
        fh.write(source)
    return root


def test_unannotated_broadcast_fails():
    root = _repo_with("x = F.broadcast(df)\n")
    probs = _annotation_hazards(root)
    assert len(probs) == 1 and "F.broadcast" in probs[0]


def test_bounded_annotation_passes():
    root = _repo_with(
        "# bounded: nation is a fixed 25-row table at every SF\n"
        "x = F.broadcast(nation)\n"
    )
    assert _annotation_hazards(root) == []
    assert _rationale_hazards(root) == []


def test_sf_proportional_rationale_fails():
    # the exact r8 q9 pattern: hint annotated, rationale concedes scaling
    root = _repo_with(
        "# bounded: part/supplier/nation are SF-proportional dims far\n"
        "# below the fact table (2k/100/25 rows at sf0.01)\n"
        "x = F.broadcast(part)\n"
    )
    probs = _rationale_hazards(root)
    assert probs and "not a size bound" in probs[0]


def test_grows_with_rationale_fails():
    root = _repo_with(
        "# bounded: vocab grows with the corpus but slowly\n"
        "y = F.broadcast(vocab)\n"
    )
    assert _rationale_hazards(root)


def test_multiline_rationale_scanned():
    # the conceding phrase on a continuation comment line still fails
    root = _repo_with(
        "# bounded: small in practice;\n"
        "# strictly speaking it scales with the corpus though\n"
        "z = F.broadcast(frame)\n"
    )
    assert _rationale_hazards(root)


def test_q9_source_carries_no_scaling_hints():
    """The shipped q9 must hint only the fixed 25-row nation dim."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(
        here, "streamprocessors_spark", "plans", "tpch_decision.py"
    )
    src = open(path).read()
    q9 = src.split("def q9_product_profit", 1)[1].split("\ndef ", 1)[0]
    assert q9.count("F.broadcast") == 1
    assert "nation" in q9.split("F.broadcast", 1)[1][:60]


def test_unannotated_global_window_fails():
    # r9 #5: Window.orderBy with no partitionBy = single-partition window
    root = _repo_with(
        "w = Window.orderBy(F.col('freq').desc(), 'sym')\n"
    )
    probs = _annotation_hazards(root)
    assert len(probs) == 1 and "global Window.orderBy" in probs[0]


def test_annotated_global_window_passes():
    root = _repo_with(
        "# bounded: the symbol table is vocabulary-sized, << corpus\n"
        "w = Window.orderBy(F.col('freq').desc(), 'sym')\n"
    )
    assert _annotation_hazards(root) == []


def test_partitioned_window_never_flagged():
    root = _repo_with(
        "w = Window.partitionBy('doc_id').orderBy('wp')\n"
    )
    assert _annotation_hazards(root) == []


def test_shipped_tree_passes_global_window_rule():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    assert [p for p in _annotation_hazards(here) if "Window" in p] == []


def test_unannotated_driver_collect_fails():
    root = _repo_with("rows = df.groupBy('k').count().collect()\n")
    probs = _annotation_hazards(root)
    assert len(probs) == 1 and ".collect()/.toPandas()" in probs[0]


def test_unannotated_topandas_fails():
    root = _repo_with("pdf = df.toPandas()\n")
    probs = _annotation_hazards(root)
    assert len(probs) == 1 and ".collect()/.toPandas()" in probs[0]


def test_control_plane_collect_passes():
    root = _repo_with(
        "total = labels.agg(F.sum('x')).collect()[0][0]"
        "  # control-plane scalar\n"
    )
    assert _annotation_hazards(root) == []


def test_bounded_collect_passes_and_rationale_scanned():
    root = _repo_with(
        "# bounded collect: one row per source\n"
        "rows = b.groupBy('source').count().collect()\n"
    )
    assert _annotation_hazards(root) == []
    assert _rationale_hazards(root) == []


def test_sf_proportional_collect_rationale_fails():
    root = _repo_with(
        "# bounded: the frame scales with the corpus (small at sf0.01)\n"
        "rows = df.collect()\n"
    )
    assert _annotation_hazards(root) == []  # annotated, so rule 1 passes
    assert _rationale_hazards(root)  # ...but the rationale is rejected


def test_collect_list_not_confused_with_driver_collect():
    # collect_list( has its own rule; the driver rule must not double-flag
    root = _repo_with(
        "# bounded: protocol caps group size at 16\n"
        "x = df.agg(F.collect_list('v'))\n"
    )
    assert _annotation_hazards(root) == []
