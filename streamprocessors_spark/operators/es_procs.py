"""Per-ES processor registry (SURVEY U1/U2): pluggable stream transforms.

The reference's extensibility surface is the ``proc_if_t`` vtable —
processors registered by name and instantiated per ES PID
(PROCS_REGISTER_TYPE, mpeg2_sp.c:450-454; the only in-tree 'codec' is the
identity ``proc_if_bypass``, app_prog_proc.c:236-239, and the dashboard
knows two subtitle processors: ``dvb_subt`` and ``scte_subt2dvb``,
assets/html/js/es_proc.js:740-745).

Spark-first restatement: a registry mapping ``stream_type`` -> a DataFrame
transform. Dispatch is data-driven (one plan handles every type — PIDs and
stream types are columns, not topology), and each transform is a pure
column expression: the subtitle bodies are the real settings surface
(PES PTS restamping per ISO 13818-1 §2.4.3.7, DVB subtitling-segment
duration/position patching per EN 300 743 — see codec/pes.py) applied to
the fixed-layout packets this engine generates and parses byte-exactly.

Scale: dispatch = one CASE projection, no shuffle, no Python.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

# stream_type constants (ISO 13818-1 table 2-29 subset + DVB private)
ST_H264 = 0x1B
ST_AAC = 0x0F
ST_PRIVATE_PES = 0x06  # DVB subtitles/teletext travel as private PES

EsTransform = Callable[[Column], Column]

_REGISTRY: dict[str, EsTransform] = {}

# Registry-default settings (the per-instance values live in the config
# table, S5; defaults mirror the dashboard's "no offset" initial state).
from streamprocessors_spark.codec.pes import (  # noqa: E402
    DvbSubtSettings,
    ScteSubt2DvbSettings,
)

DVB_SUBT_DEFAULTS = DvbSubtSettings()
SCTE2DVB_DEFAULTS = ScteSubt2DvbSettings()


def _parse_settings_doc(doc: str) -> dict[str, str]:
    """P9 dual-format settings doc -> flat dict (same leading-brace format
    guess as the reference, mpeg2_sp.c:716). ES-processor settings are
    per-processor scalars that parametrize the plan, so this parse is
    driver-side by design (not a row operation)."""
    import json
    from urllib.parse import parse_qsl

    doc = doc.strip()
    if doc.startswith("{"):
        return {k: str(v) for k, v in json.loads(doc).items()}
    return dict(parse_qsl(doc, keep_blank_values=True))


def dvb_subt_settings_from_doc(doc: str) -> DvbSubtSettings:
    """Build the dvb_subt settings (es_proc.js:87-93 + dvb_subt.js service
    settings) from a stored config doc; unknown keys ignored, missing keys
    keep dataclass defaults."""
    vals = _parse_settings_doc(doc)
    kw = {}
    for field in (
        "time_shift_offset_msec",
        "duration_min_seg",
        "duration_max_seg",
        "duration_offset_seg",
        "vpos_offset_pels",
        "hpos_offset_pels",
        "ts_pcr_guard_msec",
    ):
        if field in vals and vals[field] != "":
            kw[field] = int(vals[field])
    if "restamping" in vals and vals["restamping"] != "":
        kw["restamping"] = vals["restamping"].lower() in ("1", "true", "yes")
    return DvbSubtSettings(**kw)


def scte_subt2dvb_settings_from_doc(doc: str) -> ScteSubt2DvbSettings:
    """scte_subt2dvb settings (scte_subt2dvb.js:371-374) from a config doc."""
    vals = _parse_settings_doc(doc)
    kw = {}
    for field in ("duration_offset_msec", "vpos_offset_pels"):
        if field in vals and vals[field] != "":
            kw[field] = int(vals[field])
    return ScteSubt2DvbSettings(**kw)


def register_es_proc(name: str) -> Callable[[EsTransform], EsTransform]:
    def deco(fn: EsTransform) -> EsTransform:
        _REGISTRY[name] = fn
        return fn

    return deco


def es_proc(name: str) -> EsTransform:
    return _REGISTRY[name]


def registered_procs() -> list[str]:
    return sorted(_REGISTRY)


# Every transform emits the same struct so the CASE dispatch unifies types:
# out_payload = the (possibly re-encoded) ES bytes, text = decoded text for
# text-bearing streams (NULL otherwise).


def _result(out_payload: Column, text: Column) -> Column:
    return F.struct(out_payload.alias("out_payload"), text.alias("text"))


@register_es_proc("bypass")
def bypass(payload: Column) -> Column:
    """proc_if_bypass: identity (app_prog_proc.c:236-239)."""
    return _result(payload, F.lit(None).cast("string"))


@register_es_proc("dvb_subt")
def dvb_subt(payload: Column) -> Column:
    """DVB-subtitle editor (es_proc.js:87-93, dvb_subt.js:667-767): parse
    the PES PTS and the page composition segment, apply the configured
    time-shift / duration-clamp / position offsets, re-encode. The
    registry body runs the module-default settings; parametrized use goes
    through ``codec.pes.dvb_subt_patch_expr`` directly. ``text`` surfaces
    the decoded page summary the dashboard renders."""
    from streamprocessors_spark.codec.pes import dvb_subt_patch_expr

    r = dvb_subt_patch_expr(payload, DVB_SUBT_DEFAULTS)
    summary = F.format_string(
        "pts=%d to=%d pos=%dx%d",
        r["pts_out"],
        r["timeout_out"],
        r["hpos_out"],
        r["vpos_out"],
    )
    return _result(r["out_payload"], summary)


@register_es_proc("scte_subt2dvb")
def scte_subt2dvb(payload: Column) -> Column:
    """SCTE-27 -> DVB subtitle transcoder (scte_subt2dvb.js:371-374):
    display duration in frames -> DVB page_time_out seconds, position
    shifted by vpos_offset_pels, PTS carried over; emits a spec-shaped
    DVB PES (codec/pes.py)."""
    from streamprocessors_spark.codec.pes import scte_subt2dvb_expr

    r = scte_subt2dvb_expr(payload, SCTE2DVB_DEFAULTS)
    return _result(r["out_payload"], F.lit(None).cast("string"))


# default stream_type -> processor wiring (the reference registers bypass
# for every ES PID; subtitle PIDs go to the subtitle processors)
DEFAULT_WIRING: dict[int, str] = {
    ST_H264: "bypass",
    ST_AAC: "bypass",
    ST_PRIVATE_PES: "dvb_subt",
}


def dispatch_expr(
    stream_type: Column, payload: Column, wiring: dict[int, str] | None = None
) -> Column:
    """One CASE projection routing each row through its type's transform —
    the whole 'dynamic processor instantiation' surface (J12/U1) collapses
    to this expression; keys are data, not topology."""
    wiring = DEFAULT_WIRING if wiring is None else wiring
    expr = None
    for st, name in sorted(wiring.items()):
        out = es_proc(name)(payload)
        expr = (
            F.when(stream_type == st, out)
            if expr is None
            else expr.when(stream_type == st, out)
        )
    return expr.otherwise(bypass(payload))
