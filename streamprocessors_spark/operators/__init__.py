"""Batch demux pipeline operators (DataFrame -> DataFrame functions)."""

from streamprocessors_spark.operators.demux import (  # noqa: F401
    cc_violations,
    pat_programs,
    pid_packet_stats,
    pmt_streams,
    programs_summary,
    reassemble_sections,
    sdt_services,
)
