"""streamprocessors_spark — a PySpark-native analytics/stream-processing engine.

Re-expresses the query and data-processing capabilities of the reference
MPEG-2 TS stream-processing server (rantoniello/StreamProcessors, surveyed
in SURVEY.md) as idiomatic Spark DataFrame / SQL / Structured Streaming
plans, plus the LLM-data-pipeline operator set (dedup, similarity search,
multimodal columns, text analysis) required for 100 TB-scale training-data
work.

Layout:
  codec/      pure-Python MPEG-2 TS / PSI codec (UDF bodies + fixture gen)
  operators/  batch demux pipeline, joins, metrics (DataFrame functions)
  sources/    TS byte-stream readers (batch + streaming)
  functions/  dedup / similarity / text-analysis / multimodal column fns
  plans/      the declared query catalog (name -> Spark fn + DuckDB oracle)
  streaming/  stateful-reassembly and windowed-metrics streaming queries
"""

__version__ = "0.1.0"
