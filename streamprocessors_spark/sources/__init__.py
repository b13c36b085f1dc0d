"""TS byte-stream sources (batch; streaming variants in streaming/)."""

from streamprocessors_spark.sources.ts_source import (  # noqa: F401
    packets_from_binary_column,
    read_ts_files,
)
