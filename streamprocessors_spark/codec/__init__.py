"""Pure-Python MPEG-2 TS / PSI codec.

These are the UDF bodies and the fixture generator for the Spark-side
pipeline: no Spark imports here. Semantics re-express the reference
decoders (rantoniello/StreamProcessors, mpeg2ts/src/ts_dec.c, psi_dec.c,
psi_table_dec.c — file:line cites in each function) without copying their
implementation; the hot paths are vectorized with numpy for Arrow-batched
Pandas UDFs.
"""

from streamprocessors_spark.codec.crc import crc32_mpeg2  # noqa: F401
from streamprocessors_spark.codec.ts import (  # noqa: F401
    TS_PKT_SIZE,
    TS_SYNC_BYTE,
    encode_ts_packet,
    parse_ts_packet,
    parse_ts_buffer_np,
)
