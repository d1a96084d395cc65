from tsprofiler_spark.streaming.ingest import (
    TRANSCRIPTS_SCHEMA,
    process_microbatch,
    start_rollup_stream,
    stream_transcripts,
)

__all__ = [
    "TRANSCRIPTS_SCHEMA",
    "process_microbatch",
    "start_rollup_stream",
    "stream_transcripts",
]
