from tsprofiler_spark.streaming.ingest import (
    TRANSCRIPTS_SCHEMA,
    process_microbatch,
    start_rollup_stream,
    stream_transcripts,
)
from tsprofiler_spark.streaming.profile_stream import stream_chunk_states

__all__ = [
    "TRANSCRIPTS_SCHEMA",
    "process_microbatch",
    "start_rollup_stream",
    "stream_transcripts",
    "stream_chunk_states",
]
