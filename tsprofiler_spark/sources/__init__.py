from tsprofiler_spark.sources.transcripts import (
    synthesize_transcripts,
    transcripts_from_events,
    TRANSCRIPTS_FROM_EVENTS_SQL,
)
from tsprofiler_spark.sources.tables import load_table

__all__ = [
    "synthesize_transcripts",
    "transcripts_from_events",
    "TRANSCRIPTS_FROM_EVENTS_SQL",
    "load_table",
]
