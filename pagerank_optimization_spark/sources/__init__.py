from pagerank_optimization_spark.sources.transcripts import (  # noqa: F401
    TRANSCRIPT_SCHEMA,
    synthesize_transcripts,
    transcripts_from_events,
    transcripts_from_events_sql,
)
