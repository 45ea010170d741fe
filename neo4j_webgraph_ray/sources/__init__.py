from neo4j_webgraph_ray.sources.transcripts import (  # noqa: F401
    TRANSCRIPTS_FROM_EVENTS_SQL,
    generate_synthetic_transcripts,
    read_transcripts,
    transcripts_from_events,
)
