from .windows import (  # noqa: F401
    sessionized_stream,
    sliding_counts_stream,
    tumbling_counts_stream,
    dedup_stream,
)
from .pipeline import start_ingest_stream, EVENTS_SCHEMA  # noqa: F401
