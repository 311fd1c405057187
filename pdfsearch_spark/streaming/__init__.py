from .dedup import stream_exact_dedup
from .ingest import PAGES_SCHEMA, stream_refresh
from .stats import (
    session_stats,
    stream_ingest_stats,
    stream_session_stats,
    windowed_ingest_stats,
)

__all__ = [
    "PAGES_SCHEMA",
    "stream_exact_dedup",
    "stream_ingest_stats",
    "stream_refresh",
    "windowed_ingest_stats",
    "session_stats",
    "stream_session_stats",
]
