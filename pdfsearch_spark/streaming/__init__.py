from .dedup import stream_exact_dedup
from .ingest import PAGES_SCHEMA, stream_refresh

__all__ = ["PAGES_SCHEMA", "stream_exact_dedup", "stream_refresh"]
