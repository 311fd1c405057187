from .ingest import PAGES_SCHEMA, stream_refresh

__all__ = ["PAGES_SCHEMA", "stream_refresh"]
