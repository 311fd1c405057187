"""Ingest connectors beyond the parquet corpus table.

The reference walks a directory of PDFs (search/walk.go); our corpus is a
table, but a web-scale ingest also has to eat the formats crawls actually
arrive in: JSONL dumps (one doc per line, schema drift and corrupt lines
included), WARC archives (ISO 28500 — the Common Crawl container), and
WET (the extracted-plain-text WARC variant a text corpus starts from).
"""

from pdfsearch_spark.sources.delimited import read_docs_delimited
from pdfsearch_spark.sources.jsonl import DOCS_SCHEMA, read_docs_jsonl
from pdfsearch_spark.sources.warc import read_warc, warc_bytes
from pdfsearch_spark.sources.wet import read_wet, wet_bytes

__all__ = [
    "DOCS_SCHEMA",
    "read_docs_delimited",
    "read_docs_jsonl",
    "read_warc",
    "read_wet",
    "warc_bytes",
    "wet_bytes",
]
