"""pdfsearch_spark — a PySpark-native full-text inverted-index + BM25 engine.

A from-scratch re-creation of the query and data-processing capabilities of
``abiiranathan/pdfsearch`` (a Go web app that delegates all search to SQLite
FTS5, reference DDL at ``database/database.go:59-66``), re-expressed
Spark-first over a Common-Crawl-style web-page corpus
``(url, warc_ts, html, text, lang)``:

- vectorized Arrow/pandas UDF HTML→text extraction, byte-identical per url to
  the reference extractor semantics (``pdf/pdf.go:226-254``)
- unicode61 + remove_diacritics-2 + Porter tokenization, token-identical to
  the FTS5 tokenizer behind the reference DDL
- salted repartition-by-term shuffle building delta-gap + varint-compressed
  posting lists with per-block max-score metadata, skew-aware head-term splits
- BM25 (k1=1.2, b=0.75, FTS5 idf clamp) top-k with block-max pruning,
  rank-identical to the SQLite FTS5 oracle
- training-data pipeline operators (dedup, similarity search, text analysis,
  multimodal plumbing) for 100 TB-scale corpus preparation
"""

__version__ = "0.1.0"
