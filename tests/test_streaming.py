"""Structured Streaming ingestion: micro-batches → segment appends.

Two parquet files delivered as two micro-batches (maxFilesPerTrigger=1,
availableNow drain) must yield the same index state as batch build+refresh:
every doc searchable, rank-identical to the FTS5 oracle, one segment per
batch after the seed build. Batches arrive in FILE order, not warc_ts order —
covered by refresh's use_watermark=False mode.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from conftest import N_DOCS, N_SHARDS
from pdfsearch_spark import corpus
from pdfsearch_spark.index_build import build_index
from pdfsearch_spark.search import SearchEngine
from pdfsearch_spark.streaming import stream_refresh

BASE = "/tmp/pdfsearch_spark_stream"


@pytest.fixture(scope="module")
def streamed(spark, corpus_pdf):
    shutil.rmtree(BASE, ignore_errors=True)
    pages = corpus.web_pages_df(spark, N_DOCS, partitions=8)
    ts = sorted(corpus_pdf["warc_ts"])
    c1, c2 = ts[N_DOCS // 3], ts[2 * N_DOCS // 3]

    # seed index from the oldest third
    build_index(
        spark, pages.filter(F.col("warc_ts") <= F.lit(c1)), BASE + "/index",
        n_shards=N_SHARDS,
    )
    # land the NEWEST third first, then the middle third — out of ts order
    pages.filter(F.col("warc_ts") > F.lit(c2)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(BASE + "/incoming/f1")
    pages.filter(
        (F.col("warc_ts") > F.lit(c1)) & (F.col("warc_ts") <= F.lit(c2))
    ).coalesce(1).write.mode("overwrite").parquet(BASE + "/incoming/f2")

    batches = []
    q = stream_refresh(
        spark,
        BASE + "/incoming/*",
        BASE + "/index",
        checkpoint_dir=BASE + "/ckpt",
        available_now=True,
        max_files_per_trigger=1,
        on_batch=lambda epoch, m: batches.append(m),
    )
    q.awaitTermination(300)
    return batches


def test_stream_appended_all_docs(spark, streamed):
    st = spark.read.parquet(BASE + "/index/stats").collect()[0]
    assert st["n_docs"] == N_DOCS
    appended = sum(b["appended_docs"] for b in streamed)
    assert appended == N_DOCS - spark.read.parquet(
        BASE + "/index/documents"
    ).filter(F.col("segment") == 0).count()
    assert st["n_segments"] >= 3  # seed + one per non-empty micro-batch


def test_stream_rank_identical(spark, oracle, streamed):
    eng = SearchEngine(spark, BASE + "/index")
    for q in ["hypertension", "renal failure", '"renal failure"', "data*"]:
        o = sorted((r.doc_id, r.score) for r in oracle.search(q, k=50))
        rows = eng.search(q, k=50, with_snippets=False).select("doc_id", "score").collect()
        e = sorted((r["doc_id"], r["score"]) for r in rows)
        assert len(o) == len(e), f"q={q!r}: {len(o)} vs {len(e)}"
        for (od, osc), (ed, esc) in zip(o, e):
            assert od == ed and abs(osc - esc) < 1e-9, f"q={q!r}"


def test_stream_restart_is_noop(spark, streamed):
    """Re-starting the drained stream delivers no new batches → no segments."""
    before = spark.read.parquet(BASE + "/index/stats").collect()[0]["n_segments"]
    q = stream_refresh(
        spark,
        BASE + "/incoming/*",
        BASE + "/index",
        checkpoint_dir=BASE + "/ckpt",
        available_now=True,
    )
    q.awaitTermination(120)
    after = spark.read.parquet(BASE + "/index/stats").collect()[0]["n_segments"]
    assert after == before


# ---------------------------------------------------- stateful dedup stream

DEDUP_BASE = "/tmp/pdfsearch_spark_stream_dedup"


def _pages_rows(spec):
    """spec: list of (url, ts_offset_sec, text)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    return [
        (url, t0 + dt.timedelta(seconds=off), text.encode(), text, "en")
        for url, off, text in spec
    ]


def _write_batch(spark, path, spec):
    spark.createDataFrame(
        _pages_rows(spec),
        schema="url string, warc_ts timestamp, html binary, text string, lang string",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def _run_dedup_stream(spark):
    from pdfsearch_spark.streaming import stream_exact_dedup

    q = stream_exact_dedup(
        spark,
        DEDUP_BASE + "/incoming/*",
        DEDUP_BASE + "/out",
        checkpoint_dir=DEDUP_BASE + "/ckpt",
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)


def test_stream_exact_dedup_within_and_across_batches(spark):
    """T1 duplicated inside batch 1 (canonical = min url) and again in batch
    2 (dropped via state); T2/T3 each kept once."""
    shutil.rmtree(DEDUP_BASE, ignore_errors=True)
    _write_batch(
        spark,
        DEDUP_BASE + "/incoming/f1",
        [("u/b", 1, "body one"), ("u/a", 2, "body one"), ("u/c", 3, "body two")],
    )
    _write_batch(
        spark,
        DEDUP_BASE + "/incoming/f2",
        [("u/d", 4, "body one"), ("u/e", 5, "body three")],
    )
    _run_dedup_stream(spark)
    out = {
        r["url"]: r["text"]
        for r in spark.read.parquet(DEDUP_BASE + "/out").collect()
    }
    assert out == {"u/a": "body one", "u/c": "body two", "u/e": "body three"}


def test_stream_exact_dedup_state_survives_restart(spark):
    """A later run over the same checkpoint still drops bodies emitted by the
    earlier run (state store persistence), keeps genuinely new ones."""
    _write_batch(
        spark,
        DEDUP_BASE + "/incoming/f3",
        [("u/f", 6, "body two"), ("u/g", 7, "body four")],
    )
    _run_dedup_stream(spark)
    out = sorted(
        (r["url"], r["text"])
        for r in spark.read.parquet(DEDUP_BASE + "/out").collect()
    )
    assert out == [
        ("u/a", "body one"),
        ("u/c", "body two"),
        ("u/e", "body three"),
        ("u/g", "body four"),
    ]
