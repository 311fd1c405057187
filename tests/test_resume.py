"""Resumable build (SURVEY.md §5.3-6): build a shard subset, resume, and the
final index must equal a single-shot build — per-shard manifest drives the
skip (north_rule checkpoint clause)."""

from __future__ import annotations

import os
import shutil

import pandas as pd
from pyspark.sql import functions as F

from pdfsearch_spark import corpus
from pdfsearch_spark.index_build import build_index, resume_build

N = 120
SHARDS = 4


def _postings_fingerprint(spark, d):
    df = spark.read.parquet(os.path.join(d, "postings"))
    pdf = (
        df.select("shard", "term", "df", "cf", F.md5(F.col("doc_blob")).alias("h"))
        .orderBy("shard", "term")
        .toPandas()
    )
    return pdf


def test_resume_equals_single_shot(spark, tmp_path):
    full_dir = str(tmp_path / "full")
    part_dir = str(tmp_path / "partial")

    pages = corpus.web_pages_df(spark, N, partitions=4)
    build_index(spark, pages, full_dir, n_shards=SHARDS)

    # partial build: only shards {0, 2} complete, then resume
    build_index(spark, pages, part_dir, n_shards=SHARDS, only_shards=[0, 2])
    manifest = spark.read.parquet(os.path.join(part_dir, "_build_state"))
    done = {r["shard"] for r in manifest.filter(F.col("status") == "complete").collect()}
    assert done == {0, 2}

    res = resume_build(spark, pages, part_dir, n_shards=SHARDS)
    assert res.get("resumed") != 0  # did real work

    a = _postings_fingerprint(spark, full_dir)
    b = _postings_fingerprint(spark, part_dir)
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))

    # second resume is a no-op
    assert resume_build(spark, pages, part_dir, n_shards=SHARDS) == {"resumed": 0}


def test_resumed_index_searches_identically(spark, tmp_path, oracle):
    d = str(tmp_path / "idx")
    pages = corpus.web_pages_df(spark, N, partitions=4)
    build_index(spark, pages, d, n_shards=SHARDS, only_shards=[1, 3])
    resume_build(spark, pages, d, n_shards=SHARDS)

    from pdfsearch_spark.search import SearchEngine

    eng = SearchEngine(spark, d)
    got = sorted(
        (r["doc_id"], r["score"])
        for r in eng.search("renal failure", k=200, with_snippets=False)
        .select("doc_id", "score")
        .collect()
    )
    # oracle over the same 120-doc prefix
    from pdfsearch_spark.extract import extract_text
    from pdfsearch_spark.oracle import FTS5Oracle

    pdf = corpus.gen_pandas(N)
    pdf["text"] = [extract_text(h) for h in pdf["html"]]
    o = FTS5Oracle()
    o.load(pdf)
    want = sorted((r.doc_id, r.score) for r in o.search("renal failure", k=200))
    assert [d_ for d_, _ in got] == [d_ for d_, _ in want]
    assert all(abs(a - b) < 1e-9 for (_, a), (_, b) in zip(got, want))
