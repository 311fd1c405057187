"""Shared fixtures: one SparkSession, one built index, one FTS5 oracle.

Session-scoped — the index build over the N-doc fixture corpus happens once
per pytest run (SURVEY.md §5.3)."""

from __future__ import annotations

import os
import shutil

import pytest

from pdfsearch_spark import corpus
from pdfsearch_spark.extract import extract_text
from pdfsearch_spark.index_build import build_index
from pdfsearch_spark.oracle import FTS5Oracle
from pdfsearch_spark.session import get_spark

N_DOCS = int(os.environ.get("TEST_CORPUS_N", "250"))
N_SHARDS = 8
INDEX_DIR = "/tmp/pdfsearch_spark_test_index"
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pdfsearch-spark-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_pdf():
    """Driver-side fixture corpus with extracted text (oracle input)."""
    pdf = corpus.gen_pandas(N_DOCS)
    pdf["text"] = [extract_text(h) for h in pdf["html"]]
    return pdf


@pytest.fixture(scope="session")
def oracle(corpus_pdf):
    o = FTS5Oracle()
    o.load(corpus_pdf)
    return o


@pytest.fixture(scope="session")
def index_dir(spark):
    shutil.rmtree(INDEX_DIR, ignore_errors=True)
    pages = corpus.web_pages_df(spark, N_DOCS, partitions=8)
    build_index(spark, pages, INDEX_DIR, n_shards=N_SHARDS)
    return INDEX_DIR


@pytest.fixture(scope="session")
def engine(spark, index_dir):
    from pdfsearch_spark.search import SearchEngine

    return SearchEngine(spark, index_dir)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
