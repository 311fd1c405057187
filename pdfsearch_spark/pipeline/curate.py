"""Corpus curation: the composed keep/drop decision a training-data pipeline
actually runs over the raw corpus — exact dedup + quality gates + repetition
gates, producing one verdict row per document.

This is deliberately a COMPOSITION of the tested primitives (exact_dedup,
quality_scores, repetition_stats), not a re-implementation: it demonstrates
the ops plug together relationally, and its oracle re-derives the same
verdicts in plain SQL end-to-end.

Shape at scale: three independent passes over the docs table — each either
shuffle-free codegen (quality, repetition) or one 16-byte-key hash shuffle
(dedup) — joined back on doc_id. All three joins are equi-joins on the same
key, so AQE plans them as one co-partitioned exchange per side; nothing here
is quadratic and nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pdfsearch_spark.pipeline.dedup import exact_dedup
from pdfsearch_spark.pipeline.textstats import quality_scores, repetition_stats

DEFAULT_MIN_QUALITY = 0.7
DEFAULT_MIN_WORDS = 10


def corpus_clean(
    docs: DataFrame,
    min_quality: float = DEFAULT_MIN_QUALITY,
    min_words: int = DEFAULT_MIN_WORDS,
) -> DataFrame:
    """One verdict row per input doc:
    (doc_id, is_canonical, quality_score, top_word_frac, distinct_word_ratio,
    keep, drop_reason).

    keep = exact-dedup canonical AND quality_score >= min_quality AND
    n_words >= min_words AND NOT is_repetitive.

    drop_reason is the FIRST failing gate in fixed order — 'duplicate',
    'low_quality', 'repetitive' — or NULL when kept, so downstream
    accounting (why did we drop X% of the corpus?) is a one groupBy.
    """
    dd = exact_dedup(docs).select("doc_id", "is_canonical")
    q = quality_scores(docs).select("doc_id", "n_words", "quality_score")
    r = repetition_stats(docs).select(
        "doc_id", "top_word_frac", "distinct_word_ratio", "is_repetitive"
    )
    out = dd.join(q, "doc_id").join(r, "doc_id")
    low_q = (F.col("quality_score") < min_quality) | (
        F.col("n_words") < min_words
    )
    keep = (
        F.col("is_canonical") & ~low_q & ~F.col("is_repetitive")
    )
    reason = (
        F.when(~F.col("is_canonical"), F.lit("duplicate"))
        .when(low_q, F.lit("low_quality"))
        .when(F.col("is_repetitive"), F.lit("repetitive"))
    )
    return out.select(
        "doc_id",
        "is_canonical",
        "quality_score",
        "top_word_frac",
        "distinct_word_ratio",
        keep.alias("keep"),
        reason.alias("drop_reason"),
    )
