"""Corpus-level statistics for training-data curation: TF-IDF keyword
extraction, unigram language-model scoring, and per-stratum length profiles.

Unlike textstats.py (single-pass, shuffle-free, per-document), every op here
is a corpus-relative statistic: it needs at least one aggregation over the
whole corpus (document frequencies, unigram counts, per-language
distributions) before the per-document answer exists. The scale shape is the
same in all three: map-side partial aggregation into a vocabulary- or
stratum-sized table, then a join back onto the big side.

Skew note (applies to tfidf_topk and unigram_logprob): the join key is the
term, and term frequencies are Zipfian — the 'the' partition of a naive
shuffle join would hold a constant fraction of the corpus. The vocab-side
table is tiny relative to the corpus (O(|vocab|) rows), so by default we
broadcast it whole — the right plan through ~1e7 terms. When the vocabulary
is too large to broadcast (~1e8 terms of a raw web crawl), pass
head_min=H to switch to the bounded skew decomposition in _vocab_join:
broadcast only the head terms (provably <= total/H rows — exactly the keys
that would straggle a shuffle), shuffle-join the tail (every key < H rows,
so no reducer skews). Identical results either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from pdfsearch_spark.pipeline.textstats import WORDS

# Non-empty whitespace tokens; split('', ' ') yields [''] so the filter is
# what makes empty/null docs produce zero tokens rather than one.
_TOKENS = f"filter({WORDS}, w -> w != '')"


def _tokens(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", F.explode(F.expr(_TOKENS)).alias("term")
    )


def _vocab_join(tf: DataFrame, vocab: DataFrame, weight_col: str,
                head_min: int | None) -> DataFrame:
    """Join the per-(doc, term) tf table to the vocab-side stats table.

    head_min=None (default): broadcast the whole vocab — the right plan
    while |vocab| fits a broadcast (toy through ~1e7 terms).

    head_min=H: the skew-join decomposition for vocabularies too large to
    broadcast (~1e8 terms at web scale). Head terms (weight >= H) are
    broadcast-joined — there are at most total_weight/H of them, so the
    broadcast is provably bounded no matter how Zipfian the corpus — and
    those are exactly the keys that would straggle a shuffle join. Tail
    terms (weight < H) go through a plain shuffle join whose per-key row
    count is < H by construction, so no reducer skews. Results are
    identical either way (it is purely a physical-plan split), asserted in
    tests/test_corpusstats.py.
    """
    if head_min is None:
        return tf.join(F.broadcast(vocab), "term")
    head = vocab.filter(F.col(weight_col) >= head_min)
    tail = vocab.filter(F.col(weight_col) < head_min)
    return tf.join(F.broadcast(head), "term").unionByName(
        tf.join(tail.hint("shuffle_hash"), "term")
    )


def tfidf_topk(docs: DataFrame, k: int = 5,
               head_min: int | None = None) -> DataFrame:
    """Top-k keyword extraction per document by smoothed TF-IDF.

    idf = ln((1 + N) / (1 + df)) + 1 (the sklearn smooth-idf formula — never
    zero, never divides by zero); score = tf * idf. Returns
    (doc_id, term, tf, score, term_rank) for the k highest-scoring terms per
    doc; ranking uses the ROUNDED score with the term string as tie-break so
    the ordering is engine-portable (two engines may disagree in the last
    ulp of ln, never after round-to-6).

    Plan: explode → (doc_id, term) partial-agg count [shuffle 1] → per-term
    df [shuffle 2, vocab-sized output] → broadcast df back onto tf → per-doc
    window top-k [shuffle 3, keyed by doc_id so perfectly balanced]. Docs
    with no tokens simply emit no rows. head_min switches the vocab join to
    the bounded-broadcast skew decomposition (see _vocab_join) — same
    result, the plan for vocabularies too large to broadcast whole.
    """
    tf = _tokens(docs).groupBy("doc_id", "term").agg(
        F.count("*").alias("tf")
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.select(F.count("*").alias("n_docs"))
    scored = _vocab_join(tf, df_, "df", head_min).crossJoin(
        F.broadcast(n_docs)
    ).select(
        "doc_id",
        "term",
        "tf",
        F.round(
            F.col("tf")
            * (
                F.log((1 + F.col("n_docs")) / (1 + F.col("df"))) + F.lit(1.0)
            ),
            6,
        ).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
    )


def unigram_logprob(docs: DataFrame,
                    head_min: int | None = None) -> DataFrame:
    """Corpus-internal unigram LM scoring — the cheap analog of CCNet's
    KenLM perplexity filter: documents whose tokens are improbable under the
    corpus's own unigram distribution (rare-token soup, boilerplate hashes,
    non-linguistic noise) score low and can be gated on.

    Returns one row per input doc: (doc_id, n_tokens, mean_logprob) where
    mean_logprob = mean over token positions of ln(count(term)/total_tokens)
    (natural log, maximum-likelihood unigram, no OOV by construction since
    the vocabulary is fitted on the same corpus). Empty docs keep a row with
    n_tokens = 0 and NULL mean_logprob.

    Plan: one (doc_id, term) tf aggregation [shuffle 1], a vocab-sized term
    count [shuffle 2] whose grand total rides along as a broadcast scalar,
    broadcast-join back, then a per-doc weighted mean [shuffle 3 on doc_id].
    The corpus is scanned once. head_min: see _vocab_join (bounded-broadcast
    skew decomposition for very large vocabularies; identical results).
    """
    tf = _tokens(docs).groupBy("doc_id", "term").agg(
        F.count("*").alias("tf")
    )
    vocab = tf.groupBy("term").agg(F.sum("tf").alias("cnt"))
    total = vocab.select(F.sum("cnt").alias("total_tokens"))
    scored = _vocab_join(tf, vocab, "cnt", head_min).crossJoin(
        F.broadcast(total)
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.sum("tf").alias("n_tokens"),
        F.round(
            F.sum(
                F.col("tf")
                * F.log(F.col("cnt") / F.col("total_tokens"))
            )
            / F.sum("tf"),
            6,
        ).alias("mean_logprob"),
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            "mean_logprob",
        )
    )


PROFILE_PCTS = (0.5, 0.9, 0.99)


def length_profile(
    docs: DataFrame,
    by: str = "lang",
    exact: bool = True,
) -> DataFrame:
    """Per-stratum document-length distribution — the corpus-monitoring
    numbers a curation pipeline tracks run-over-run (did the p99 length of
    'en' docs jump after a crawler change?).

    Returns (by, n_docs, mean_chars, p50/p90/p99_chars, min/max_chars).
    exact=True uses the exact `percentile` aggregate (linear interpolation,
    identical to DuckDB's quantile_cont) — it buffers each group's values,
    which is fine while strata counts are bounded; exact=False switches to
    approx_percentile (GK sketch, mergeable, bounded memory) — the 100 TB
    path, at the cost of oracle-exactness.
    """
    pcts = ", ".join(str(p) for p in PROFILE_PCTS)
    fn = "percentile" if exact else "approx_percentile"
    qs = F.expr(f"{fn}(n_chars, array({pcts}))")
    return (
        docs.groupBy(by)
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 6).alias("mean_chars"),
            qs.alias("qs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .select(
            by,
            "n_docs",
            "mean_chars",
            *[
                F.round(F.col("qs")[i].cast("double"), 6).alias(
                    f"p{int(p * 100)}_chars"
                )
                for i, p in enumerate(PROFILE_PCTS)
            ],
            "min_chars",
            "max_chars",
        )
    )


def corpus_report(docs: DataFrame) -> DataFrame:
    """One-row corpus KPI dashboard — the at-a-glance report a curation run
    logs after every corpus build: volume, exact-duplicate rate, language
    mix, mean quality, token totals, length profile.

    (n_docs, n_unique, dup_rate, n_en, n_fr, n_de, n_es, n_und,
    mean_quality, total_ws_tokens, mean_chars, p50_chars)

    A composition of the tested per-doc primitives (fingerprints, lang_id,
    quality_scores, token_counts — the corpus_clean pattern: equi-joins on
    doc_id, which AQE plans as co-partitioned exchanges), finished by ONE
    single-row aggregate with map-side partials; the only corpus-wide state
    is the distinct-fingerprint count.
    """
    from pdfsearch_spark.pipeline.textstats import (
        fingerprints,
        lang_id,
        quality_scores,
        token_counts,
    )

    fp = fingerprints(docs).select("doc_id", "fp_md5")
    lg = lang_id(docs).select("doc_id", "lang_guess")
    q = quality_scores(docs).select("doc_id", "quality_score", "n_chars_norm")
    tk = token_counts(docs).select("doc_id", "n_ws_tokens")
    per_doc = fp.join(lg, "doc_id").join(q, "doc_id").join(tk, "doc_id")

    def lang_count(lang: str):
        return F.count(F.when(F.col("lang_guess") == lang, 1)).alias(
            f"n_{lang}"
        )

    return per_doc.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("fp_md5").alias("n_unique"),
        F.round(
            F.lit(1.0) - F.countDistinct("fp_md5") / F.count("*"), 6
        ).alias("dup_rate"),
        lang_count("en"),
        lang_count("fr"),
        lang_count("de"),
        lang_count("es"),
        lang_count("und"),
        F.round(F.avg("quality_score"), 6).alias("mean_quality"),
        F.sum("n_ws_tokens").cast("long").alias("total_ws_tokens"),
        F.round(F.avg("n_chars_norm"), 6).alias("mean_chars"),
        F.round(
            F.expr("percentile(n_chars_norm, 0.5)"), 6
        ).alias("p50_chars"),
    )
