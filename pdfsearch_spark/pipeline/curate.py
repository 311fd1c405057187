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


DEFAULT_SOURCE_CAP = 100
SOURCE_CAP_SALTS = 64


def source_cap(
    docs: DataFrame,
    cap: int = DEFAULT_SOURCE_CAP,
    n_salts: int = SOURCE_CAP_SALTS,
) -> DataFrame:
    """Per-source document cap: keep the `cap` best docs per source and
    drop the rest — the domain-cap step every webtext curation pipeline
    runs so one prolific domain cannot dominate the training mix
    (cf. RefinedWeb / CCNet per-domain limits).

    "Best" is (n_chars DESC, doc_id ASC) — an exact integer ordering, so
    the result is deterministic and oracle-checkable (no float-ulp rank
    flips at the cap boundary).

    Returns (doc_id, source, n_chars, source_rank) for kept docs only,
    source_rank in 1..cap.

    Scale shape — two-phase salted top-N, because a naive
    Window.partitionBy(source) sends EVERY row of a head domain to one
    reducer (at 100 TB a big crawl domain is billions of rows):

    - phase 1 ranks within (source, salt(doc_id) % n_salts) and keeps at
      most `cap` rows per salt — each reducer sees ~1/n_salts of even the
      largest domain, and emits <= cap rows;
    - phase 2 ranks the surviving <= cap * n_salts rows per source — a
      bounded input per key regardless of domain size.

    The global top-`cap` of a source is contained in the union of its
    per-salt top-`cap`s, so the two phases are exact, not approximate.
    Both phases are one shuffle each; phase 2's input is tiny.
    """
    from pyspark.sql import Window

    order = [F.col("n_chars").desc(), F.col("doc_id").asc()]
    salted = docs.select("doc_id", "source", "n_chars").withColumn(
        "_salt", F.pmod(F.xxhash64("doc_id"), F.lit(n_salts))
    )
    w1 = Window.partitionBy("source", "_salt").orderBy(*order)
    survivors = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= cap)
        .drop("_salt", "_r1")
    )
    w2 = Window.partitionBy("source").orderBy(*order)
    return (
        survivors.withColumn(
            "source_rank", F.row_number().over(w2).cast("int")
        )
        .filter(F.col("source_rank") <= cap)
        .select("doc_id", "source", "n_chars", "source_rank")
    )


# PII scrub rules, applied in this order; each is (name, regex, token).
# Regexes deliberately use only the syntax subset that Java regex (Spark)
# and RE2 (DuckDB oracle) interpret identically: char classes, bounded
# repetition, (?:...) groups, \d, \b — no lookaround, no backrefs.
PII_RULES = [
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\+?\\d{3}[-. ]\\d{3,4}[-. ]\\d{4}", "<PHONE>"),
    ("ipv4", "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>"),
]


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails, phone numbers, and IPv4 addresses from `text_col` —
    the PII-scrub pass of a webtext curation pipeline (cf. C4 / Dolma).

    Rules apply SEQUENTIALLY in PII_RULES order and each count is taken on
    the text state its rule actually sees, so e.g. an IP that only occurs
    as an email's host part is consumed by the email rule and never counted
    as an IP. Returns (doc_id, clean_text, n_email, n_phone, n_ipv4).

    Scale shape: a single codegen projection — chained regexp_replace /
    regexp_count, no shuffle, no UDF; runs at parquet-scan speed and
    column-prunes to (doc_id, text).
    """
    cur = F.coalesce(F.col(text_col), F.lit(""))
    counts = []
    for name, pat, token in PII_RULES:
        counts.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, token)
    return docs.select("doc_id", cur.alias("clean_text"), *counts)


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 13,
    min_hits: int = 1,
) -> DataFrame:
    """Eval-set decontamination: flag training documents that share any
    word n-gram with a held-out evaluation set (cf. the GPT-3 paper's
    13-gram overlap filter; Dolma / FineWeb run the same gate).

    Returns one row per input doc: (doc_id, n_contaminated, contaminated)
    where n_contaminated counts the doc's shingle positions whose n-gram
    occurs anywhere in the eval set, and contaminated = n_contaminated >=
    min_hits.

    Scale shape — the two sides are wildly asymmetric and the plan exploits
    that:
    - eval side: benchmarks are ~1e5..1e7 n-grams even when the training
      corpus is 100 TB. shingle (pure codegen) → md5 → distinct: one small
      shuffle, result broadcast.
    - train side: shingles + 16-byte md5 hashes are built in one codegen
      projection (no raw-string explode), then exploded and broadcast-joined
      against the eval hash set. The join is map-side, so only HIT rows
      (rare) ever reach the per-doc count shuffle; clean docs cost a scan
      and nothing else. A left join from the doc-id spine restores zero
      rows for clean docs.
    """
    from pdfsearch_spark.pipeline.dedup import _shingle_expr

    hashes = f"transform({_shingle_expr(n)}, s -> md5(s))"
    eval_grams = (
        eval_docs.select(F.explode(F.expr(hashes)).alias("gh")).distinct()
    )
    hits = (
        docs.select("doc_id", F.explode(F.expr(hashes)).alias("gh"))
        .join(F.broadcast(eval_grams), "gh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated"))
    )
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            (F.coalesce("n_contaminated", F.lit(0)) >= min_hits).alias(
                "contaminated"
            ),
        )
    )


def rebalance_mix(
    docs: DataFrame,
    targets: dict,
    stratum_col: str = "lang",
    seed: str = "mix:v1",
) -> DataFrame:
    """Deterministic stratified downsampling to a target mixture — the
    domain/language rebalancing step of a training-data pipeline ("make the
    output 60% en / 30% code / 10% other"), keeping the maximum possible
    volume subject to the mixture.

    The most-underrepresented stratum binds: total_out = min_s(count_s /
    target_s); each stratum keeps keep_s = target_s * total_out docs, i.e.
    acceptance rate rate_s = target_s * total_out / count_s (= 1.0 for the
    binding stratum). Acceptance is the same append-stable hash-threshold
    rule as split_assign: accept iff the doc's 32-bit md5(key:seed) bucket
    < rate_s * 2^32 — re-running on a grown corpus never flips survivors
    within a stratum whose rate didn't move.

    Returns one verdict row per doc in a targeted stratum:
    (doc_id, <stratum_col>, rate, keep). Strata absent from `targets` are
    dropped (rate would be 0). Target fractions must sum to 1.

    Scale shape: one tiny groupBy(stratum) count (partial-agg map side →
    |strata| rows), a scalar min over it, a broadcast join of |strata|
    rate rows back onto the corpus, and a shuffle-free threshold filter.
    No driver-side collect; the rates stay relational.
    """
    total = sum(targets.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"target fractions must sum to 1, got {total}")
    spark = docs.sparkSession
    tgt = spark.createDataFrame(
        [(k, float(v)) for k, v in sorted(targets.items())],
        f"{stratum_col} string, target double",
    )
    counts = (
        docs.groupBy(stratum_col)
        .agg(F.count("*").cast("double").alias("n"))
        .join(tgt, stratum_col)
    )
    total_out = counts.select(
        F.min(F.col("n") / F.col("target")).alias("total_out")
    )
    rates = counts.crossJoin(F.broadcast(total_out)).select(
        stratum_col,
        F.least(
            F.lit(1.0), F.col("target") * F.col("total_out") / F.col("n")
        ).alias("rate"),
    )
    bucket = (
        "cast(conv(substr(md5(concat(cast(doc_id as string), "
        f"':{seed}')), 1, 8), 16, 10) as bigint)"
    )
    return (
        docs.select("doc_id", stratum_col)
        .join(F.broadcast(rates), stratum_col)
        .select(
            "doc_id",
            stratum_col,
            F.round("rate", 6).alias("rate"),
            (
                # explicit floor: Spark's double→bigint cast truncates but
                # DuckDB's rounds, so the threshold must be floored in both
                F.expr(bucket)
                < F.floor(F.col("rate") * F.lit(4294967296.0))
            ).alias("keep"),
        )
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "doc_id",
    content_cols: tuple = ("text",),
) -> DataFrame:
    """Crawl-snapshot diff: classify every document key across two crawls as
    'added' (new only), 'removed' (old only), 'changed' (both, content hash
    differs), or 'unchanged' — the op an incremental re-index / re-train
    decision keys on (only added+changed need processing).

    Content identity is md5 over the content columns joined with a 0x1f
    separator (so ("ab","c") never collides with ("a","bc")).

    Returns (key_col, old_md5, new_md5, status).

    Scale shape: each side reduces to (key, 16-byte hash) in its scan
    projection — content bytes never cross the shuffle — then ONE
    co-partitioned full-outer equi-join on the key. No skew risk (keys are
    unique per side), no driver traffic.
    """
    sep = "\x1f"

    def hashed(df: DataFrame, alias: str) -> DataFrame:
        cols = [F.coalesce(F.col(c).cast("string"), F.lit("")) for c in content_cols]
        return df.select(
            F.col(key_col),
            F.md5(F.concat_ws(sep, *cols).cast("binary")).alias(alias),
        )

    o = hashed(old, "old_md5")
    n = hashed(new, "new_md5")
    joined = o.join(n, key_col, "full_outer")
    status = (
        F.when(F.col("old_md5").isNull(), F.lit("added"))
        .when(F.col("new_md5").isNull(), F.lit("removed"))
        .when(F.col("old_md5") != F.col("new_md5"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(
        key_col,
        F.coalesce("old_md5", F.lit("")).alias("old_md5"),
        F.coalesce("new_md5", F.lit("")).alias("new_md5"),
        status.alias("status"),
    )


DEFAULT_MIN_LINE_CHARS = 10
DEFAULT_MAX_DUP_DOCS = 2


def line_dedup(
    docs: DataFrame,
    min_line_chars: int = DEFAULT_MIN_LINE_CHARS,
    max_dup_docs: int = DEFAULT_MAX_DUP_DOCS,
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level boilerplate-line removal — the line-dedup pass of a
    webtext curation pipeline (cf. C4's duplicated-span filter and
    RefinedWeb/CCNet paragraph dedup): a line whose trimmed text occurs in
    more than `max_dup_docs` DISTINCT documents ("All rights reserved",
    cookie banners, nav bars) is removed from every document.

    Lines shorter than `min_line_chars` after trimming are ineligible —
    never counted and never removed (dropping every empty line or "Home"
    would shred legitimate text). Matching is on the trimmed line; the
    original untrimmed line is what's kept or dropped.

    Returns one row per input doc:
    (doc_id, clean_text, n_lines, n_dropped) — clean_text preserves the
    original line order and the doc survives (possibly empty) even when
    every line drops.

    Scale shape: explode → two partial-agged shuffles to build the
    boilerplate set (DISTINCT on the (doc_id, line_hash) PAIR — hash
    partitioning on the pair, so a Zipf-head line never lands on one
    reducer — then groupBy(hash) over already-unique pairs), a shuffle
    equi-join of the lines on line_hash (head-line skew here is exactly
    the AQE skew-join case; the boiler side is the small side), and one
    groupBy(doc_id) to reassemble. No driver-side collect; the boilerplate
    set never materializes outside the plan.
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    lines = docs.select(
        "doc_id", F.posexplode(F.split(text, "\n")).alias("pos", "line")
    )
    elig = lines.select(
        "doc_id",
        "pos",
        "line",
        F.xxhash64(F.trim("line")).alias("h"),
        (F.length(F.trim("line")) >= min_line_chars).alias("eligible"),
    )
    boiler = (
        elig.filter("eligible")
        .select("doc_id", "h")
        .distinct()
        .groupBy("h")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") > max_dup_docs)
        .select("h", F.lit(True).alias("is_boiler"))
    )
    marked = elig.join(boiler, "h", "left").select(
        "doc_id",
        "pos",
        "line",
        (F.col("eligible") & F.coalesce("is_boiler", F.lit(False))).alias(
            "dropped"
        ),
    )
    kept = F.filter(
        F.array_sort(F.collect_list(F.struct("pos", "dropped", "line"))),
        lambda s: ~s["dropped"],
    )
    return marked.groupBy("doc_id").agg(
        F.array_join(
            F.transform(kept, lambda s: s["line"]), "\n"
        ).alias("clean_text"),
        F.count("*").alias("n_lines"),
        F.sum(F.col("dropped").cast("long")).alias("n_dropped"),
    )


DEFAULT_SPLIT_WEIGHTS = (("train", 0.90), ("val", 0.05), ("test", 0.05))


def split_assign(
    docs: DataFrame,
    weights: tuple = DEFAULT_SPLIT_WEIGHTS,
    seed: str = "v1",
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test split assignment — the reproducible-split
    op a training pipeline needs so the same document lands in the same
    split on every run, on every cluster, regardless of partitioning or
    row order.

    bucket = first 8 hex chars of md5(key || ':' || seed) as a uniform
    32-bit int; the split is chosen by cumulative-weight thresholds over
    [0, 2^32). Properties:
    - assignment depends ONLY on (key, seed): appending new docs never
      reassigns existing ones (no modulo-over-count drift);
    - changing `seed` re-rolls all assignments (for split rotation);
    - shuffle-free single codegen projection, no UDF, no RNG state.

    Returns (key_col, bucket, split). Weights are (name, fraction) pairs in
    order; fractions must sum to 1.
    """
    total = sum(f for _, f in weights)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    bucket = (
        f"cast(conv(substr(md5(concat(cast({key_col} as string), ':{seed}')),"
        " 1, 8), 16, 10) as bigint)"
    )
    cum = 0.0
    branches = []
    for name, frac in weights[:-1]:
        cum += frac
        thr = int(cum * 4294967296)
        branches.append(f"WHEN bucket < {thr} THEN '{name}'")
    split = f"CASE {' '.join(branches)} ELSE '{weights[-1][0]}' END"
    return docs.select(key_col).select(
        key_col, F.expr(bucket).alias("bucket")
    ).select(key_col, "bucket", F.expr(split).alias("split"))
