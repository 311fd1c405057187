"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale notes:
- exact_dedup: one hash-groupBy — the cheapest possible full-corpus dedup;
  fingerprints are md5 so the shuffle key is 16 bytes regardless of doc size.
- minhash_signatures: signatures are computed per-row inside whole-stage
  codegen (array transform + array_min over word shingles) — NO shuffle and
  no Python; the only shuffle in minhash_lsh_pairs is the band-bucket
  self-join, whose fan-out is bounded by bucket size, not corpus size. This
  is the standard shingle → minhash → band → bucket-join pipeline (Broder;
  MMDS ch.3).
- simhash_signatures: same codegen-only shape (explode-free: aggregate over
  the token array per row).
- ngram_jaccard_pairs: EXACT Jaccard via a shingle self-join — quadratic in
  docs-per-shingle, for validation at small scale; at 100 TB use
  minhash_lsh_pairs and verify candidates only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# ---------------------------------------------------------------- helpers

NORM = "trim(lower(coalesce(text, '')))"
WORDS = f"split({NORM}, ' ')"


def _shingle_expr(k: int) -> str:
    """Array of k-word shingles (space-joined), [] when doc has < k words.
    Pure codegen: sequence + transform, no explode/shuffle."""
    idx = f"sequence(0, size({WORDS}) - {k})"
    join = " || ' ' || ".join(f"{WORDS}[i + {j}]" for j in range(k))
    return (
        f"CASE WHEN size({WORDS}) >= {k} "
        f"THEN transform({idx}, i -> {join}) "
        f"ELSE cast(array() as array<string>) END"
    )


# ---------------------------------------------------------------- exact


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups by md5 of normalized text.

    Returns (doc_id, fingerprint, group_size, is_canonical) — canonical =
    min doc_id of its group; one shuffle on the 16-byte fingerprint.
    """
    fp = docs.select(
        "doc_id", F.expr(f"md5({NORM})").alias("fingerprint")
    )
    groups = fp.groupBy("fingerprint").agg(
        F.count("*").alias("group_size"), F.min("doc_id").alias("canonical_id")
    )
    return (
        fp.join(groups, "fingerprint")
        .select(
            "doc_id",
            "fingerprint",
            "group_size",
            (F.col("doc_id") == F.col("canonical_id")).alias("is_canonical"),
        )
    )


# ---------------------------------------------------------------- minhash

N_HASHES = 16
BAND_SIZE = 4
SHINGLE_K = 3


def minhash_signatures(
    docs: DataFrame, n_hashes: int = N_HASHES, k: int = SHINGLE_K
) -> DataFrame:
    """(doc_id, mh_0..mh_{H-1}) — per-row, codegen-only.

    mh_i = min over shingles of the first 16 hex chars of md5('i:' shingle);
    fixed-width hex compares lexicographically == numerically, so string
    min() is the minhash and stays portable across engines.
    """
    sh = _shingle_expr(k)
    cols = [F.col("doc_id")] + [
        F.expr(
            f"array_min(transform({sh}, s -> substr(md5('{i}:' || s), 1, 16)))"
        ).alias(f"mh_{i}")
        for i in range(n_hashes)
    ]
    return docs.select(*cols)


def minhash_bands(
    docs: DataFrame, n_hashes: int = N_HASHES, band_size: int = BAND_SIZE,
    k: int = SHINGLE_K,
) -> DataFrame:
    """(doc_id, band, sig): one row per band; sig = concat of the band's
    minhashes. Docs with no shingles (null minhash) emit no bands."""
    sigs = minhash_signatures(docs, n_hashes, k)
    n_bands = n_hashes // band_size
    stack_args = ", ".join(
        f"{b}, concat({', '.join(f'mh_{b * band_size + j}' for j in range(band_size))})"
        for b in range(n_bands)
    )
    return (
        sigs.selectExpr("doc_id", f"stack({n_bands}, {stack_args}) as (band, sig)")
        .filter(F.col("sig").isNotNull())
    )


def minhash_lsh_pairs(
    docs: DataFrame, n_hashes: int = N_HASHES, band_size: int = BAND_SIZE,
    k: int = SHINGLE_K,
) -> DataFrame:
    """Candidate near-duplicate pairs: docs sharing >= 1 LSH band.

    Returns (doc_a, doc_b, n_shared_bands), doc_a < doc_b. The self-join is
    on (band, sig) buckets — fan-out bounded by bucket population.
    """
    bands = minhash_bands(docs, n_hashes, band_size, k)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, ["band", "sig"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_shared_bands"))
    )


# ---------------------------------------------------------------- simhash

SIMHASH_BITS = 32


def simhash_signatures(docs: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc_id, simhash): tf-weighted sign-sum over token hash bits.

    Per row, codegen-only: distinct tokens with counts via aggregate over the
    word array; bit j of md5(token) contributes +tf/-tf; simhash bit j = 1
    iff the sum > 0.
    """
    # distinct words with tf, as an array of structs — no explode
    toks = (
        f"transform(array_distinct({WORDS}), w -> "
        f"struct(w as w, size(filter({WORDS}, x -> x = w)) as tf))"
    )
    # 32-bit hash of a token from the first 8 md5 hex chars
    h = "cast(conv(substr(md5(t.w), 1, 8), 16, 10) as bigint)"
    bit_sums = (
        f"transform(sequence(0, {bits - 1}), j -> "
        f"aggregate({toks}, 0L, (acc, t) -> acc + "
        f"CASE WHEN (shiftright({h}, j) & 1) = 1 THEN t.tf ELSE -t.tf END))"
    )
    sim = (
        f"aggregate(zip_with({bit_sums}, sequence(0, {bits - 1}), "
        f"(s, j) -> CASE WHEN s > 0 THEN shiftleft(1L, j) ELSE 0L END), "
        f"0L, (acc, x) -> acc + x)"
    )
    return docs.select("doc_id", F.expr(sim).alias("simhash"))


def simhash_neardup_pairs(
    docs: DataFrame, bits: int = SIMHASH_BITS, max_hamming: int = 3
) -> DataFrame:
    """(doc_a, doc_b, hamming): pairs within max_hamming bits.

    Blocked by the 4 signature bytes (a pair within hamming 3 of a 32-bit
    signature must agree on >= 1 of 4 bytes) — the standard SimHash
    band-rotation trick, so the join is bucketed, never all-pairs.
    """
    sigs = simhash_signatures(docs, bits)
    n_bands = 4
    w = bits // n_bands
    stack_args = ", ".join(
        f"{b}, shiftright(simhash, {b * w}) & {(1 << w) - 1}" for b in range(n_bands)
    )
    banded = sigs.selectExpr(
        "doc_id", "simhash", f"stack({n_bands}, {stack_args}) as (band, chunk)"
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(b, ["band", "chunk"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


# ------------------------------------------------------- exact n-gram Jaccard


def ngram_jaccard_pairs(
    docs: DataFrame, k: int = SHINGLE_K, threshold: float = 0.5
) -> DataFrame:
    """EXACT Jaccard over k-word shingle sets, pairs >= threshold.

    (doc_a, doc_b, jaccard) with jaccard rounded to 6 dp. Validation-scale
    only — the shingle self-join is quadratic in docs-per-shingle; at corpus
    scale use minhash_lsh_pairs for candidates and this only on candidates.
    """
    sh = (
        docs.select("doc_id", F.explode(F.expr(_shingle_expr(k))).alias("shingle"))
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("size_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter") / (F.col("size_a") + F.col("size_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
