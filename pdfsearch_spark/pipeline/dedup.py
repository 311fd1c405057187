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
MINHASH_P = 4294967311  # prime > 2^32; a*h+b stays < 2^63 (no overflow)
MINHASH_SEED = 77


def minhash_params(n_hashes: int = N_HASHES, seed: int = MINHASH_SEED):
    """Deterministic affine-permutation params (a odd, < 2^31)."""
    import numpy as np

    rng = np.random.Generator(np.random.Philox(key=[seed, 1]))
    a = [int(x) | 1 for x in rng.integers(1, 2**31 - 1, n_hashes)]
    b = [int(x) for x in rng.integers(0, 2**31 - 1, n_hashes)]
    return a, b


def minhash_signatures(
    docs: DataFrame, n_hashes: int = N_HASHES, k: int = SHINGLE_K
) -> DataFrame:
    """(doc_id, mh array<long>) — per-row, codegen-only, ONE md5 per shingle.

    h(s) = first 8 md5 hex chars as a 32-bit int; mh_i = min over shingles of
    (a_i*h + b_i) mod P — the classic affine-permutation MinHash, so the
    md5 cost is paid once, not once per hash function. Two select steps keep
    the hash array materialized (Catalyst won't inline a non-cheap projection
    referenced n_hashes times).
    """
    a, b = minhash_params(n_hashes)
    hashed = docs.select(
        "doc_id", F.explode(F.expr(_shingle_expr(k))).alias("s")
    ).select(
        "doc_id",
        F.expr("cast(conv(substr(md5(s), 1, 8), 16, 10) as bigint)").alias("h"),
    )
    # 16 codegen'd min-aggregates with map-side partial agg: shuffle carries
    # one 16-long row per doc, not shingles. (Nested higher-order-function
    # formulations are interpreted per element and blow up combinatorially
    # once the optimizer inlines them into downstream projections.)
    sigs = hashed.groupBy("doc_id").agg(
        *[
            F.expr(f"min(({a[i]}L * h + {b[i]}L) % {MINHASH_P}L)").alias(f"m{i}")
            for i in range(n_hashes)
        ]
    )
    return sigs.select(
        "doc_id",
        F.expr("array(" + ",".join(f"m{i}" for i in range(n_hashes)) + ")").alias("mh"),
    )


def minhash_bands(
    docs: DataFrame, n_hashes: int = N_HASHES, band_size: int = BAND_SIZE,
    k: int = SHINGLE_K,
) -> DataFrame:
    """(doc_id, band, sig): one row per band; sig = '_'-joined minhashes of
    the band. Docs with no shingles (null minhash) emit no bands."""
    sigs = minhash_signatures(docs, n_hashes, k)
    n_bands = n_hashes // band_size
    stack_args = ", ".join(
        f"{b}, concat_ws('_', {', '.join(f'cast(mh[{b * band_size + j}] as string)' for j in range(band_size))})"
        for b in range(n_bands)
    )
    return (
        sigs.filter(F.expr("mh[0] is not null"))
        .selectExpr("doc_id", f"stack({n_bands}, {stack_args}) as (band, sig)")
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


def neardup_clusters(
    docs: DataFrame, n_hashes: int = N_HASHES, band_size: int = BAND_SIZE,
    k: int = SHINGLE_K, max_iter: int = 50,
) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the LSH candidate
    pairs, completing the dedup story (pairs → clusters → pick a canonical
    doc per cluster, drop the rest).

    Returns (doc_id, cluster_id, cluster_size, is_canonical) for EVERY input
    doc — singletons cluster alone; cluster_id = min doc_id of the component;
    canonical = the min.

    Spark-first iterative min-label propagation (no GraphFrames dependency):
    label(x) starts as x; each round, label(x) ← min(label(x), labels of x's
    neighbors); stop when a round changes nothing. Scale shape:

    - labels live only on edge-TOUCHED docs (at 100 TB the overwhelming
      majority of docs are in no candidate pair and never enter the loop);
      singletons are appended at the end with a cheap left-anti join.
    - each round is ONE shuffle join keyed by doc_id + a map-side-combined
      min agg — no all-pairs anything, fan-out bounded by degree.
    - rounds needed = component diameter. LSH near-dup components are
      near-cliques (duplicate groups share most bands), so 2-3 rounds in
      practice; for adversarial long chains the O(log n) large-star /
      small-star variant (Kiveris et al., "Connected Components in
      MapReduce and Beyond", SoCC'14) is the drop-in upgrade.
    - localCheckpoint per round truncates the otherwise exponentially
      growing iterative plan lineage (standard practice for iterative
      DataFrame algorithms).
    """
    pairs = minhash_lsh_pairs(docs, n_hashes, band_size, k).select("doc_a", "doc_b")
    edges = pairs.union(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).persist()
    labels = (
        edges.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("cluster_id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges["doc_a"] == labels["doc_id"])
            .groupBy(F.col("doc_b").alias("doc_id"))
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"), F.coalesce("nbr_min", F.col("cluster_id"))
                ).alias("cluster_id"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.withColumnRenamed("cluster_id", "new_cid")
            .join(labels, "doc_id")
            .filter(F.col("new_cid") != F.col("cluster_id"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(f"neardup_clusters did not converge in {max_iter} rounds")
    edges.unpersist()
    sizes = labels.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    clustered = labels.join(sizes, "cluster_id").select(
        "doc_id", "cluster_id", "cluster_size"
    )
    singles = (
        docs.select("doc_id")
        .distinct()
        .join(labels.select("doc_id"), "doc_id", "left_anti")
        .select(
            "doc_id",
            F.col("doc_id").alias("cluster_id"),
            F.lit(1).cast("long").alias("cluster_size"),
        )
    )
    return clustered.union(singles).withColumn(
        "is_canonical", F.col("doc_id") == F.col("cluster_id")
    )


# ---------------------------------------------------------------- simhash

SIMHASH_BITS = 32


def simhash_signatures(docs: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc_id, simhash): tf-weighted sign-sum over token hash bits.

    bit j of md5(token) contributes +tf/-tf; simhash bit j = 1 iff the sum
    is > 0. Shaped as explode -> (doc, token) tf agg -> 32 codegen'd bit-sum
    aggregates: both shuffles carry partially-aggregated rows, and nothing is
    an interpreted higher-order function (those evaluate per element and get
    inlined combinatorially downstream).
    """
    tf = (
        docs.select("doc_id", F.explode(F.expr(WORDS)).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"))
    )
    h = tf.select(
        "doc_id",
        "tf",
        F.expr("cast(conv(substr(md5(w), 1, 8), 16, 10) as bigint)").alias("h"),
    )
    sums = h.groupBy("doc_id").agg(
        *[
            F.expr(
                f"sum(CASE WHEN (shiftright(h, {j}) & 1) = 1 THEN tf ELSE -tf END)"
            ).alias(f"s{j}")
            for j in range(bits)
        ]
    )
    sim = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {1 << j}L ELSE 0L END)" for j in range(bits)
    )
    return sums.select("doc_id", F.expr(sim).alias("simhash"))


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
    docs: DataFrame,
    k: int = SHINGLE_K,
    threshold: float = 0.5,
    max_docs_per_shingle: int | None = 10_000,
) -> DataFrame:
    """EXACT Jaccard over k-word shingle sets, pairs >= threshold.

    (doc_a, doc_b, jaccard) with jaccard rounded to 6 dp. Validation-scale
    only — the shingle self-join is quadratic in docs-per-shingle; at corpus
    scale use ngram_jaccard_verify (LSH candidates + exact verification,
    linear in pair count). ENFORCED: if any shingle appears in more than
    ``max_docs_per_shingle`` documents the self-join would expand beyond
    cap² rows for that key alone, so the op raises ValueError naming the
    hot shingle and pointing at the scale path, instead of silently
    launching a job that cannot finish. Pass ``max_docs_per_shingle=None``
    to skip the check (trusted small inputs only). The check is one extra
    partial-agged count over the shingle frame — acceptable for a
    validation-scope op.
    """
    sh = (
        docs.select("doc_id", F.explode(F.expr(_shingle_expr(k))).alias("shingle"))
        .distinct()
    )
    if max_docs_per_shingle is not None:
        # cache the shingle frame so enforcement costs one count-agg, not a
        # second explode+distinct pass (the guard collect materializes it;
        # the returned plan reuses the cache — validation-scope op, the
        # persist is left to LRU eviction)
        from pyspark import StorageLevel

        sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("n_docs"))
            .filter(F.col("n_docs") > max_docs_per_shingle)
            .orderBy(F.desc("n_docs"))
            .limit(1)
            .collect()
        )
        if hot:
            raise ValueError(
                f"ngram_jaccard_pairs: shingle {hot[0]['shingle']!r} occurs in "
                f"{hot[0]['n_docs']} docs (> max_docs_per_shingle="
                f"{max_docs_per_shingle}); the exact self-join is quadratic in "
                f"docs-per-shingle — use ngram_jaccard_verify (LSH candidates "
                f"+ exact verification) at this scale, or raise the cap "
                f"explicitly."
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


def ngram_jaccard_verify(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    k: int = SHINGLE_K,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT Jaccard restricted to candidate pairs — the corpus-scale
    composition that replaces ngram_jaccard_pairs' quadratic self-join:
    candidates come from the banded LSH bucket join (never all-pairs, default
    ``minhash_lsh_pairs``), exact verification then costs one per-doc shingle
    array (codegen, no shuffle), two doc_id-keyed joins to attach the arrays
    to each pair, and a whole-stage-codegen ``array_intersect`` per pair —
    linear in candidate count, with per-row cost bounded by document length.

    Returns (doc_a, doc_b, jaccard >= threshold), identical values to
    ngram_jaccard_pairs on the pairs both produce (tested)."""
    if pairs is None:
        pairs = minhash_lsh_pairs(docs, k=k)
    pairs = pairs.select("doc_a", "doc_b")
    sets = docs.select(
        "doc_id", F.expr(f"array_distinct({_shingle_expr(k)})").alias("sh")
    )
    sa = sets.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sets.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_inter", F.expr("size(array_intersect(sh_a, sh_b))"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter")
                / (F.expr("size(sh_a)") + F.expr("size(sh_b)") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
