"""Sequence packing — the last step before a training run: concatenate
documents in a stable order and cut the token stream into fixed-length
training sequences (GPT-style document packing).

The core primitive is a DISTRIBUTED EXCLUSIVE PREFIX SUM. The naive Spark
formulation — `sum(tokens) OVER (ORDER BY doc_id)` with no partitionBy —
sends the entire corpus through ONE reducer, the canonical scale killer.
`global_offsets` uses the textbook two-phase scan instead:

1. bucket rows by order-contiguous value ranges (one min/max aggregate
   picks the bucket width — deterministic, no sampling, no driver data);
2. per-bucket exclusive running sum (windows partitioned by bucket — every
   bucket sorts independently);
3. per-bucket totals → exclusive running sum over the ~n_buckets totals
   (a single-partition window over n_buckets ROWS, not the corpus) →
   broadcast-joined back.

offset(row) = in-bucket prefix + preceding-bucket totals. Equal to the
single-reducer window bit-for-bit, but the big sorts are n_buckets-way
parallel and the only driver traffic is two scalars.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

DEFAULT_N_BUCKETS = 256
DEFAULT_SEQ_LEN = 2048


def global_offsets(
    df: DataFrame,
    order_col: str = "doc_id",
    weight_col: str = "n_tokens",
    n_buckets: int = DEFAULT_N_BUCKETS,
) -> DataFrame:
    """Adds `offset`: the exclusive prefix sum of `weight_col` in
    `order_col` order (sum of all weights strictly before this row).

    `order_col` must be numeric with unique values (doc ids). Buckets are
    fixed-width value ranges, so the result is a pure function of the data
    — value clustering only costs balance, never correctness; a production
    variant on pathologically sparse keys would swap in persisted range
    boundaries, leaving phases 2-3 unchanged.

    Bucketing happens in DOUBLE space: hash-valued keys (xxhash64 ids) span
    the full signed-64-bit range, where `key - min` overflows BIGINT under
    ANSI mode. The double path cannot overflow, and precision loss is
    harmless — int→double is monotone, so buckets stay order-contiguous
    (boundary placement only affects balance) and the exact order_col still
    sorts within each bucket."""
    mn, mx = df.agg(F.min(order_col), F.max(order_col)).first()
    if mn is None:
        # empty corpus: pass the empty frame through with the column added
        return df.withColumn("offset", F.lit(0).cast("long"))
    width = float(max(1.0, math.ceil((float(mx) - float(mn)) / n_buckets)))
    b = df.withColumn(
        "_b",
        F.floor(
            (F.col(order_col).cast("double") - F.lit(float(mn))) / width
        ).cast("long"),
    )
    w_local = (
        Window.partitionBy("_b")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = b.withColumn(
        "_local",
        F.coalesce(F.sum(F.col(weight_col).cast("long")).over(w_local), F.lit(0)),
    )
    # n_buckets rows: the one single-partition window, over totals only
    w_bucket = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    bucket_off = (
        b.groupBy("_b")
        .agg(F.sum(F.col(weight_col).cast("long")).alias("_t"))
        .withColumn("_off", F.coalesce(F.sum("_t").over(w_bucket), F.lit(0)))
        .select("_b", "_off")
    )
    return (
        local.join(F.broadcast(bucket_off), "_b")
        .withColumn("offset", (F.col("_local") + F.col("_off")).cast("long"))
        .drop("_b", "_local", "_off")
    )


DEFAULT_CHUNK_TOKENS = 512
DEFAULT_CHUNK_OVERLAP = 64


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = DEFAULT_CHUNK_TOKENS,
    overlap: int = DEFAULT_CHUNK_OVERLAP,
    text_col: str = "text",
) -> DataFrame:
    """Fixed-size overlapping token windows per document — the chunking
    step of RAG indexing and long-document training (stride =
    chunk_tokens - overlap; each chunk repeats the previous chunk's last
    `overlap` tokens so no boundary context is lost).

    Tokens are the whitespace tokens of the lower-trimmed text (the same
    convention as textstats.token_counts). Window rule: starts at
    0, stride, 2*stride, ...; a tail start is kept only while it
    contributes at least one token beyond the overlap (start < n -
    overlap), so a final window that would be pure repetition is dropped.
    Every doc yields >= 1 chunk (an empty text is one empty chunk).

    Returns (doc_id, chunk_id, start_tok, n_tokens, chunk_text) with
    chunk_id = start_tok / stride (stable, order-free).

    Scale shape: one codegen projection (split once, starts via
    sequence + filter, text via slice + array_join) and one explode —
    no shuffle, no UDF; runs at scan speed and column-prunes."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    norm = f"trim(lower(coalesce({text_col}, '')))"
    words = f"split({norm}, ' ')"
    starts = (
        f"filter(sequence(0, greatest(size({words}) - 1, 0), {stride}), "
        f"s -> s = 0 OR s < size({words}) - {overlap})"
    )
    exploded = docs.select(
        "doc_id",
        F.expr(words).alias("_ws"),
        F.explode(F.expr(starts)).alias("start_tok"),
    )
    return exploded.select(
        "doc_id",
        (F.col("start_tok") / stride).cast("int").alias("chunk_id"),
        F.col("start_tok").cast("long").alias("start_tok"),
        F.least(
            F.lit(chunk_tokens), F.size("_ws") - F.col("start_tok")
        ).cast("long").alias("n_tokens"),
        F.array_join(
            F.slice(F.col("_ws"), F.col("start_tok") + 1, F.lit(chunk_tokens)),
            " ",
        ).alias("chunk_text"),
    )


def pack_sequences(
    docs_with_tokens: DataFrame,
    seq_len: int = DEFAULT_SEQ_LEN,
    order_col: str = "doc_id",
    token_col: str = "n_tokens",
    n_buckets: int = DEFAULT_N_BUCKETS,
) -> DataFrame:
    """Doc-contiguous packing: documents are concatenated in `order_col`
    order and the stream is cut every `seq_len` tokens; a document belongs
    to the sequence holding its FIRST token (training loaders then split
    boundary-spanning docs locally — that decision needs only this row).

    Adds (offset, seq_id, seq_pos): global token offset, sequence index,
    and position within the sequence. Downstream `groupBy(seq_id)` is
    balanced by construction — every sequence holds ~seq_len tokens."""
    off = global_offsets(docs_with_tokens, order_col, token_col, n_buckets)
    return off.withColumn(
        "seq_id", F.floor(F.col("offset") / seq_len).cast("long")
    ).withColumn("seq_pos", (F.col("offset") % seq_len).cast("long"))
