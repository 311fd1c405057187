"""Stateful streaming dedup: applyInPandasWithState over a crawl stream.

A continuous crawl re-fetches the same page text from many URLs over time;
batch-side dedup (pipeline.dedup.exact_dedup) can only see one batch. This
operator keeps a per-fingerprint state-store entry so a page body that was
emitted in ANY earlier micro-batch is dropped in every later one:

    readStream(pages) → md5 fingerprint → groupBy(fingerprint)
      → applyInPandasWithState(emit-if-first-seen)  → foreachBatch append

Scale shape: state is keyed by a 32-hex md5 — the state store is hash-
partitioned by key across executors (RocksDB-backed on a real cluster), one
tiny record per distinct body ever seen, no skew (fingerprints are uniform).
Within a batch the canonical row is the minimum (url, warc_ts); across
batches, first-seen wins — both rules are deterministic under replay, and
the stream checkpoint + state versioning make a replayed micro-batch emit
exactly the same rows (delivery composes with an idempotent sink the same
way stream_refresh's segment appends do).

The reference has no streaming surface (its build is a one-shot batch,
search/serializer.go:22-93); this extends the task brief's training-data
pipeline (dedup) to the streaming ingest path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from .ingest import PAGES_SCHEMA

DEDUP_OUT_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("fingerprint", StringType()),
    ]
)

# per-fingerprint state: how many rows with this body have ever been seen
DEDUP_STATE_SCHEMA = StructType([StructField("n_seen", LongType())])


def _dedup_fn(key, pdfs, state):
    """One call per (micro-batch, fingerprint): emit the canonical row iff
    this fingerprint has never been seen, then advance the seen-count."""
    (n_seen,) = state.get if state.exists else (0,)
    first = None
    n_batch = 0
    for pdf in pdfs:
        n_batch += len(pdf)
        if len(pdf):
            cand = pdf.sort_values(["url", "warc_ts"]).head(1)
            if first is None or (
                tuple(cand.iloc[0][["url", "warc_ts"]])
                < tuple(first.iloc[0][["url", "warc_ts"]])
            ):
                first = cand
    state.update((n_seen + n_batch,))
    if n_seen == 0 and first is not None:
        yield first[["url", "warc_ts", "text", "lang", "fingerprint"]]


def stream_exact_dedup(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Start a streaming query appending first-seen pages to ``out_dir``.

    Returns the StreamingQuery. ``available_now=True`` drains what's in
    ``pages_dir`` then stops; the checkpoint + state store persist across
    restarts, so a later run continues deduping against everything already
    emitted.
    """
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    stream = reader.parquet(pages_dir).withColumn(
        "fingerprint", F.md5(F.expr("cast(coalesce(text, '') as binary)"))
    )
    deduped = stream.groupBy("fingerprint").applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )

    def _batch(df: DataFrame, epoch_id: int) -> None:
        df.write.mode("append").parquet(out_dir)

    return (
        deduped.writeStream.foreachBatch(_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        if available_now
        else deduped.writeStream.foreachBatch(_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
