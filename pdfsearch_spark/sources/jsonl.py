"""JSONL document source: schema-enforced, corrupt-line-tolerant.

A crawl dump is never clean — truncated lines, schema drift, stray
non-JSON. The contract here is the one a 100 TB ingest needs:

- the schema is DECLARED, not inferred: inference is a full extra pass over
  the data (Spark samples, but any sampled inference is both a second scan
  and nondeterministic under data drift);
- corrupt lines never kill the job: PERMISSIVE mode parks the raw line in
  `_corrupt_record` and nulls the data columns, so bad input is a metric,
  not an exception (cf. the reference's malformed-PDF handling,
  search/collect.go:19-21 — count and continue, never abort the build);
- the reader is a plain DataSource scan: partitioned by input split like
  any text file, pruned/pushed like any other scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

CORRUPT_COL = "_corrupt_record"

DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def read_docs_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType = DOCS_SCHEMA,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read a JSONL documents dump with the declared `schema`.

    Returns only well-formed rows unless keep_corrupt=True, in which case
    the corrupt rows ride along with their raw line in `_corrupt_record`
    (data columns null) for quarantine sinks / corrupt-rate metrics.
    """
    full = StructType(
        schema.fields + [StructField(CORRUPT_COL, StringType())]
    )
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    if keep_corrupt:
        return df
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def corrupt_rate(
    df_with_corrupt: DataFrame, key_col: str = "doc_id"
) -> DataFrame:
    """(n_rows, n_corrupt, n_missing_key, n_complete, corrupt_rate) over a
    keep_corrupt=True read — one aggregate, the ingest-health metrics a
    pipeline alerts on. n_missing_key counts parsed rows without a primary
    key (schema-drift symptom); n_complete counts rows with EVERY data
    column populated.

    n_complete is also load-bearing for correctness, not just a metric:
    PERMISSIVE corrupt detection is column-pruning-dependent — the CSV
    parser validates only the columns the plan requests, so an aggregate
    reading just (corrupt, key) silently misses wrong-column-count lines
    (observed: 12 of 24 corrupt lines flagged). Referencing every data
    column here forces the full-row parse that makes n_corrupt complete.
    (A query referencing ONLY the corrupt column is rejected outright:
    UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN.)
    """
    data_cols = [c for c in df_with_corrupt.columns if c != CORRUPT_COL]
    all_present = F.col(CORRUPT_COL).isNull() & F.forall(
        F.array(*[F.col(c).isNotNull() for c in data_cols]), lambda x: x
    )
    return df_with_corrupt.agg(
        F.count("*").alias("n_rows"),
        F.count(CORRUPT_COL).alias("n_corrupt"),
        (
            F.count(F.when(F.col(CORRUPT_COL).isNull(), 1))
            - F.count(
                F.when(F.col(CORRUPT_COL).isNull(), F.col(key_col))
            )
        ).alias("n_missing_key"),
        F.count(F.when(all_present, 1)).alias("n_complete"),
        F.round(
            F.count(CORRUPT_COL) / F.count("*"), 6
        ).alias("corrupt_rate"),
    )
