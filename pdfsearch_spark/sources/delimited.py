"""Delimited-text (CSV/TSV) document source — same contract as the JSONL
connector (sources/jsonl.py): the schema is DECLARED (no inference pass),
and malformed lines are quarantined by PERMISSIVE mode into
`_corrupt_record` rather than killing the job, so `corrupt_rate` works
unchanged on the keep_corrupt frame. TSV dumps are the other format
document corpora commonly ship in (one doc per line, tab-separated).

The reader is a plain DataSource scan: partitioned by input split,
pruned/pushed like any other file scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType, StructField, StructType

from pdfsearch_spark.sources.jsonl import CORRUPT_COL, DOCS_SCHEMA


def read_docs_delimited(
    spark: SparkSession,
    path: str,
    schema: StructType = DOCS_SCHEMA,
    sep: str = "\t",
    header: bool = False,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read a delimited documents dump with the declared `schema`.

    Corrupt lines (wrong column count, type-cast failures) ride along in
    `_corrupt_record` with data columns null when keep_corrupt=True;
    otherwise only well-formed rows are returned."""
    full = StructType(
        schema.fields + [StructField(CORRUPT_COL, StringType())]
    )
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("sep", sep)
        .option("header", str(header).lower())
        .csv(path)
    )
    if keep_corrupt:
        return df
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
