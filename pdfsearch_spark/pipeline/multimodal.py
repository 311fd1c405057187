"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The decode step is STUBBED (no image/audio libraries in this environment —
decode_media raises NotImplementedError, exactly as documented in the build
brief); everything Spark-side is real and tested: schema, partitioning, the
mapInPandas batch shape, and a deterministic fake feature extractor
(byte-histogram) standing in for a real CNN/fbank featurizer.

At 100 TB the shape matters more than the stub: media bytes travel as
parquet binary, never through the driver; feature extraction is Arrow-batched
mapInPandas over row groups; downstream ops (dedup on features, ANN) reuse
pipeline.similarity on the feature column unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

N_BINS = 16

MEDIA_SCHEMA = (
    "doc_id long, media binary, media_type string, n_bytes long, checksum string"
)


def attach_media(docs: DataFrame) -> DataFrame:
    """Synthesize an opaque media column from the text bytes (deterministic
    stand-in for stored image/audio payloads) + typed metadata."""
    bin_col = F.expr("cast(coalesce(text, '') as binary)")
    return docs.select(
        "doc_id",
        bin_col.alias("media"),
        F.lit("application/octet-stream").alias("media_type"),
        F.length(bin_col).alias("n_bytes"),
        F.md5(bin_col).alias("checksum"),
    )


def decode_media(media: bytes, media_type: str):
    """Real image/audio decode — NOT IMPLEMENTED in this environment.

    On a cluster with codec libs installed this is where PIL/torchaudio/etc.
    would decode; the Spark plumbing around it (byte_histogram_features) is
    real and uses this signature.
    """
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "container; byte_histogram_features provides the deterministic fake"
    )


def _histogram(buf: bytes, n_bins: int) -> list[float]:
    if not buf:
        return [0.0] * n_bins
    arr = np.frombuffer(buf, dtype=np.uint8)
    hist = np.bincount(arr >> 4 if n_bins == 16 else arr % n_bins, minlength=n_bins)
    # full-precision IEEE division (count/len): downstream consumers round at
    # their own precision; rounding here would make cross-engine comparison
    # depend on numpy's banker's rounding
    return (hist / len(arr)).astype(np.float64).tolist()


def byte_histogram_features(media_df: DataFrame, n_bins: int = N_BINS) -> DataFrame:
    """(doc_id, features array<double>): deterministic fake featurizer —
    normalized 16-bin byte histogram, Arrow-batched via mapInPandas. The
    batch shape and schema are exactly what a real decoder would use."""

    def fn(it):
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "features": [
                        _histogram(m if m is not None else b"", n_bins)
                        for m in pdf["media"]
                    ],
                }
            )

    return media_df.select("doc_id", "media").mapInPandas(
        fn, schema="doc_id long, features array<double>"
    )
