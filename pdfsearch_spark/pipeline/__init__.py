"""Large-scale training-data pipeline operators over the document corpus.

Beyond the reference's search capabilities (SURVEY.md §2), these are the
operations a web-scale training-data pipeline needs: deduplication (exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding cosine), similarity search
(brute-force + LSH-bucketed ANN + IVF with k-means training), text analysis
(language id, quality
scoring, repetition/Gopher-style gates, token counting, fingerprinting),
corpus curation (composed dedup+quality+repetition verdicts), and multimodal
column plumbing.

Design rules (100 TB discipline):
- everything stays in whole-stage-codegen Spark SQL expressions (split /
  transform / aggregate / md5) — no Python in the hot path except the two
  explicitly-documented pandas-UDF ops (winnowing, media feature stub);
- pairwise ops are LSH/bucket-blocked so the self-join never goes quadratic
  in the corpus (exact all-pairs variants exist for validation only);
- all hashing is md5-based and engine-portable, so every op here is
  oracle-checked value-for-value against DuckDB running plain ANSI SQL.
"""

from . import curate, dedup, multimodal, similarity, textstats  # noqa: F401
