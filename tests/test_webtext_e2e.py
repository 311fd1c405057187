"""End-to-end webtext curation pipeline over a synthetic WET crawl:
read_wet → line_dedup (boilerplate removal) → pii_scrub → exact_dedup →
pack_sequences — the ops chained the way a real corpus build chains them,
asserting the contracts compose (not just that each op passes alone)."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from pdfsearch_spark.pipeline.curate import line_dedup, pii_scrub
from pdfsearch_spark.pipeline.dedup import exact_dedup
from pdfsearch_spark.pipeline.pack import pack_sequences
from pdfsearch_spark.sources.wet import read_wet, wet_bytes

BANNER = "accept all cookies to continue reading this site"


def _crawl_docs():
    docs = []
    for i in range(18):
        body = [
            f"unique opening sentence for document number {i}",
            BANNER,  # boilerplate in EVERY doc -> removed everywhere
            f"body text {i} with detail contact admin{i}@example.com now",
        ]
        if i % 6 == 0:
            body.append("hi")  # short line: ineligible, survives
        docs.append(
            {"url": f"https://site{i % 9}.test/p{i}", "text": "\n".join(body)}
        )
    # two exact duplicates (post-scrub identical) of doc 0's cleaned text
    for j, host in enumerate(["dup-a.test", "dup-b.test"]):
        d = dict(docs[0])
        d = {
            "url": f"https://{host}/copy{j}",
            "text": docs[0]["text"].replace("admin0@", f"other{j}@"),
        }
        docs.append(d)
    return docs


def test_webtext_pipeline_end_to_end(spark, tmp_path):
    docs = _crawl_docs()
    (tmp_path / "a.wet").write_bytes(wet_bytes(docs[:10]))
    (tmp_path / "b.wet.gz").write_bytes(gzip.compress(wet_bytes(docs[10:])))

    raw = read_wet(spark, str(tmp_path)).withColumn(
        "doc_id", F.xxhash64("url")
    )
    assert raw.count() == len(docs)

    # 1. corpus-level boilerplate line removal (threshold 3: doc 0's
    # opening line legitimately appears in 3 docs via the two near-copies
    # and must survive; the banner appears in all 20 and must not)
    ld = line_dedup(raw, min_line_chars=10, max_dup_docs=3)
    cleaned = {r["doc_id"]: r for r in ld.collect()}
    assert all(BANNER not in r["clean_text"] for r in cleaned.values())
    assert all(r["n_dropped"] == 1 for r in cleaned.values())
    # non-boilerplate content survived
    assert all("unique opening sentence" in r["clean_text"] for r in cleaned.values())

    # 2. PII scrub on the cleaned text
    sc = pii_scrub(ld, text_col="clean_text")
    scrubbed = {r["doc_id"]: r for r in sc.collect()}
    assert all("@" not in r["clean_text"] for r in scrubbed.values())
    assert all(r["n_email"] == 1 for r in scrubbed.values())

    # 3. exact dedup after scrubbing: the two copies of doc 0 (which
    # differed ONLY in the email address) now collapse with the original
    dd = exact_dedup(
        sc.select("doc_id", F.col("clean_text").alias("text"))
    )
    groups = {r["doc_id"]: r for r in dd.collect()}
    dup_ids = [
        r["doc_id"] for r in raw.collect()
        if "dup-" in r["url"] or r["url"].endswith("/p0")
    ]
    assert {groups[d]["group_size"] for d in dup_ids} == {3}
    assert sum(groups[d]["is_canonical"] for d in dup_ids) == 1
    kept = dd.filter("is_canonical").select("doc_id")
    assert kept.count() == len(docs) - 2

    # 4. pack the surviving docs into training sequences
    toks = (
        sc.join(kept, "doc_id")
        .select(
            "doc_id",
            F.size(F.split(F.col("clean_text"), " ")).cast("long").alias(
                "n_tokens"
            ),
        )
    )
    packed = pack_sequences(toks, seq_len=64, n_buckets=4).collect()
    assert len(packed) == len(docs) - 2
    # offsets form an exclusive prefix sum: max(offset) + its tokens ==
    # total tokens, and every seq_id below the last is fully dense
    total = sum(r["n_tokens"] for r in packed)
    last = max(packed, key=lambda r: r["offset"])
    assert last["offset"] + last["n_tokens"] == total
    seq_ids = {r["seq_id"] for r in packed}
    assert seq_ids == set(range(max(seq_ids) + 1))
