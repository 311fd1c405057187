"""JSONL, WARC, and WET source connectors: schema enforcement, corrupt-line
tolerance, WARC round-trip (plain + gzip multi-member + garbage resync),
WET conversion-record extraction with multi-byte UTF-8 fidelity."""

from __future__ import annotations

import gzip
import json
import os

import pytest

from pdfsearch_spark.sources.jsonl import (
    corrupt_rate,
    read_docs_jsonl,
)
from pdfsearch_spark.sources.warc import parse_warc, read_warc, warc_bytes
from pdfsearch_spark.sources.wet import read_wet, wet_bytes


# ------------------------------------------------------------------ jsonl


def _write_jsonl(tmp_path, lines):
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(lines) + "\n", encoding="utf-8")
    return str(tmp_path)


GOOD = [
    {"doc_id": 1, "text": "hello world", "lang": "en", "source": "a", "n_chars": 11},
    {"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "b", "n_chars": 7},
    {"doc_id": 3, "text": None, "lang": "de", "source": "c", "n_chars": 0},
]


def test_jsonl_reads_good_rows_with_declared_schema(spark, tmp_path):
    path = _write_jsonl(tmp_path, [json.dumps(r) for r in GOOD])
    got = {r["doc_id"]: r for r in read_docs_jsonl(spark, path).collect()}
    assert sorted(got) == [1, 2, 3]
    assert got[1]["text"] == "hello world" and got[1]["n_chars"] == 11
    assert got[3]["text"] is None
    assert read_docs_jsonl(spark, path).schema["doc_id"].dataType.typeName() == "long"


def test_jsonl_corrupt_lines_are_metrics_not_exceptions(spark, tmp_path):
    lines = [json.dumps(GOOD[0]), "{truncated", "not json at all",
             json.dumps(GOOD[1]),
             json.dumps({"text": "valid json, no key"})]
    path = _write_jsonl(tmp_path, lines)
    clean = read_docs_jsonl(spark, path)
    assert sorted(r["doc_id"] for r in clean.collect() if r["doc_id"]) == [1, 2]
    with_c = read_docs_jsonl(spark, path, keep_corrupt=True)
    stats = corrupt_rate(with_c).collect()[0]
    assert stats["n_rows"] == 5 and stats["n_corrupt"] == 2
    assert stats["n_missing_key"] == 1
    assert stats["n_complete"] == 2  # GOOD[0] and GOOD[1] have every field
    assert abs(stats["corrupt_rate"] - 0.4) < 1e-9
    bad = [r["_corrupt_record"] for r in with_c.collect() if r["_corrupt_record"]]
    assert "{truncated" in bad and "not json at all" in bad


# ------------------------------------------------------------------ warc


RECS = [
    {"record_id": "<urn:doc:1>", "warc_type": "response",
     "target_uri": "https://a/1", "payload": b"hello warc"},
    {"record_id": "<urn:doc:2>", "warc_type": "response",
     "target_uri": "https://a/2", "payload": "café 中".encode()},
    {"record_id": "<urn:meta:3>", "warc_type": "warcinfo",
     "target_uri": None, "payload": b""},
    # payload that CONTAINS the record separator and a fake version line:
    # Content-Length framing must win over any delimiter scanning
    {"record_id": "<urn:doc:4>", "warc_type": "response",
     "target_uri": "https://a/4",
     "payload": b"x\r\n\r\nWARC/1.0\r\nfake: header\r\n\r\ny"},
]


def test_parse_warc_roundtrip_pure():
    rows = parse_warc(warc_bytes(RECS), "f.warc")
    assert len(rows) == len(RECS)
    for r, exp in zip(rows, RECS):
        assert r[1] == exp["record_id"]
        assert r[2] == exp["warc_type"]
        assert r[3] == exp["target_uri"]
        assert r[4] == len(exp["payload"])
        assert r[5] == exp["payload"]


def test_parse_warc_gzip_multimember_and_garbage_resync():
    # per-record gzip members, concatenated — the standard .warc.gz layout
    gz = b"".join(gzip.compress(warc_bytes([r])) for r in RECS)
    assert [r[1] for r in parse_warc(gz)] == [r["record_id"] for r in RECS]
    # garbage between records: resync on the next WARC/ magic
    dirty = (
        b"JUNK" + warc_bytes([RECS[0]]) + b"\x00\x01garbage" + warc_bytes([RECS[1]])
    )
    got = parse_warc(dirty)
    assert [r[1] for r in got] == ["<urn:doc:1>", "<urn:doc:2>"]


def test_read_warc_spark_scan(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(warc_bytes(RECS[:2]))
    (tmp_path / "b.warc.gz").write_bytes(gzip.compress(warc_bytes(RECS[2:])))
    (tmp_path / "ignored.txt").write_text("not a warc")
    df = read_warc(spark, str(tmp_path))
    rows = {r["record_id"]: r for r in df.collect()}
    assert sorted(rows) == sorted(r["record_id"] for r in RECS)
    assert rows["<urn:doc:2>"]["payload"] == RECS[1]["payload"]
    assert rows["<urn:doc:2>"]["warc_file"] == "a.warc"
    assert rows["<urn:meta:3>"]["warc_file"] == "b.warc.gz"
    assert rows["<urn:doc:4>"]["content_length"] == len(RECS[3]["payload"])
    # responses only, filtered relationally after the parse
    assert df.filter("warc_type = 'response'").count() == 3


def test_parse_warc_gz_range_pure():
    """Pure-function range semantics: every member is owned by exactly one
    range (the one holding its first compressed byte), straddling members
    complete via the tail, and the union over any split equals the
    single-shot parse."""
    from pdfsearch_spark.sources.warc import parse_warc_gz_range

    members = [gzip.compress(warc_bytes([r])) for r in RECS]
    gz = b"".join(members)
    full = [r[1] for r in parse_warc(gz)]
    # try every byte position as the split point of a 2-range split
    for cut in range(1, len(gz)):
        a = parse_warc_gz_range(gz[:cut] + gz[cut:], cut)  # range [0, cut)
        b = parse_warc_gz_range(gz[cut:], len(gz) - cut)   # range [cut, end)
        got = [r[1] for r in a] + [r[1] for r in b]
        assert sorted(got) == sorted(full), cut
    # a member longer than the tail window is dropped, not a crash
    short = parse_warc_gz_range(gz[: len(members[0]) // 2], len(gz))
    assert short == []


def test_read_warc_split_matches_single_task(spark, tmp_path):
    """A >2-member archive split across tasks yields identical records to
    the single-task parse; whole-file-gzip and uncompressed files degrade
    to one owning range."""
    from pdfsearch_spark.sources.warc import read_warc_split

    members = b"".join(gzip.compress(warc_bytes([r])) for r in RECS)
    (tmp_path / "multi.warc.gz").write_bytes(members * 3)  # 12 members
    (tmp_path / "whole.warc.gz").write_bytes(gzip.compress(warc_bytes(RECS)))
    (tmp_path / "plain.warc").write_bytes(warc_bytes(RECS[:2]))

    single = read_warc(spark, str(tmp_path)).collect()
    # split_bytes tiny -> many ranges per file; members straddle boundaries
    split = read_warc_split(spark, str(tmp_path), split_bytes=200).collect()

    def key(rows):
        return sorted((r["warc_file"], r["record_id"], bytes(r["payload"])) for r in rows)

    assert key(split) == key(single)
    assert len(split) == 12 + len(RECS) + 2
    # sanity: the tiny split really produced multi-range parallelism
    from pdfsearch_spark.sources.warc import _GZ_MAGIC  # noqa: F401
    assert (tmp_path / "multi.warc.gz").stat().st_size > 3 * 200


# ------------------------------------------------------------------ wet


WET_DOCS = [
    {"url": "https://a/1", "text": "plain extracted text"},
    {"url": "https://a/2", "text": "café naïve 查询 — multi-byte\nsecond line"},
    {"url": "https://a/3", "text": ""},
]


def test_read_wet_extracts_conversion_records(spark, tmp_path):
    # a WET file plus interleaved non-conversion records that must drop out
    mixed = warc_bytes(
        [
            {"record_id": "<urn:info>", "warc_type": "warcinfo",
             "target_uri": None, "payload": b"crawl metadata"},
        ]
    ) + wet_bytes(WET_DOCS[:2])
    (tmp_path / "a.wet").write_bytes(mixed)
    (tmp_path / "b.wet.gz").write_bytes(gzip.compress(wet_bytes(WET_DOCS[2:])))
    df = read_wet(spark, str(tmp_path))
    rows = {r["url"]: r for r in df.collect()}
    assert sorted(rows) == [d["url"] for d in WET_DOCS]
    # multi-byte UTF-8 decodes to the exact original string; n_chars counts
    # characters (15 + space + dash... post-decode), not payload bytes
    assert rows["https://a/2"]["text"] == WET_DOCS[1]["text"]
    assert rows["https://a/2"]["n_chars"] == len(WET_DOCS[1]["text"])
    assert rows["https://a/3"]["text"] == "" and rows["https://a/3"]["n_chars"] == 0
    # the decode/filter/length are Catalyst expressions — no second Python
    # stage in the plan beyond the one WARC mapInPandas hop
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1


# ------------------------------------------------- parser robustness (fuzz)


def test_parse_warc_never_raises_on_garbage():
    """Random byte soup, truncated records, and corrupted headers must never
    raise — a 100 TB ingest treats bad bytes as data loss, not job loss —
    and every parsed record must still satisfy the framing invariants."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.binary(max_size=400))
    def run(buf):
        rows = parse_warc(buf, "fuzz")
        for r in rows:
            assert r[4] == len(r[5])  # content_length == actual payload len

    run()


def test_parse_warc_truncated_and_corrupt_headers():
    good = warc_bytes(
        [{"record_id": "<a>", "warc_type": "response",
          "target_uri": "https://x/1", "payload": b"payload bytes"}]
    )
    # truncation at every prefix length parses without raising, and any
    # record it does produce is the intact one
    for cut in range(len(good)):
        rows = parse_warc(good[:cut], "t")
        assert len(rows) <= 1
    # a record with a garbled Content-Length is skipped; the NEXT intact
    # record is still recovered by the WARC/ resync
    bad = good.replace(b"Content-Length: 13", b"Content-Length: NaN")
    assert parse_warc(bad, "t") == []
    assert [r[1] for r in parse_warc(bad + good, "t")] == ["<a>"]
    # a gzip-magic prefix on garbage is a corrupt archive, not a crash
    assert parse_warc(b"\x1f\x8b" + b"\x00" * 50, "t") == []
    assert parse_warc(gzip.compress(good)[:20], "t") == []  # truncated .gz


# -------------------------------------------------------------- delimited


def test_tsv_corrupt_classes_and_full_row_parse(spark, tmp_path):
    """All corrupt classes flagged — including wrong-column-count lines,
    which PERMISSIVE only validates when the plan reads every column (the
    pruning trap corrupt_rate's n_complete metric forces past)."""
    from pdfsearch_spark.sources.delimited import read_docs_delimited

    lines = [
        "1\thello world\ten\tsrc0\t11",
        "notanumber\tbad id\ten\tsrc2\t5",
        "3\ttoo few",
        "4\ttoo\tmany\tcols\there\textra\tcol",
        "\tno key\tde\tsrc3\t6",
    ]
    p = tmp_path / "docs.tsv"
    p.write_text("\n".join(lines) + "\n", encoding="utf-8")
    clean = read_docs_delimited(spark, str(tmp_path)).collect()
    assert sorted(r["doc_id"] for r in clean if r["doc_id"]) == [1]
    stats = corrupt_rate(
        read_docs_delimited(spark, str(tmp_path), keep_corrupt=True)
    ).collect()[0]
    assert stats["n_rows"] == 5 and stats["n_corrupt"] == 3
    assert stats["n_missing_key"] == 1 and stats["n_complete"] == 1
