"""Physical-plan audit over every driver entry — the scale-regression gate.

Correctness tests prove the answers; this file proves the PLANS stay the
ones we'd want on a 1000-executor cluster: no cartesian product ever
(broadcast single-row scalar crosses are fine — they're
BroadcastNestedLoopJoin, not CartesianProduct), point lookups and term
scans keep their predicates pushed into the parquet scan, and projections
prune the wide `text` column wherever the query doesn't need it.

Planning only (no job execution): `queryExecution().executedPlan()` is
enough to catch a join-strategy or pushdown regression, so the whole sweep
stays cheap even though it covers all entries.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def entries(spark):
    import __spark_entry__ as entrymod

    return {
        name: fn(spark, SF) for name, fn in entrymod.queries().items()
    }


def test_no_cartesian_product_anywhere(entries):
    """A CartesianProduct node means two corpus-sized sides got crossed —
    instant death at scale. (Scalar crosses compile to
    BroadcastNestedLoopJoin over a 1-row side and are allowed.)"""
    offenders = {
        name: plan
        for name, df in entries.items()
        if "CartesianProduct" in (plan := _plan(df))
    }
    assert not offenders, f"cartesian products in: {sorted(offenders)}"


def test_point_lookup_pushes_doc_id(entries):
    plan = _plan(entries["q_point_lookup"])
    assert "PushedFilters: [" in plan
    assert "EqualTo(doc_id" in plan, plan


def test_catalog_scan_prunes_text_column(entries):
    """S10 needs (doc_id, lang, source, n_chars) — reading `text` too would
    multiply scan bytes by ~50x for nothing."""
    plan = _plan(entries["q_catalog_scan"])
    scan_lines = [l for l in plan.splitlines() if "FileScan" in l]
    assert scan_lines and all("text" not in l for l in scan_lines), plan


def test_in_filter_pushes_membership(entries):
    plan = _plan(entries["q_in_filter"])
    assert "PushedFilters: [" in plan and "In(" in plan, plan


def test_tfidf_broadcasts_vocab_side(entries):
    """The df-per-term table must come back as a broadcast: a shuffle join
    keyed by the Zipf-skewed term column is the classic skew trap."""
    plan = _plan(entries["q_tfidf_topk"])
    assert "BroadcastHashJoin [term" in plan, plan
    assert "WindowGroupLimit" in plan, plan  # partial top-k before shuffle


def test_unigram_broadcasts_vocab_side(entries):
    plan = _plan(entries["q_unigram_logprob"])
    assert "BroadcastHashJoin [term" in plan, plan


def test_decontaminate_broadcasts_eval_grams(entries):
    """The eval side is benchmark-sized; the training side must never be
    shuffled by gram hash."""
    plan = _plan(entries["q_decontaminate"])
    assert "BroadcastHashJoin [gh" in plan, plan


def test_lsh_pairs_join_is_bucket_keyed(entries):
    """Near-dup candidates come from the banded-bucket equi-join, never an
    all-pairs comparison: the join keys must include the band/bucket."""
    plan = _plan(entries["q_minhash_lsh_pairs"])
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or (
        "BroadcastHashJoin" in plan
    ), plan
    import re

    keys = re.findall(r"(?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \[([^\]]*)\]", plan)
    assert any("band" in k or "bucket" in k or "sig" in k for k in keys), keys


def test_shuffle_free_per_doc_ops_stay_shuffle_free(entries):
    """textstats ops are one codegen projection over the scan; an Exchange
    appearing in them means someone added an accidental aggregation.
    (The read-side repartition of the 1-2-file testdata is the documented
    exception — it disappears on real multi-file tables, so we assert no
    exchange OTHER than the input RoundRobin repartition.)"""
    import re

    for name in ("q_lang_id", "q_quality", "q_token_counts",
                 "q_fingerprints", "q_pii_scrub", "q_split_assign"):
        plan = _plan(entries[name])
        exchanges = re.findall(r"Exchange (\w+)", plan)
        assert all(e == "RoundRobinPartitioning" for e in exchanges), (
            name,
            exchanges,
        )
