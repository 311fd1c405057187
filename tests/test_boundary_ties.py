"""k-boundary score-tie stress (VERDICT r4 item 5, third arm).

The corpus is ENGINEERED to tie at the top-k boundary: a cohort of docs
with byte-identical text scores byte-identically for any query they match
(same tf vector, same dl, shared global stats), so with k smaller than the
cohort the k-th rank falls inside a tie plateau. FTS5 keeps a
NONDETERMINISTIC member at an exact boundary tie (physical rowid order —
meaningless in a partitioned engine), so rank-identity at a tie boundary is
defined exactly as bench.assert_rank_identity and the fuzz harness define
it: pairwise-equal score sequences + identical membership for every score
strictly better than the boundary + boundary rows drawn from the tied
cohort. The engine itself must additionally be DETERMINISTIC (score, then
doc_id ascending) — re-running a tied query twice returns identical rows,
and the batch path returns exactly what the per-query path returns.
"""

from __future__ import annotations

import shutil

import pandas as pd
import pytest

from pdfsearch_spark.extract import extract_text
from pdfsearch_spark.index_build import build_index
from pdfsearch_spark.oracle import FTS5Oracle
from pdfsearch_spark.search import SearchEngine

IDX = "/tmp/pdfsearch_boundary_idx"

# 40-doc tie cohort + 10 strictly-better docs + fillers
TIED = ["alpha beta gamma delta epsilon"] * 40
BETTER = ["alpha alpha beta gamma delta"] * 10  # higher tf(alpha), same dl
FILLER = [
    "zeta eta theta",
    "iota kappa lambda epsilon",
    "mu nu xi",
    "omicron pi rho gamma",
]
TEXTS = TIED + BETTER + FILLER

K = 15  # 10 strictly-better + 5 of the 40-way tie -> boundary inside the tie

QUERIES = [
    "alpha",
    '"beta gamma"',
    "alpha OR epsilon",
    "gam*",
    "NEAR(alpha delta, 4)",
]


@pytest.fixture(scope="module")
def pair(spark):
    urls = [f"http://ties.example/d{i}" for i in range(len(TEXTS))]
    htmls = [f"<html><body><p>{t}</p></body></html>".encode() for t in TEXTS]
    ts = pd.to_datetime("2025-01-01")
    pdf = pd.DataFrame(
        {"url": urls, "warc_ts": ts, "html": htmls, "text": None, "lang": "en"}
    )
    pdf["text"] = [extract_text(h) for h in pdf["html"]]
    oracle = FTS5Oracle()
    oracle.load(pdf)
    pages = spark.createDataFrame(
        pdf[["url", "warc_ts", "html", "text", "lang"]]
    )
    shutil.rmtree(IDX, ignore_errors=True)
    build_index(spark, pages, IDX, n_shards=4)
    yield SearchEngine(spark, IDX), oracle
    shutil.rmtree(IDX, ignore_errors=True)


def _engine_rows(eng, q, k=K):
    rows = (
        eng.search(q, k=k, with_snippets=False)
        .select("doc_id", "score")
        .collect()
    )
    return sorted((r["doc_id"], r["score"]) for r in rows)


@pytest.mark.parametrize("q", QUERIES, ids=lambda q: q[:30])
def test_boundary_tie_rank_identity(pair, q):
    eng, oracle = pair
    o = sorted((r.doc_id, r.score) for r in oracle.search(q, k=K))
    e = _engine_rows(eng, q)
    assert len(o) == len(e), f"{q!r}: {len(o)} vs {len(e)}"
    if not o:
        return
    # score sequences pairwise identical (this includes the tied plateau)
    for (_, osc), (_, esc) in zip(o, e):
        assert abs(osc - esc) < 1e-9, f"{q!r}: {osc} vs {esc}"
    # the boundary actually sits inside a tie for the tie-bearing queries
    boundary = o[-1][1]
    o_strict = {d for d, s in o if s < boundary - 1e-9}
    e_strict = {d for d, s in e if s < boundary - 1e-9}
    assert o_strict == e_strict, f"{q!r}: strict membership differs"
    # boundary members on BOTH sides come from the same equal-score cohort:
    # every boundary doc's full-corpus score equals the boundary score
    full_o = {r.doc_id: r.score for r in oracle.search(q, k=len(TEXTS))}
    for d, s in e:
        if abs(s - boundary) < 1e-9:
            assert abs(full_o[d] - boundary) < 1e-9, (
                f"{q!r}: engine boundary doc {d} is not a true tie member"
            )


def test_tie_plateau_really_spans_boundary(pair):
    """Sanity of the fixture itself: for 'alpha' at k=15 the boundary score
    must have MORE tied docs corpus-wide than slots left after the strictly
    better ones — otherwise this file stresses nothing."""
    _, oracle = pair
    full = [r.score for r in oracle.search("alpha", k=len(TEXTS))]
    topk = full[:K]
    boundary = topk[-1]
    n_tied_corpus = sum(1 for s in full if abs(s - boundary) < 1e-9)
    n_tied_topk = sum(1 for s in topk if abs(s - boundary) < 1e-9)
    assert n_tied_corpus > n_tied_topk, (n_tied_corpus, n_tied_topk)


def test_boundary_tie_engine_deterministic(pair):
    """Unlike FTS5 (physical rowid order at ties), the engine's tie-break is
    total (score asc, doc_id asc): byte-identical results on every rerun."""
    eng, _ = pair
    for q in QUERIES:
        assert _engine_rows(eng, q) == _engine_rows(eng, q), q


def test_boundary_tie_batch_matches_search(pair):
    """search_batch must pick the SAME deterministic boundary members as
    the per-query path (rank-identity between the engine's own two paths
    is exact equality, not just tie-aware equality)."""
    eng, _ = pair
    rows = eng.search_batch(QUERIES, k=K).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    for qid, q in enumerate(QUERIES):
        assert sorted(by_q.get(qid, [])) == _engine_rows(eng, q), q
