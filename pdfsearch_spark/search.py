"""Query-side engine: FTS5-grammar search over the sharded index.

Spark lifecycle (SURVEY.md §3.B): parse/plan on the driver → shard-pruned,
term-pruned parquet scan of ``postings`` (predicate pushdown on the sorted
``term`` column) → per-shard applyInPandas match+score (shuffle-free: all of
a doc's postings are in its shard) → global ``orderBy(score, doc_id).limit(k)``
(TakeOrderedAndProject over ≤ shards×k pre-reduced rows) → point lookup into
the doc store (column-pruned) for display fields → snippet UDF over ≤ k rows.

Two physical strategies, picked per query shape:

- FAST path (all phrases are plain single terms — the common case): global
  dfs come from the postings table's own (term, df) metadata columns before
  the scan (format 6: no separate term_stats table — the pruned dictionary
  read hits the same sorted-term row groups the scoring scan does, and the
  ≤ shards×terms per-shard rows sum driver-side), so each shard scores
  locally and emits only its top-k. Network cost: shards×k tiny rows.
- GENERAL path (phrase / prefix / NEAR / anchor): per-phrase global df is
  only known after matching, so shards emit matched rows (doc_id, dl,
  visible-tf vector) plus one df-sentinel row; dfs reduce to idfs, and
  scoring runs as a whole-stage-codegen Spark expression over the matched
  rows — no second pass over postings.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from .analyzer import tokenize, unicode61_tokens
from .index_build import INDEX_FORMAT, shard_of, table_dir
from .query.parser import Node, Phrase, QuerySyntaxError, parse_query
from .query.scorer import K1, B, bm25_scores, idf_of, score_shard, wand_shard_topk

RESULT_SCHEMA = (
    "doc_id long, part int, title string, text string, base_name string, score double"
)


class SearchEngine:
    def __init__(self, spark: SparkSession, index_dir: str) -> None:
        self.spark = spark
        self.index_dir = index_dir
        st = spark.read.parquet(os.path.join(index_dir, "stats")).collect()[0]
        fmt = st.asDict().get("format")
        if fmt != INDEX_FORMAT:
            raise ValueError(
                f"index format {fmt!r} != reader format {INDEX_FORMAT}; rebuild the index"
            )
        self.n_docs = st["n_docs"]
        self.avgdl = st["avgdl"]
        self.n_shards = st["n_shards"]
        # table paths resolve through the stats epoch (compaction's
        # versioned-root commit): this engine is bound to one complete
        # epoch snapshot for its lifetime
        self.epoch = int(st["epoch"])
        self._postings = spark.read.parquet(
            table_dir(index_dir, "postings", self.epoch)
        )
        # The term dictionary is every query's first hop (df lookup). It is
        # the postings table's own (term, df) metadata columns — format 6
        # materializes no separate term_stats table — read pruned: term is
        # the sort key within each postings file, so parquet row-group
        # min/max stats prune In/StartsWith exactly like the scoring scan's
        # predicate. At web scale this is the RIGHT shape too: each
        # executor's dictionary rows live beside its shards (no global
        # vocabulary table to build, ship, or refresh), and the driver sums
        # the ≤ shards×terms returned rows.
        self._dict = self._postings.select("term", "df")
        self._doc_text = spark.read.parquet(
            table_dir(index_dir, "doc_text", self.epoch)
        )
        # the narrow doc catalog == column-pruned doc_text (text chunks are
        # never read; same partition pruning the former table had)
        self._documents = self._doc_text.drop("text")
        # Driver-side df cache. An engine is bound to one index snapshot
        # (Spark caches the parquet file listing at first action; a refresh
        # needs a new SearchEngine), so term→df results are immutable for
        # this engine's lifetime — repeated query vocabulary skips the
        # dictionary job entirely. Prefixes are deliberately NOT expanded
        # driver-side: expansion happens per shard against the pruned scan
        # (scorer.score_shard), so `a*` over a web-scale vocabulary never
        # materializes millions of terms on the driver.
        self._df_cache: dict[str, int] = {}

    def _dfs_of(self, terms: list[str]) -> dict[str, int]:
        missing = [t for t in terms if t not in self._df_cache]
        if missing:
            # pruned dictionary scan: ≤ shards×segments rows per term come
            # back; global df = their sum (one job, no shuffle — the groupBy
            # happens driver-side over a few hundred ints)
            found: dict[str, int] = {}
            for r in self._dict.filter(F.col("term").isin(missing)).collect():
                found[r["term"]] = found.get(r["term"], 0) + int(r["df"])
            for t in missing:
                self._df_cache[t] = found.get(t, 0)
        return {t: self._df_cache[t] for t in terms}

    # ---- planning -----------------------------------------------------

    def _plan(self, query: str):
        return parse_query(query, tokenize, unicode61_tokens)

    @staticmethod
    def _scan_predicate(phrases: list[Phrase]):
        """(exact terms, prefixes) → pushdown-able postings-scan filter.

        Prefix phrases push ``startswith(pref)`` into the scan itself —
        parquet row-group min/max stats on the sorted ``term`` column prune
        for a StringStartsWith exactly like they do for In, and no term list
        ever lands on the driver."""
        exact: set[str] = set()
        prefixes: set[str] = set()
        for p in phrases:
            if p.col == "unindexed":
                continue
            if p.prefix:
                exact.update(p.terms[:-1])
                prefixes.add(p.terms[-1])
            else:
                exact.update(p.terms)
        if not exact and not prefixes:
            return None
        cond = F.col("term").isin(sorted(exact)) if exact else F.lit(False)
        for pref in sorted(prefixes):
            cond = cond | F.col("term").startswith(pref)
        return cond

    # ---- execution ----------------------------------------------------

    def search(
        self,
        query: str,
        k: int = 200,
        book_ids: list[int] | None = None,
        with_snippets: bool = True,
    ) -> DataFrame:
        """Reference /search semantics (database/database.go:179-204):
        raw grammar string; k = LIMIT (reference: 200); ``book_ids`` = the
        intended Q6 doc-subset filter. Raises QuerySyntaxError (→ HTTP 400 in
        the reference). Empty query → empty result (routes/routes.go:108-110).
        """
        spark = self.spark
        if not query or not query.strip():
            return spark.createDataFrame([], schema=RESULT_SCHEMA)

        tree, phrases = self._plan(query)
        cond = self._scan_predicate(phrases) if tree is not None else None
        if cond is None:
            return spark.createDataFrame([], schema=RESULT_SCHEMA)

        postings = self._postings.filter(cond)

        fast = all(
            len(p.terms) == 1 and not p.prefix and not p.anchored and p.col != "unindexed"
            for p in phrases
        ) and tree_has_no_near(tree)

        if fast:
            scored = self._run_fast(postings, tree, phrases, k, book_ids)
        else:
            scored = self._run_general(postings, tree, phrases, k, book_ids)

        topk_rows = (
            scored.orderBy(F.col("score").asc(), F.col("doc_id").asc()).limit(k).collect()
        )
        if not topk_rows:
            return spark.createDataFrame([], schema=RESULT_SCHEMA)

        # Result assembly over ≤k rows in ONE point-lookup job. Literal id +
        # shard filters push down to parquet (partition pruning on shard,
        # row-group stats pruning on doc_id) — never a join whose OTHER side
        # is a full table scan: broadcasting `documents` or shuffling
        # `doc_text` against a ≤200-row result is exactly the plan that dies
        # at 10^12 docs. The snippet path reads doc_text (which carries
        # base_name precisely so this stays one lookup); the no-snippet path
        # reads the same store column-pruned (text chunks untouched).
        ids = [int(r["doc_id"]) for r in topk_rows]
        scores = [float(r["score"]) for r in topk_rows]
        shards = sorted({shard_of(i, self.n_shards) for i in ids})
        pruned = F.col("shard").isin(shards) & F.col("doc_id").isin(ids)
        if with_snippets:
            rows = (
                self._doc_text.filter(pruned)
                .select("doc_id", "base_name", "text")
                .collect()
            )
            meta = {int(r["doc_id"]): r["base_name"] for r in rows}
            texts = {int(r["doc_id"]): r["text"] for r in rows}
            # snippets are a ≤k-row presentation concern — driver-side pandas,
            # not a cluster stage (reference computes them per emitted row too)
            titles, bodies = self._snippet_pair(
                [texts.get(i, "") for i in ids], tree, phrases, {}
            )
        else:
            meta = {
                int(r["doc_id"]): r["base_name"]
                for r in self._documents.filter(pruned)
                .select("doc_id", "base_name")
                .collect()
            }
            titles = [""] * len(ids)
            bodies = [""] * len(ids)
        out_pdf = pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "part": np.int32(0),
                "title": titles,
                "text": bodies,
                "base_name": [meta.get(i) for i in ids],
                "score": pd.Series(scores, dtype="float64"),
            }
        )
        return spark.createDataFrame(out_pdf, schema=RESULT_SCHEMA)

    def _run_fast(self, postings, tree, phrases, k, book_ids):
        """dfs known a priori → shard-local scoring + per-shard top-k.

        Pure conjunctions (the dominant query shape) additionally run
        block-max WAND: block metadata prunes postings blocks that cannot
        beat the shard's bounded min-heap, so their bytes are never decoded
        (north_rule; SURVEY.md §2.5 Q2). Boolean trees with OR/NOT score
        exhaustively — visible-tf semantics there need every candidate.
        Results are identical either way (tests/test_search.py A/B)."""
        term_list = sorted({p.terms[0] for p in phrases})
        df_rows = self._dfs_of(term_list)
        idfs = np.array(
            [idf_of(df_rows.get(p.terms[0], 0), self.n_docs) for p in phrases]
        )
        n_docs, avgdl = self.n_docs, self.avgdl
        books = np.array(sorted(book_ids), dtype=np.int64) if book_ids else None
        use_wand = tree_is_pure_and(tree)
        phrase_terms = [p.terms[0] for p in phrases]
        empty = lambda: pd.DataFrame(  # noqa: E731
            {"doc_id": pd.Series(dtype="int64"), "score": pd.Series(dtype="float64")}
        )

        def fn(pdf: pd.DataFrame) -> pd.DataFrame:
            if use_wand:
                res = wand_shard_topk(pdf, phrase_terms, idfs, avgdl, k, books)
                if res is None:
                    return empty()
                doc_ids, scores = res
                return pd.DataFrame({"doc_id": doc_ids, "score": scores})
            res = score_shard(pdf, tree, phrases, {}, n_docs, avgdl, None, k)
            if res is None:
                return empty()
            matched, mdl, mvis, _ = res
            if books is not None:
                sel = np.isin(matched, books)
                matched, mdl, mvis = matched[sel], mdl[sel], mvis[sel]
                if len(matched) == 0:
                    return empty()
            scores = bm25_scores(mvis, mdl, idfs, avgdl)
            if len(scores) > k:
                # tie-deterministic truncation: argpartition alone keeps
                # ARBITRARY members of a score plateau crossing the k
                # boundary, making this path disagree with the batch path
                # on boundary docs (tests/test_boundary_ties.py). Order by
                # (score, doc_id) — the same total order as the global
                # reduce — so every path picks identical tie members.
                order = np.lexsort((matched, scores))[:k]
                matched, scores = matched[order], scores[order]
            return pd.DataFrame({"doc_id": matched, "score": scores})

        return postings.groupBy("shard").applyInPandas(fn, schema="doc_id long, score double")

    def _run_general(self, postings, tree, phrases, k, book_ids):
        """Match pass emits rows + df sentinels; scoring is a codegen'd
        Spark expression after the tiny df reduce. Prefix phrases expand
        per shard inside score_shard (no driver-side expansion)."""
        P = len(phrases)
        n_docs, avgdl = self.n_docs, self.avgdl
        books = np.array(sorted(book_ids), dtype=np.int64) if book_ids else None

        def fn(pdf: pd.DataFrame) -> pd.DataFrame:
            empty = pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "dl": pd.Series(dtype="int64"),
                    "vis": pd.Series(dtype="object"),
                    "dfs": pd.Series(dtype="object"),
                    "is_stats": pd.Series(dtype="bool"),
                }
            )
            res = score_shard(pdf, tree, phrases, {}, n_docs, avgdl, None, k)
            if res is None:
                return empty
            matched, mdl, mvis, local_dfs = res
            if books is not None:
                sel = np.isin(matched, books)
                matched, mdl, mvis = matched[sel], mdl[sel], mvis[sel]
            rows = pd.DataFrame(
                {
                    "doc_id": matched,
                    "dl": mdl,
                    "vis": list(mvis),
                    "dfs": [None] * len(matched),
                    "is_stats": False,
                }
            )
            stats = pd.DataFrame(
                {
                    "doc_id": [0],
                    "dl": [0],
                    "vis": [None],
                    "dfs": [[int(local_dfs.get(i, 0)) for i in range(P)]],
                    "is_stats": True,
                }
            )
            return pd.concat([rows, stats], ignore_index=True)

        out = postings.groupBy("shard").applyInPandas(
            fn,
            schema="doc_id long, dl long, vis array<long>, dfs array<long>, is_stats boolean",
        )
        out = out.persist()
        try:
            df_rows = (
                out.filter(F.col("is_stats"))
                .select(F.posexplode("dfs").alias("pos", "df"))
                .groupBy("pos")
                .agg(F.sum("df").alias("df"))
                .collect()
            )
            dfs_total = {r["pos"]: int(r["df"]) for r in df_rows}
            idfs = [idf_of(dfs_total.get(i, 0), self.n_docs) for i in range(P)]

            idf_arr = "array({})".format(",".join(f"{v!r}D" for v in idfs))
            score_expr = (
                f"-aggregate(zip_with(vis, {idf_arr}, (t, f) -> "
                f"CASE WHEN t > 0 THEN f * t * {K1 + 1.0}D / "
                f"(t + {K1}D * ({1.0 - B}D + {B}D * dl / {self.avgdl}D)) "
                f"ELSE 0D END), 0D, (a, x) -> a + x)"
            )
            scored = (
                out.filter(~F.col("is_stats"))
                .withColumn("score", F.expr(score_expr))
                .select("doc_id", "score")
            )
            # materialize top-k before unpersisting the match pass
            result = scored.orderBy(F.col("score").asc(), F.col("doc_id").asc()).limit(k)
            rows = result.collect()
        finally:
            out.unpersist()
        return self.spark.createDataFrame(rows, schema="doc_id long, score double") if rows else self.spark.createDataFrame([], schema="doc_id long, score double")

    # ---- batched execution --------------------------------------------

    def search_batch(self, queries: list[str], k: int = 10) -> DataFrame:
        """Evaluate MANY queries in ONE shard-scan job.

        Returns (query_id int, doc_id long, score double, rank int), rank
        1..k per query by (score asc = best BM25 first, doc_id asc) — the
        same per-query results as ``search`` (rank-identity tested), but all
        driver-side planning collapses to one dictionary lookup and all
        matching/scoring to one pass over postings. Per-query latency on
        Spark is dominated by job-scheduling fixed costs; batching is how a
        query workload actually runs at cluster scale. Empty queries yield
        no rows; grammar errors raise (reference 400 behavior).
        """
        spark = self.spark
        parsed: list[tuple[int, Node, list[Phrase]]] = []
        all_terms: set[str] = set()
        prefixes: set[str] = set()
        for qid, q in enumerate(queries):
            if not q or not q.strip():
                continue
            tree, phrases = parse_query(q, tokenize, unicode61_tokens)
            if tree is None:
                continue  # query pruned to nothing (e.g. '""') — no rows
            parsed.append((qid, tree, phrases))
            for p in phrases:
                if p.col == "unindexed":
                    continue
                if p.prefix:
                    all_terms.update(p.terms[:-1])
                    prefixes.add(p.terms[-1])
                else:
                    all_terms.update(p.terms)
        if not parsed:
            return spark.createDataFrame(
                [], schema="query_id int, doc_id long, score double, rank int"
            )

        # ONE dictionary lookup for every query's EXACT terms (df → a-priori
        # idfs for the WAND-able queries). Prefixes never touch the driver:
        # they push startswith predicates into the scan and expand per shard
        # inside score_shard.
        df_map = self._dfs_of(sorted(all_terms)) if all_terms else {}

        cond = F.col("term").isin(sorted(all_terms)) if all_terms else F.lit(False)
        for pref in sorted(prefixes):
            cond = cond | F.col("term").startswith(pref)
        postings = self._postings.filter(cond)
        # plan entry: (qid, tree, phrases, expansions, P, wand_idfs|None) —
        # pure conjunctions of plain terms run block-max WAND per shard and
        # emit only their per-shard top-k (scored); the rest emit matches +
        # df sentinels and score in the codegen'd expression below.
        plan = []
        for qid, tree, phrases in parsed:
            fast = all(
                len(p.terms) == 1 and not p.prefix and not p.anchored
                and p.col != "unindexed"
                for p in phrases
            ) and tree_is_pure_and(tree)
            wand_idfs = (
                np.array(
                    [idf_of(df_map.get(p.terms[0], 0), self.n_docs) for p in phrases]
                )
                if fast
                else None
            )
            plan.append((qid, tree, phrases, {}, len(phrases), wand_idfs))
        n_docs, avgdl = self.n_docs, self.avgdl

        def fn(pdf: pd.DataFrame) -> pd.DataFrame:
            outs = []
            for qid, tree, phrases, exp, P, wand_idfs in plan:
                if wand_idfs is not None:
                    res = wand_shard_topk(
                        pdf, [p.terms[0] for p in phrases], wand_idfs, avgdl, k
                    )
                    if res is None:
                        continue
                    doc_ids, scores = res
                    outs.append(
                        pd.DataFrame(
                            {
                                "query_id": np.int32(qid),
                                "doc_id": doc_ids,
                                "dl": np.int64(0),
                                "vis": [None] * len(doc_ids),
                                "dfs": [None] * len(doc_ids),
                                "is_stats": False,
                                "score": scores,
                            }
                        )
                    )
                    continue
                res = score_shard(pdf, tree, phrases, exp, n_docs, avgdl, None, 0)
                if res is None:
                    continue
                matched, mdl, mvis, local_dfs = res
                rows = pd.DataFrame(
                    {
                        "query_id": np.int32(qid),
                        "doc_id": matched,
                        "dl": mdl,
                        "vis": list(mvis),
                        "dfs": [None] * len(matched),
                        "is_stats": False,
                        "score": np.nan,
                    }
                )
                stats = pd.DataFrame(
                    {
                        "query_id": np.int32(qid),
                        "doc_id": np.int64(0),
                        "dl": np.int64(0),
                        "vis": [None],
                        "dfs": [[int(local_dfs.get(i, 0)) for i in range(P)]],
                        "is_stats": True,
                        "score": np.nan,
                    }
                )
                outs.append(rows)
                outs.append(stats)
            if not outs:
                return pd.DataFrame(
                    {
                        "query_id": pd.Series(dtype="int32"),
                        "doc_id": pd.Series(dtype="int64"),
                        "dl": pd.Series(dtype="int64"),
                        "vis": pd.Series(dtype="object"),
                        "dfs": pd.Series(dtype="object"),
                        "is_stats": pd.Series(dtype="bool"),
                        "score": pd.Series(dtype="float64"),
                    }
                )
            return pd.concat(outs, ignore_index=True)

        matched = postings.groupBy("shard").applyInPandas(
            fn,
            schema=(
                "query_id int, doc_id long, dl long, vis array<long>, "
                "dfs array<long>, is_stats boolean, score double"
            ),
        )
        matched = matched.persist()
        try:
            df_rows = (
                matched.filter(F.col("is_stats"))
                .select("query_id", F.posexplode("dfs").alias("pos", "df"))
                .groupBy("query_id", "pos")
                .agg(F.sum("df").alias("df"))
                .collect()
            )
            dfs_by_q: dict[int, dict[int, int]] = {}
            for r in df_rows:
                dfs_by_q.setdefault(r["query_id"], {})[r["pos"]] = int(r["df"])
            idf_rows = [
                (qid, [idf_of(dfs_by_q.get(qid, {}).get(i, 0), n_docs) for i in range(P)])
                for qid, _t, _p, _e, P, wand_idfs in plan
                if wand_idfs is None
            ]
            idf_df = self.spark.createDataFrame(
                idf_rows, schema="query_id int, idfs array<double>"
            )
            score_expr = (
                f"-aggregate(zip_with(vis, idfs, (t, f) -> "
                f"CASE WHEN t > 0 THEN f * t * {K1 + 1.0}D / "
                f"(t + {K1}D * ({1.0 - B}D + {B}D * dl / {self.avgdl}D)) "
                f"ELSE 0D END), 0D, (a, x) -> a + x)"
            )
            from pyspark.sql import Window

            w = Window.partitionBy("query_id").orderBy(
                F.col("score").asc(), F.col("doc_id").asc()
            )
            out = (
                matched.filter(~F.col("is_stats"))
                .join(F.broadcast(idf_df), "query_id", "left")
                # WAND rows arrive pre-scored; sentinel-path rows score here
                .withColumn("score", F.coalesce(F.col("score"), F.expr(score_expr)))
                .select("query_id", "doc_id", "score")
                .withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
            )
            rows = out.collect()
        finally:
            matched.unpersist()
        return spark.createDataFrame(
            rows, schema="query_id int, doc_id long, score double, rank int"
        ) if rows else spark.createDataFrame(
            [], schema="query_id int, doc_id long, score double, rank int"
        )

    # ---- snippets ------------------------------------------------------

    def _snippet_pair(
        self, texts: list[str], tree, phrases, expansions
    ) -> tuple[list[str], list[str]]:
        """FTS5 snippet(…,16) titles + snippet(…,60) bodies for ≤k texts,
        computed driver-side (Q7 runs only over emitted rows). Per doc, only
        VISIBLE phrases are highlighted — FTS5's snippet() skips phrases
        whose branch contributes nothing for that row (fuzz-found via
        '(a OR b) AND c OR d': a doc matching a∧d but not c highlights only
        d)."""
        from .query.snippet import make_snippet, phrase_slot_table, snippet_plan

        slots_list, anchored = phrase_slot_table(phrases, expansions)
        titles: list[str] = []
        bodies: list[str] = []
        for text in texts:
            text = text or ""
            fs, fa, fi = snippet_plan(tree, slots_list, anchored, text)
            titles.append(make_snippet(text, fs, fa, 16, per_phrase=fi))
            bodies.append(make_snippet(text, fs, fa, 60, per_phrase=fi))
        return titles, bodies


def tree_has_no_near(node: Node) -> bool:
    if node.op == "NEAR":
        return False
    return all(tree_has_no_near(c) for c in node.children)


def tree_is_pure_and(node: Node) -> bool:
    """True iff the tree is a conjunction of plain phrases (no OR/NOT/NEAR)."""
    if node.op == "PHRASE":
        return True
    if node.op == "AND":
        return all(tree_is_pure_and(c) for c in node.children)
    return False
