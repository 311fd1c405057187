"""Bench harness — one JSON line with per-query seconds.

Headline metrics (BASELINE.json):
- index-build docs/sec over the synthetic web corpus (FIXTURES.md §1),
  sized to the sf dir (200k docs/sf unit → 20k at sf0.1);
- BM25 top-10 query latency over the built index (reference query set,
  rank-identical engine — correctness is tests/' job, this measures speed);
- the training-data pipeline queries from __spark_entry__ at the sf dir.

Usage:
  python bench.py                 # bench at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS]
  python bench.py --scaling       # same job at local[8] and local[32] →
                                  # throughput pair + efficiency → BENCH/BASELINE.md
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
INDEX_DIR = "/tmp/bench_index"

FTS_QUERIES = [
    "hypertension",
    "renal failure",
    '"renal failure"',
    "run",
    "cafe",
    "data*",
    "renal OR failure",
    "failure NOT renal",
    "NEAR(renal failure, 3)",
    "^renal",
]

PIPELINE_QUERIES = [
    "q_bm25_ws",
    "q_exact_dedup",
    "q_minhash_lsh_pairs",
    "q_simhash",
    "q_simhash_neardup",
    "q_ngram_jaccard",
    "q_ngram_jaccard_verify",
    "q_cosine_topk",
    "q_ann_lsh",
    "q_ann_ivf",
    "q_ann_ivfpq",
    "q_windowed_agg",
    "q_session_window",
    "q_pack_sequences",
    "q_snapshot_diff",
    "q_source_cap",
    "q_pii_scrub",
    "q_split_assign",
    "q_decontaminate",
    "q_rebalance_mix",
    "q_corpus_report",
    "q_chunk_documents",
    "q_tfidf_topk",
    "q_unigram_logprob",
    "q_length_profile",
    "q_lang_id",
    "q_quality",
    "q_token_counts",
    "q_winnow",
    "q_resize",
    "q_frame_sample",
    "q_audio_features",
]


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def corpus_size(sf: float) -> int:
    return max(500, int(200_000 * sf))


def _warm(spark):
    spark.range(256).repartition(CPUS).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).count()


def materialize_corpus(
    spark, n_docs: int, path: str, partitions: int | None = None
) -> str:
    """Write the FIXTURES §1 synthetic corpus as a STORED web-pages table
    (url, warc_ts, html, text, lang — the input_hint's Iceberg-table shape)
    and return its path; reused if already present with the right count.

    This runs OUTSIDE the timed build: the engine's input at any real
    deployment is a table on storage, not an in-job generator, and the
    Philox per-row generator costs ~700 us/doc of Python — 5x the build's
    own per-doc work — so timing it as part of the build measured the
    fixture, not the engine."""
    from pdfsearch_spark import corpus

    done = os.path.join(path, "_SUCCESS")
    if os.path.exists(done):
        try:
            if spark.read.parquet(path).count() == n_docs:
                return path
        except Exception:
            pass
    shutil.rmtree(path, ignore_errors=True)
    corpus.web_pages_df(
        spark, n_docs, partitions=partitions or max(2 * CPUS, 16)
    ).write.mode("overwrite").parquet(path)
    return path


def _read_corpus(spark, path: str, target_tasks: int = 256):
    """Scan the stored corpus with parallelism pinned by TARGET TASK COUNT
    rather than the session's 128 MB default split size: the table is small
    at bench scale, and a handful of coalesced scan tasks would serialize
    the pre-shuffle map side at high thread counts (an artifact of bench
    size, not of the engine — at 100 TB the default yields ~800k tasks)."""
    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    split = max(1 << 20, total // target_tasks)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))
    spark.conf.set("spark.sql.files.openCostInBytes", str(max(1, split // 4)))
    return spark.read.parquet(path)


def run_build_and_search(
    spark, n_docs: int, n_shards: int, index_dir: str,
    partitions: int | None = None, with_queries: bool = True,
    corpus_path: str | None = None,
):
    """Returns (build_metrics, {query: sec})."""
    from pdfsearch_spark import corpus
    from pdfsearch_spark.index_build import build_index
    from pdfsearch_spark.search import SearchEngine

    shutil.rmtree(index_dir, ignore_errors=True)
    if corpus_path is not None:
        pages = _read_corpus(
            spark, corpus_path, target_tasks=partitions or max(2 * CPUS, 16)
        )
    else:
        pages = corpus.web_pages_df(
            spark, n_docs, partitions=partitions or max(2 * CPUS, 16)
        )
    metrics = build_index(spark, pages, index_dir, n_shards=n_shards)
    if not with_queries:
        return metrics, {}

    eng = SearchEngine(spark, index_dir)
    times: dict[str, float] = {}
    # best-of-2 per query: the first pass also pays one-off costs (dictionary
    # cache fill, file-listing, JIT) that are not steady-state latency
    for _pass in range(2):
        for q in FTS_QUERIES:
            t0 = time.time()
            eng.search(q, k=10, with_snippets=False).collect()
            dt = round(time.time() - t0, 3)
            key = f"fts:{q}"
            times[key] = min(times.get(key, dt), dt)
    # the honest latency split (VERDICT r3 item 7): the ~0.8-1.3s single-query
    # floor is Spark job-scheduling fixed cost, not scoring. Record (a) the
    # p50 of a fully-warm third pass — what an interactive caller sees per
    # query — and, below, (b) the batch-amortized per-query cost — what a
    # workload sees when queries share one shard-scan job.
    warm = []
    for q in FTS_QUERIES:
        t0 = time.time()
        eng.search(q, k=10, with_snippets=False).collect()
        warm.append(time.time() - t0)
    times["fts_warm_p50"] = round(sorted(warm)[len(warm) // 2], 3)
    t0 = time.time()
    eng.search("renal failure", k=10, with_snippets=True).collect()
    times["fts+snippets:renal failure"] = round(time.time() - t0, 3)
    # batched execution: all queries in one shard-scan job — the number that
    # matters for workload throughput (per-query latency is Spark fixed cost)
    t0 = time.time()
    eng.search_batch(FTS_QUERIES, k=10).collect()
    times["fts_batch_all"] = round(time.time() - t0, 3)
    times["fts_batch_amortized"] = round(
        times["fts_batch_all"] / len(FTS_QUERIES), 3
    )
    return metrics, times


def assert_rank_identity(spark, index_dir: str, k: int = 200) -> dict:
    """Every bench run is also a correctness run: engine top-k for the full
    query set vs the SQLite FTS5 oracle loaded with the SAME built index's
    doc store (extraction byte-identity is separately gated by goldens in
    tests/test_extract.py, so feeding the oracle the engine-extracted text
    checks exactly the index+score layers). Pipeline benches run it at the
    bench SF on the main index (VERDICT r3 item 4); --scaling sessions run
    it once per session on a 10k-doc warm-corpus index before any pinned
    draw (scaling_rank_gate; ADVICE r4 — the 1M-doc scaling corpus itself
    would cost ~10 min of oracle load, so the gate uses the same code path
    at gate-affordable scale). Any docID/score diff raises — rc != 0."""
    import sqlite3

    from pdfsearch_spark.oracle import FTS5Oracle
    from pdfsearch_spark.search import SearchEngine

    t0 = time.time()
    eng = SearchEngine(spark, index_dir)
    pdf = eng._doc_text.select("url", "text").toPandas()
    ora = FTS5Oracle()
    ora.load(pdf)
    for q in FTS_QUERIES:
        try:
            o_pairs = [(r.doc_id, r.score) for r in ora.search(q, k=k)]
        except sqlite3.OperationalError as exc:  # none of FTS_QUERIES errors
            raise AssertionError(f"oracle rejected {q!r}: {exc}") from exc
        rows = (
            eng.search(q, k=k, with_snippets=False)
            .select("doc_id", "score")
            .collect()
        )
        rows.sort(key=lambda r: (r["score"], r["doc_id"]))
        e_pairs = [(r["doc_id"], r["score"]) for r in rows]
        assert len(o_pairs) == len(e_pairs), (
            f"rank-identity FAIL {q!r}: oracle {len(o_pairs)} rows, "
            f"engine {len(e_pairs)}"
        )
        if not o_pairs:
            continue
        # score sequences must match pairwise; doc membership must match
        # for every score strictly better (more negative) than the k-th
        # boundary — FTS5 keeps a NONDETERMINISTIC member at an exact
        # boundary-score tie (same rule as the fuzz harness's _diff_one)
        for i, ((_, osc), (_, esc)) in enumerate(zip(o_pairs, e_pairs)):
            assert abs(osc - esc) < 1e-9, (
                f"rank-identity FAIL {q!r} at rank {i}: "
                f"score {osc} vs {esc}"
            )
        boundary = o_pairs[-1][1]
        o_strict = {d for d, s in o_pairs if s < boundary - 1e-9}
        e_strict = {d for d, s in e_pairs if s < boundary - 1e-9}
        assert o_strict == e_strict, (
            f"rank-identity FAIL {q!r}: non-boundary membership differs "
            f"(oracle-only {sorted(o_strict - e_strict)[:3]}, "
            f"engine-only {sorted(e_strict - o_strict)[:3]})"
        )
    return {
        "rank_identity_k": k,
        "rank_identity_queries": len(FTS_QUERIES),
        "rank_identity_sec": round(time.time() - t0, 3),
    }


def run_refresh_bench(
    spark, n_docs: int, index_dir: str, partitions: int | None = None
) -> dict[str, float]:
    """Refresh + compaction at bench scale: append 10% new docs as a segment
    (refresh_index anti-joins/watermarks away the already-indexed ids), re-run
    3 FTS queries against the refreshed multi-segment index, compact back to
    one segment, re-run again. Post-refresh rank-identity vs the FTS5 oracle
    is proven in tests/test_refresh.py; this entry measures the cost."""
    from pdfsearch_spark import corpus
    from pdfsearch_spark.index_build import compact_index, refresh_index
    from pdfsearch_spark.search import SearchEngine

    times: dict[str, float] = {}
    n_new = max(1, n_docs // 10)
    pages = corpus.web_pages_df(
        spark, n_docs + n_new, partitions=partitions or max(2 * CPUS, 16)
    )
    t0 = time.time()
    refresh_index(spark, pages, index_dir)
    times["refresh_append_10pct"] = round(time.time() - t0, 3)

    def _timed_queries(prefix: str) -> list[float]:
        # best-of-2 per query: pass 1 pays one-off costs (parquet file
        # listing of the new table dirs, dictionary-cache fill) that are
        # not steady-state latency — the r2 draw where post-compact looked
        # 5-10x slower than pre-compact was exactly this artifact
        eng = SearchEngine(spark, index_dir)  # new engine: new snapshot
        best: dict[str, float] = {}
        for _pass in range(2):
            for q in FTS_QUERIES[:3]:
                t0 = time.time()
                eng.search(q, k=10, with_snippets=False).collect()
                dt = round(time.time() - t0, 3)
                best[q] = min(best.get(q, dt), dt)
        for q, dt in best.items():
            times[f"{prefix}:{q}"] = dt
        return sorted(best.values())

    pre = _timed_queries("fts_post_refresh")
    t0 = time.time()
    res = compact_index(spark, index_dir)
    times["compact"] = round(time.time() - t0, 3)
    times["compact_segments_before"] = res.get("segments_before", 0)
    times["compact_segments_after"] = res.get("segments_after", 0)
    times["compact_files_before"] = res.get("postings_files_before", 0)
    times["compact_files_after"] = res.get("postings_files_after", 0)
    post = _timed_queries("fts_post_compact")
    # the maintenance op must pay for itself: median post-compact latency
    # <= median post-refresh latency (1.0 = break-even; >1 = compaction won)
    med_pre, med_post = pre[len(pre) // 2], post[len(post) // 2]
    times["compact_query_speedup"] = round(med_pre / med_post, 3) if med_post else 0.0
    return times


def run_pipeline(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entrymod

    # drop the index/refresh phases' cached relations + broadcasts before
    # timing the pipeline ops: in local mode they all share one 8 GB heap,
    # and leftover cache pressure makes the join-heavy ops (exact Jaccard)
    # spill — 3-8x slower than the same query in a clean session
    spark.catalog.clearCache()
    qs = entrymod.queries()
    times: dict[str, float] = {}
    for name in PIPELINE_QUERIES:
        t0 = time.time()
        # noop sink forces full evaluation (count() would let Catalyst prune
        # the expensive projections and time an empty plan)
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)
    return times


def bench_once(
    master: str,
    n_docs: int,
    sf_dir: str,
    with_pipeline: bool = True,
    n_shards: int | None = None,
    partitions: int | None = None,
    cpus: int | None = None,
    warm_build: bool = False,
    lite: bool = False,
    index_dir: str = INDEX_DIR,
):
    from pdfsearch_spark.session import get_spark

    spark = get_spark("bench", master=master, shuffle_partitions=cpus or CPUS)
    try:
        _warm(spark)
        # input is a STORED web-pages table (materialize_corpus), generated
        # outside the timed region — shared across configs via
        # SPARK_GRAFT_CORPUS_PATH in the scaling bench ("same input" in the
        # north rule is then literal: the same files)
        corpus_main = os.environ.get(
            "SPARK_GRAFT_CORPUS_PATH", index_dir + "_corpus"
        )
        corpus_warm = os.environ.get(
            "SPARK_GRAFT_CORPUS_WARM", index_dir + "_corpus_warm"
        )
        materialize_corpus(spark, n_docs, corpus_main, partitions)
        if warm_build:
            materialize_corpus(spark, 10_000, corpus_warm, partitions)
            # JIT/codegen + python-worker warm-up: a small throwaway build so
            # the measured one reflects steady-state throughput (the quantity
            # that scales with executors; observed 2.6x warm-up distortion)
            run_build_and_search(
                spark, 10_000, n_shards=n_shards or 32,
                index_dir=index_dir + "_warm", partitions=partitions,
                with_queries=False, corpus_path=corpus_warm,
            )
            shutil.rmtree(index_dir + "_warm", ignore_errors=True)
            # best-of-2: the sandbox VM shows +-2x external variance; min is
            # the robust steady-state estimator. lite mode (the curve
            # configs) measures one build, no queries — it exists to place
            # additional points on the scaling curve, not to re-measure the
            # primary pair.
            b1, _ = run_build_and_search(
                spark, n_docs, n_shards=n_shards or max(32, 2 * CPUS),
                index_dir=index_dir, partitions=partitions,
                with_queries=False, corpus_path=corpus_main,
            )
            if lite:
                # best-of-N for the curve configs too: a single draw per
                # config made pair A the noisiest link in the efficiency
                # ratio on this shared host (min is the robust estimator)
                for _ in range(SCALING_LITE_BUILDS - 1):
                    b2, _ = run_build_and_search(
                        spark, n_docs, n_shards=n_shards or max(32, 2 * CPUS),
                        index_dir=index_dir, partitions=partitions,
                        with_queries=False, corpus_path=corpus_main,
                    )
                    if b2["elapsed_sec"] < b1["elapsed_sec"]:
                        b1 = b2
                return b1, {}
            b2, times = run_build_and_search(
                spark, n_docs, n_shards=n_shards or max(32, 2 * CPUS),
                index_dir=index_dir, partitions=partitions,
                corpus_path=corpus_main,
            )
            build = b1 if b1["elapsed_sec"] <= b2["elapsed_sec"] else b2
            return build, times
        build, times = run_build_and_search(
            spark,
            n_docs,
            n_shards=n_shards or max(32, 2 * CPUS),
            index_dir=index_dir,
            partitions=partitions,
            corpus_path=corpus_main,
        )
        if with_pipeline:
            # correctness gate on the JUST-BUILT bench-sf index, before
            # refresh mutates it: any rank/score diff vs FTS5 aborts the run
            times.update(assert_rank_identity(spark, index_dir))
            times.update(run_refresh_bench(spark, n_docs, index_dir, partitions))
            times.update(run_pipeline(spark, sf_dir))
        return build, times
    finally:
        spark.stop()


def main():
    sf = _sf_of(SF_DIR)
    n_docs = corpus_size(sf)

    if "--scaling-worker" in sys.argv:
        return scaling_worker(
            int(sys.argv[sys.argv.index("--scaling-worker") + 1]),
            lite="--lite" in sys.argv,
        )
    if "--gen-corpus" in sys.argv:
        # untimed corpus materialization for the scaling bench (parent
        # invokes this unpinned before the pinned workers run)
        from pdfsearch_spark.session import get_spark

        i = sys.argv.index("--gen-corpus")
        gen_docs, root = int(sys.argv[i + 1]), sys.argv[i + 2]
        spark = get_spark("gen-corpus", master="local[32]")
        try:
            materialize_corpus(
                spark, gen_docs, os.path.join(root, "main"), SCALING_PARTS
            )
            materialize_corpus(
                spark, 10_000, os.path.join(root, "warm"), SCALING_PARTS
            )
        finally:
            spark.stop()
        return
    if "--scaling-rank-gate" in sys.argv:
        return scaling_rank_gate()
    if "--sf1" in sys.argv:
        return sf1_block()
    if "--scaling" in sys.argv:
        return scaling(sf, n_docs)

    os.environ.setdefault("SPARK_DRIVER_MEM", "16g")  # see scaling_worker
    t_all = time.time()
    build, times = bench_once(f"local[{CPUS}]", n_docs, SF_DIR)
    total = round(time.time() - t_all, 3)
    queries = {"index_build": round(build["elapsed_sec"], 3), **times}
    print(
        json.dumps(
            {
                "metric": "index-build + BM25 top-10 latency + pipeline ops wall time",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "corpus_docs": n_docs,
                "build_docs_per_sec": round(build["docs_per_sec"], 1),
                "build_postings_per_sec": round(build["postings_per_sec"], 1),
                "fts_mean_query_sec": round(
                    sum(v for k, v in times.items() if k.startswith("fts:"))
                    / len(FTS_QUERIES),
                    3,
                ),
                "cpus": CPUS,
            }
        )
    )


# Files whose content determines the scaling-bench numbers (corpus gen, the
# build, the query path). pipeline/, streaming/, cli, tests, docs are NOT
# exercised by --scaling, so commits touching only them leave the
# fingerprint — and the run-history "current version" grouping — unchanged.
# bench.py itself participates only through its SCALING_* knobs (extracted
# per revision below): reporting-only harness edits must not orphan
# comparable measurement rows.
BENCH_RELEVANT_PATHS = [
    "pdfsearch_spark/__init__.py",
    "pdfsearch_spark/session.py",
    "pdfsearch_spark/corpus.py",
    "pdfsearch_spark/extract.py",
    "pdfsearch_spark/analyzer.py",
    "pdfsearch_spark/porter.py",
    "pdfsearch_spark/fnv.py",
    "pdfsearch_spark/codec.py",
    "pdfsearch_spark/index_build.py",
    "pdfsearch_spark/search.py",
    "pdfsearch_spark/query",
    "pdfsearch_spark/data",
]


def build_code_fingerprint(rev: str) -> str:
    """Hash of the bench-relevant blobs at `rev` (retroactively computable
    for any historical row from its recorded commit)."""
    import hashlib
    import re
    import subprocess

    repo = os.path.dirname(os.path.abspath(__file__))
    try:
        out = subprocess.run(
            ["git", "ls-tree", "-r", rev, "--"] + BENCH_RELEVANT_PATHS,
            capture_output=True, text=True, cwd=repo,
        )
        if out.returncode != 0 or not out.stdout:
            return ""
        bench_src = subprocess.run(
            ["git", "show", f"{rev}:bench.py"],
            capture_output=True, text=True, cwd=repo,
        ).stdout
        knobs = ";".join(
            sorted(re.findall(r"^SCALING_\w+\s*=\s*[\d_]+", bench_src, re.M))
        )
        return hashlib.sha256((out.stdout + "\n" + knobs).encode()).hexdigest()[:12]
    except OSError:
        return ""


SCALING_TMPFS = 1  # scaling configs put scratch (shuffle) + index output on
# /dev/shm: all four pinned configs otherwise contend for the ONE shared VM
# disk, so the write/shuffle phase measures that disk's (highly variable)
# bandwidth instead of N->4N engine behavior. On a real cluster, shuffle and
# sink bandwidth scale with executor count — each executor brings its own
# disks / object-store lanes — which is exactly what tmpfs restores here.
# Knob participates in the bench-code fingerprint: disk-era history rows are
# not comparable and drop out of the current-version medians.

SCALING_LITE_BUILDS = 2  # measured builds per curve (lite) config; min wins

SCALING_STORED_INPUT = 1  # the timed build reads a STORED corpus table
# (materialize_corpus) instead of running the synthetic generator in-job.
# The generator costs ~700 us/doc of Python — 5x the engine's own per-doc
# work — so in-job generation measured the fixture's scaling, not the
# engine's, and is also not the north-rule input shape (input_hint: an
# Iceberg table of web pages). Knob participates in the bench-code
# fingerprint: in-job-generation history rows are not comparable.

SCALING_DOCS = 1_000_000  # dilutes fixed per-job driver costs (job
# scheduling, commits, small stats stages) that are O(1) in corpus size — at
# web scale they vanish entirely, so the scaling measurement should not be
# dominated by them either. At 500k the fixed tail was still 15-25% of the
# 32-thread build (measured phase_sec in BENCH/history.jsonl); 1M docs
# halves that weight while every config still runs the identical job layout
SCALING_SHARDS = 128    # identical layout at N and 4N
SCALING_PARTS = 256     # 8 waves at 32 threads: finer packing, shorter tails


def _scaling_docs() -> int:
    """SPARK_GRAFT_SCALING_DOCS overrides for harness dry-runs only; real
    rows always record their corpus_docs, so an off-size row is visible."""
    return int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", SCALING_DOCS))


def _parallel_baseline(spark, tasks: int = 128) -> float:
    """Embarrassingly-parallel numpy workload — measures what THIS HOST can
    actually deliver going from N to 4N threads (SMT/shared-host ceiling)
    for COMPUTE-bound work."""
    import time as _t

    def work(it):
        import numpy as np
        for pdf in it:
            acc = 0.0
            for _ in range(400):
                acc += float(np.sin(np.arange(2000)).sum())
            yield pdf.head(1)

    t0 = _t.time()
    spark.range(tasks).repartition(tasks).mapInPandas(work, schema="id long").count()
    return _t.time() - t0


def _string_baseline(
    spark, n_docs: int = 60_000, stored_docs: int | None = None
) -> float:
    """REPRESENTATIVE hardware ceiling: the build's own stage-1 hot loop
    (HTML extraction + tokenization) as a pure map — embarrassingly parallel,
    zero shuffle, zero driver work. String/memory-bandwidth-bound work gains
    far less from contended upper threads than numpy compute, so this — not
    the numpy kernel — is the honest N→4N ceiling for an indexing workload.
    Whatever the full build loses RELATIVE to this kernel is attributable to
    our pipeline (shuffle, stragglers, driver); losses below it are the
    host's. Reads the same stored corpus table the measured build reads
    (sampled down), so kernel and build share the input path."""
    import time as _t

    from pdfsearch_spark import corpus

    path = os.environ.get("SPARK_GRAFT_CORPUS_PATH")
    if path and stored_docs and os.path.exists(os.path.join(path, "_SUCCESS")):
        pages = _read_corpus(spark, path, target_tasks=256)
        if stored_docs > n_docs:
            pages = pages.sample(fraction=n_docs / stored_docs, seed=7)
    else:
        pages = corpus.web_pages_df(spark, n_docs, partitions=256)

    def kernel(it):
        import pandas as pd

        from pdfsearch_spark.analyzer import tokenize
        from pdfsearch_spark.extract import extract_text

        for pdf in it:
            n = 0
            for h in pdf["html"]:
                n += len(tokenize(extract_text(h)))
            yield pd.DataFrame({"n": [n]})

    df = pages.mapInPandas(kernel, schema="n long")
    df.count()  # warm (gen + python workers + JIT)
    best = float("inf")
    for _ in range(2):
        t0 = _t.time()
        df.count()
        best = min(best, _t.time() - t0)
    return best


def sf1_block():
    """One official bench + rank-identity gate at sf1 — 200k docs, 10x the
    per-round bench corpus (VERDICT r4 items 2 and 7): same harness, same
    query set, k=200 gate vs the FTS5 oracle loaded with the just-built
    index's own doc store. Emits one JSON line and regenerates
    BENCH/SF1.md with the sf0.1-vs-sf1 sub-linearity comparison (query
    latency, refresh, compact) and the phrase-vs-term latency ratio (the
    positions stream must stay block-lazy as the corpus grows)."""
    from pdfsearch_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEM", "16g")
    n_docs = 200_000
    idx = INDEX_DIR + "_sf1"
    t_all = time.time()
    spark = get_spark("bench-sf1", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    try:
        _warm(spark)
        corpus_main = idx + "_corpus"
        materialize_corpus(spark, n_docs, corpus_main)
        build, times = run_build_and_search(
            spark, n_docs, n_shards=max(32, 2 * CPUS), index_dir=idx,
            corpus_path=corpus_main,
        )
        times.update(assert_rank_identity(spark, idx))
        times.update(run_refresh_bench(spark, n_docs, idx))
    finally:
        spark.stop()
        shutil.rmtree(idx, ignore_errors=True)
        shutil.rmtree(idx + "_corpus", ignore_errors=True)
    out = {
        "metric": "sf1 index-build + BM25 top-10 latency + rank-identity(k=200)",
        "value": round(time.time() - t_all, 3),
        "unit": "sec",
        "sf": 1.0,
        "corpus_docs": n_docs,
        "queries": {"index_build": round(build["elapsed_sec"], 3), **times},
        "build_docs_per_sec": round(build["docs_per_sec"], 1),
        "build_postings_per_sec": round(build["postings_per_sec"], 1),
        "fts_mean_query_sec": round(
            sum(v for k, v in times.items() if k.startswith("fts:"))
            / len(FTS_QUERIES),
            3,
        ),
        "cpus": CPUS,
    }
    print(json.dumps(out))
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/sf1.json", "w") as f:
        f.write(json.dumps(out) + "\n")
    return out


# Pre-registered measurement protocol for the round-5 scaling window,
# declared BEFORE any round-5 draw was taken (ADVICE r4: fix the draw count
# per window and designate ONE primary statistic per pair up front; report
# everything else as secondary). Not a SCALING_* knob: it does not change
# what a draw measures, only how the window is read.
SCALING_PREREG = {
    "window_draws": 10,  # the round-5 window is the first 10 current-code
    #                      draws in history.jsonl — no optional stopping
    "primary_pair_a": "median raw scaling_efficiency_4_16 (no normalization)",
    "primary_pair_b": (
        "kernel-gated (repr ceiling >= 0.4) median of per-draw "
        "ceiling-normalized efficiency, cap 1.0"
    ),
    "secondary": "raw medians, pairing-robust ratio-of-medians, ungated medians",
}


def scaling_rank_gate() -> dict:
    """Rank-identity gate for scaling sessions (ADVICE r4: '--scaling runs
    never executed assert_rank_identity'). Builds an index over the 10k-doc
    warm corpus the session already materialized and diffs engine top-k
    against the FTS5 oracle — so every scaling session is also a
    correctness run, untimed and before any pinned draw."""
    from pdfsearch_spark.index_build import build_index
    from pdfsearch_spark.session import get_spark

    warm = os.environ["SPARK_GRAFT_CORPUS_WARM"]
    idx = os.path.join("/tmp", "spark_graft_rankgate_idx")
    shutil.rmtree(idx, ignore_errors=True)
    spark = get_spark("rank-gate", master="local[32]")
    try:
        build_index(spark, _read_corpus(spark, warm, 64), idx, n_shards=16)
        res = assert_rank_identity(spark, idx)
    finally:
        spark.stop()
        shutil.rmtree(idx, ignore_errors=True)
    print(json.dumps(res))
    return res


def scaling_worker(cpus: int, lite: bool = False):
    """One pinned config: build (warmed, best-of-2; lite = best-of-1, no
    queries) + the parallel hardware-baselines; prints one JSON line consumed
    by scaling()."""
    from pdfsearch_spark.session import get_spark

    # 16 GB heap for the bench JVM: at 32 concurrent tasks the build's
    # in-flight shuffle/write/Arrow buffers overflow the 8 GB default's
    # headroom and GC time explodes (measured 150s of GC per 250k-doc
    # build at 32 threads vs ~4s at 16 GB; at 8 threads both are fine —
    # i.e. the small heap directly costs scaling efficiency). On a real
    # cluster this is per-executor memory sizing, set via spark-submit.
    os.environ.setdefault("SPARK_DRIVER_MEM", "16g")
    # Fixed pre-touched heap (-Xms=-Xmx -XX:+AlwaysPreTouch, session.py):
    # heap-growth page-zeroing otherwise lands inside the measured build,
    # serialized on the kernel memory lock while every task slot is busy.
    # Standard executor-JVM production tuning; paid once at session start
    # (untimed), applied identically at every thread count.
    os.environ.setdefault("SPARK_GRAFT_PRETOUCH", "1")
    n_docs = max(corpus_size(_sf_of(SF_DIR)), _scaling_docs())
    index_dir = INDEX_DIR
    if SCALING_TMPFS and os.access("/dev/shm", os.W_OK):
        scratch = f"/dev/shm/spark_graft_scale_{cpus}"
        os.makedirs(scratch, exist_ok=True)
        os.environ["SPARK_GRAFT_LOCAL_DIR"] = os.path.join(scratch, "local")
        index_dir = os.path.join(scratch, "index")
    try:
        build, times = bench_once(
            f"local[{cpus}]", n_docs, SF_DIR, with_pipeline=False,
            n_shards=SCALING_SHARDS, partitions=SCALING_PARTS, cpus=cpus,
            warm_build=True, lite=lite, index_dir=index_dir,
        )
        spark = get_spark(
            "baseline", master=f"local[{cpus}]", shuffle_partitions=cpus
        )
        try:
            _warm(spark)
            _parallel_baseline(spark, 32)  # warm numpy path
            base = min(_parallel_baseline(spark), _parallel_baseline(spark))
            sbase = _string_baseline(spark, stored_docs=n_docs)
        finally:
            spark.stop()
    finally:
        if index_dir != INDEX_DIR:
            shutil.rmtree(os.path.dirname(index_dir), ignore_errors=True)
    print(
        json.dumps(
            {
                "build": build,
                "times": times,
                "baseline_sec": base,
                "string_baseline_sec": sbase,
            }
        )
    )


def scaling(sf: float, n_docs: int):
    """Same build+search job at local[8] and local[32] on the same input —
    the sandbox stand-in for N vs 4N executors (north_rule scaling clause).
    Job layout (corpus partitioning, shard count) is pinned identical across
    the two configs; only executor parallelism differs. Each config runs in
    a subprocess pinned with taskset so local[8] genuinely gets 8 cores —
    otherwise JVM helper threads (GC, shuffle, Arrow) spill onto the idle
    cores and inflate the small config's throughput."""
    import subprocess

    n_docs = max(n_docs, _scaling_docs())
    # ONE stored input table for every config ("same input", literally):
    # generated once, unpinned and untimed, on tmpfs when available
    corpus_root = (
        "/dev/shm/spark_graft_corpus"
        if SCALING_TMPFS and os.access("/dev/shm", os.W_OK)
        else "/tmp/spark_graft_corpus"
    )
    gen = subprocess.run(
        [sys.executable, os.path.abspath(__file__),
         "--gen-corpus", str(n_docs), corpus_root],
        capture_output=True, text=True, env=os.environ.copy(),
    )
    if gen.returncode != 0:
        sys.stderr.write(
            f"corpus generation failed\n{gen.stdout[-2000:]}\n{gen.stderr[-4000:]}\n"
        )
        raise SystemExit(1)
    os.environ["SPARK_GRAFT_CORPUS_PATH"] = os.path.join(corpus_root, "main")
    os.environ["SPARK_GRAFT_CORPUS_WARM"] = os.path.join(corpus_root, "warm")
    # Correctness gate once per scaling session, untimed, before any pinned
    # draw: engine top-k vs the FTS5 oracle over the warm corpus. rc != 0
    # on any diff — a scaling session never records numbers for a build
    # whose results are wrong.
    gate = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--scaling-rank-gate"],
        capture_output=True, text=True, env=os.environ.copy(),
    )
    if gate.returncode != 0:
        sys.stderr.write(
            f"scaling rank-identity gate FAILED\n{gate.stdout[-2000:]}\n"
            f"{gate.stderr[-6000:]}\n"
        )
        raise SystemExit(1)
    gate_lines = [l for l in gate.stdout.strip().splitlines() if l.startswith("{")]
    rank_gate = json.loads(gate_lines[-1]) if gate_lines else {}
    results = {}
    # Primary pair first (8, 32) — measured exactly as every historical row,
    # back-to-back so host drift between the two builds is minimized. The
    # curve pair (4, 16) follows in lite mode: it ADDS points on the scaling
    # curve (and the second N→4N ratio, one where this host's threads are in
    # their linear region) without perturbing or re-defining the primary
    # measurement — which is why it is deliberately NOT a SCALING_* knob.
    configs = [(8, "0-7", False), (32, "0-31", False),
               (4, "0-3", True), (16, "0-15", True)]
    for cpus, cores, lite in configs:
        t0 = time.time()
        proc = subprocess.run(
            ["taskset", "-c", cores, sys.executable, os.path.abspath(__file__),
             "--scaling-worker", str(cpus)] + (["--lite"] if lite else []),
            capture_output=True, text=True, env=os.environ.copy(),
        )
        json_lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
        if not json_lines:
            sys.stderr.write(
                f"scaling worker local[{cpus}] produced no JSON "
                f"(rc={proc.returncode})\n--- worker stdout ---\n{proc.stdout[-4000:]}"
                f"\n--- worker stderr ---\n{proc.stderr[-8000:]}\n"
            )
            raise SystemExit(1)
        r = json.loads(json_lines[-1])
        build, times = r["build"], r["times"]
        results[cpus] = {
            "baseline_sec": round(r["baseline_sec"], 2),
            "string_baseline_sec": round(r["string_baseline_sec"], 2),
            "build_sec": round(build["elapsed_sec"], 2),
            "phase_sec": build.get("phase_sec", {}),
            "docs_per_sec": round(build["docs_per_sec"], 1),
            "postings_per_sec": round(build["postings_per_sec"], 1),
            "fts_mean_query_sec": round(
                sum(v for k, v in times.items() if k.startswith("fts:"))
                / len(FTS_QUERIES),
                3,
            ) if times else None,
            "wall_sec": round(time.time() - t0, 2),
        }
    eff = results[32]["docs_per_sec"] / (4 * results[8]["docs_per_sec"])
    ceiling = results[8]["baseline_sec"] / results[32]["baseline_sec"] / 4
    rep_ceiling = (
        results[8]["string_baseline_sec"] / results[32]["string_baseline_sec"] / 4
    )
    try:
        git_rev = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout.strip()
    except OSError:
        git_rev = ""
    eff416 = results[16]["docs_per_sec"] / (4 * results[4]["docs_per_sec"])
    rep416 = (
        results[4]["string_baseline_sec"] / results[16]["string_baseline_sec"] / 4
    )
    out = {
        "sf": sf,
        "corpus_docs": n_docs,
        "git": git_rev,
        "local8": results[8],
        "local32": results[32],
        "scaling_efficiency": round(eff, 3),
        "numpy_ceiling_efficiency": round(ceiling, 3),
        "representative_ceiling_efficiency": round(rep_ceiling, 3),
        # ceilings are capped at 1.0: a measured kernel ratio above linear is
        # noise in the small config's kernel draw, and dividing by it would
        # deflate the normalized metric below the raw one it explains
        "ceiling_normalized_efficiency": (
            round(eff / min(1.0, rep_ceiling), 3) if rep_ceiling else None
        ),
        # the second N→4N pair: both configs inside the host's linear thread
        # region (the 8→32 pair's large config spans the contended half)
        "local4": results[4],
        "local16": results[16],
        "scaling_efficiency_4_16": round(eff416, 3),
        "representative_ceiling_efficiency_4_16": round(rep416, 3),
        "ceiling_normalized_efficiency_4_16": (
            round(eff416 / min(1.0, rep416), 3) if rep416 else None
        ),
        # per-session correctness gate result (warm-corpus index vs FTS5)
        "rank_identity": rank_gate,
    }
    print(json.dumps(out))
    os.makedirs("BENCH", exist_ok=True)
    # run history: the shared-host VM shows large run-to-run variance (the
    # measured numpy ceiling has ranged 0.34-0.72 across identical runs), so
    # every run is appended and the report shows the history, not one draw
    with open("BENCH/history.jsonl", "a") as hf:
        hf.write(json.dumps(out) + "\n")
    write_scaling_report(out)
    shutil.rmtree(corpus_root, ignore_errors=True)


def write_scaling_report(out: dict) -> None:
    """Regenerate BENCH/BASELINE.md from BENCH/history.jsonl + this run.
    Separate from the measurement so it can be smoke-tested (and re-run)
    without a 15-minute scaling pass."""
    results = {8: out["local8"], 32: out["local32"]}
    sf, n_docs, git_rev = out["sf"], out["corpus_docs"], out["git"]
    eff = out["scaling_efficiency"]
    ceiling = out["numpy_ceiling_efficiency"]
    rep_ceiling = out["representative_ceiling_efficiency"]
    # headline normalized figure — SAME formula as _norm / every history
    # row: divide by min(1.0, ceiling), then cap the ratio at 1.0 (ADVICE
    # r4: the headline previously divided by the RAW ceiling, so a draw
    # whose kernel ratio exceeded linear under-reported relative to its own
    # history-row value); annotate when the cap bites
    headline_norm = round(eff / min(1.0, rep_ceiling), 3)
    kernel_corrupt = headline_norm > 1.0
    headline_norm = min(1.0, headline_norm)
    history = []
    with open("BENCH/history.jsonl") as hf:
        for line in hf:
            try:
                history.append(json.loads(line))
            except ValueError:
                pass
    # "current version" = rows whose BENCH-RELEVANT code matches HEAD's —
    # commits to unexercised modules (pipeline/, docs, tests) don't orphan
    # comparable rows. Fingerprints are recomputed from each row's commit.
    cur_fp = build_code_fingerprint("HEAD")
    fp_cache: dict = {}

    def _same_code(h) -> bool:
        rev = h.get("git", "")
        if not rev:
            return False
        if rev == git_rev:
            return True
        if rev not in fp_cache:
            fp_cache[rev] = build_code_fingerprint(rev)
        return bool(cur_fp) and fp_cache[rev] == cur_fp

    cur = [h for h in history if _same_code(h)] or history

    def _fmt(v):
        return "" if v is None else v

    def _norm(h, eff_key: str, ceil_key: str):
        """Row-consistent normalized efficiency: min(1, raw / min(1, ceiling))
        — both caps applied retroactively so history rows recorded before
        them get the same treatment as new ones (falls back to the stored
        value when the row predates the ceiling fields). The outer cap stops
        a contention-corrupted kernel draw (ceiling far below the build's own
        ratio) from reporting >1 'efficiency' and inflating medians."""
        e, c = h.get(eff_key), h.get(ceil_key)
        if e is None or not c:
            v = h.get(
                "ceiling_normalized_efficiency"
                if eff_key == "scaling_efficiency"
                else "ceiling_normalized_efficiency_4_16"
            )
            return None if v is None else min(1.0, v)
        return min(1.0, round(e / min(1.0, c), 3))

    hist_rows = "\n".join(
        f"| {h.get('git', 'r1')}{' *' if _same_code(h) else ''} | "
        f"{h['corpus_docs']} | {h['local8']['docs_per_sec']} | "
        f"{h['local32']['docs_per_sec']} | {h['scaling_efficiency']} | "
        f"{h.get('representative_ceiling_efficiency', h.get('hardware_ceiling_efficiency', ''))} | "
        f"{_fmt(_norm(h, 'scaling_efficiency', 'representative_ceiling_efficiency'))} | "
        f"{_fmt(h.get('scaling_efficiency_4_16'))} | "
        f"{_fmt(_norm(h, 'scaling_efficiency_4_16', 'representative_ceiling_efficiency_4_16'))} |"
        for h in history
    )

    def _median(vals):
        vals = sorted(v for v in vals if v is not None)
        if not vals:
            return None
        mid = len(vals) // 2
        return vals[mid] if len(vals) % 2 else round(
            (vals[mid - 1] + vals[mid]) / 2, 3
        )

    med_norm = _median(
        _norm(h, "scaling_efficiency", "representative_ceiling_efficiency")
        for h in cur
    )
    med_raw = _median(h["scaling_efficiency"] for h in cur)
    med_raw416 = _median(h.get("scaling_efficiency_4_16") for h in cur)
    med_norm416 = _median(
        _norm(h, "scaling_efficiency_4_16", "representative_ceiling_efficiency_4_16")
        for h in cur
    )

    # Pairing-noise-robust companion: median(raw)/min(1, median(ceiling))
    # over the same row set. The per-draw normalized value divides two
    # numbers measured minutes apart on a shared VM, so one corrupted
    # kernel draw (e.g. a ceiling of 0.19 = the kernel running SLOWER at
    # 32 threads than 8) produces a nonsense row ratio; taking the two
    # medians independently before dividing is robust to that pairing
    # noise while measuring the same quantity.
    def _ratio_of_medians(eff_key: str, ceil_key: str):
        ceils = _median(
            min(1.0, h[ceil_key]) for h in cur if h.get(ceil_key)
        )
        raws = _median(h.get(eff_key) for h in cur)
        if not ceils or raws is None:
            return None
        return min(1.0, round(raws / ceils, 3))

    rom_b = _ratio_of_medians(
        "scaling_efficiency", "representative_ceiling_efficiency"
    )
    rom_a = _ratio_of_medians(
        "scaling_efficiency_4_16", "representative_ceiling_efficiency_4_16"
    )

    # Contention-gated medians (VERDICT r3 item 3): a representative-kernel
    # ceiling below ~0.4 means the PURE kernel — zero shuffle, zero driver —
    # scaled worse than 1.6x from 4x threads during that draw, i.e. the
    # host itself was collapsed; such draws measure the VM's neighbors, not
    # this code. The gate uses only kernel-side evidence (never the build's
    # own numbers), so it cannot cherry-pick good build draws.
    KERNEL_GATE = 0.4
    gated = [
        h for h in cur
        if (h.get("representative_ceiling_efficiency") or 0) >= KERNEL_GATE
    ]
    gmed_raw = _median(h["scaling_efficiency"] for h in gated)
    gmed_norm = _median(
        _norm(h, "scaling_efficiency", "representative_ceiling_efficiency")
        for h in gated
    )
    n_gated, n_cur = len(gated), len(cur)

    eff416 = out.get("scaling_efficiency_4_16")
    rep416 = out.get("representative_ceiling_efficiency_4_16")
    curve_table = ""
    pair416 = ""
    if "local4" in out:
        r4, r16 = out["local4"], out["local16"]
        curve_table = (
            f"| local[4]  | {r4['build_sec']} | {r4['docs_per_sec']} | {r4['postings_per_sec']} | — |\n"
            f"| local[16] | {r16['build_sec']} | {r16['docs_per_sec']} | {r16['postings_per_sec']} | — |\n"
        )
        pair416 = f"""
**Pair A — local[4] → local[16] (N → 4N in the host's linear thread
region): raw efficiency {eff416} = {r16['docs_per_sec']} / (4 x
{r4['docs_per_sec']}).** The same-pair string-kernel ceiling is
{rep416} ({round(4 * rep416, 2)}x), i.e. at these thread counts the
host genuinely delivers ~4x compute from 4x threads — this pair is the
faithful analog of N → 4N dedicated-core executors, and its raw number
needs no normalization. Median across current-code runs:
raw {med_raw416 if med_raw416 is not None else '(first run)'},
normalized {med_norm416 if med_norm416 is not None else '(first run)'}.
"""
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            f"""# BENCH — measured numbers (see BASELINE.md for targets)

Corpus: {n_docs} synthetic web pages (FIXTURES.md §1, seed=42), sf={sf}.
Same input, same job, four parallelism levels — the sandbox stand-in for the
north_rule's N vs 4N executors (no real cluster available here). Two N → 4N
pairs are reported: 4 → 16 (both configs in the host's linear region) and
8 → 32 (the large config spans the host's SMT/contended threads).

| config | build sec | docs/sec | postings/sec | mean BM25 top-10 sec |
|---|---|---|---|---|
{curve_table}| local[8]  | {results[8]['build_sec']} | {results[8]['docs_per_sec']} | {results[8]['postings_per_sec']} | {results[8]['fts_mean_query_sec']} |
| local[32] | {results[32]['build_sec']} | {results[32]['docs_per_sec']} | {results[32]['postings_per_sec']} | {results[32]['fts_mean_query_sec']} |

Target: scaling efficiency >= 0.8 from N to 4N (BASELINE.json north_rule).

Protocol (pre-registered in bench.py:SCALING_PREREG before the round-5
window opened): fixed {SCALING_PREREG['window_draws']}-draw window, no
optional stopping; primary statistic pair A = {SCALING_PREREG['primary_pair_a']};
primary statistic pair B = {SCALING_PREREG['primary_pair_b']}; all other
figures are secondary. Every scaling session first passes a rank-identity
gate (engine top-200 vs the FTS5 oracle on a 10k-doc index,
{out.get('rank_identity', {}).get('rank_identity_queries', '—')} queries
this session) — a session whose results diverge records nothing.
{pair416}
**Pair B — local[8] → local[32]: raw efficiency
{results[32]['docs_per_sec']} / (4 x {results[8]['docs_per_sec']}) =
{round(eff, 3)}.** This host cannot deliver 4x throughput from 4x threads
beyond ~16 — the upper threads are SMT siblings / contended on a shared
VM — so pair B's raw number is bounded by a hardware ceiling measured
directly, with two kernels:

- **numpy-compute ceiling: {round(ceiling, 3)}** — embarrassingly parallel
  numpy (sin/sum) tasks, no shuffle, no driver work: {round(4 * ceiling, 2)}x
  from 8 -> 32 pinned threads.
- **representative ceiling: {round(rep_ceiling, 3)}** — the build's own
  stage-1 hot loop (HTML extraction + unicode61 tokenization + Porter) as a
  pure map over the same corpus generator, again zero shuffle / zero driver:
  {round(4 * rep_ceiling, 2)}x from 8 -> 32. String/memory-bandwidth-bound
  work gains less from SMT siblings than numpy compute, which is why this
  ceiling is lower — and it, not the numpy one, is what an indexing job can
  actually reach here.

**Pair B ceiling-normalized efficiency: {headline_norm}**{
    " (capped at 1.0 — this draw's representative kernel was itself"
    " contention-corrupted, so the raw ratio exceeded 1; defer to the"
    " medians below)" if kernel_corrupt else
    f" (= {round(eff, 3)} / {round(rep_ceiling, 3)})"
} — the fraction of the
achievable scaling the FULL build (including its one wide shuffle, the
partitioned writes, and all driver work) actually delivers. Everything the
full build loses relative to the representative kernel is pipeline overhead
we own ({round(max(0.0, (1 - eff / rep_ceiling)) * 100, 1)}% this draw;
single draws swing with shared-host noise — judge the run history below).

Method: each config runs in its own process pinned with `taskset` (local[8]
on cores 0-7, etc.) so JVM helper threads cannot borrow idle cores; shuffle
scratch and index output live on tmpfs (/dev/shm) because on a real cluster
shuffle/sink bandwidth scales with executor count (per-executor disks),
while here all configs would contend for one shared VM disk whose variable
bandwidth otherwise dominates the write phase; job
layout ({SCALING_PARTS} gen partitions, {SCALING_SHARDS} shards) is identical
in every config; each build is preceded by a warm-up build (JIT/codegen);
the primary pair (8, 32) is measured best-of-2 builds + best-of-2 queries,
the curve pair (4, 16) best-of-{SCALING_LITE_BUILDS} builds; kernels best-of-2. Config order is
8, 32, 4, 16 so each pair's two builds run back-to-back, minimizing host
drift within a pair.

## Run history (shared-host variance is large; judge the distribution)

Normalized columns divide raw efficiency by min(1.0, measured string-kernel
ceiling) — a ceiling above linear is noise in the small config's kernel draw
and would otherwise deflate the metric; the cap is applied uniformly to all
rows, current and historical.

**Medians over runs of the CURRENT code version ({git_rev or 'r1'}):
pair B (8→32) raw {med_raw}, normalized {med_norm}; pair A (4→16) raw
{med_raw416 if med_raw416 is not None else '—'}, normalized
{med_norm416 if med_norm416 is not None else '—'}.**
**Pairing-noise-robust normalized (median raw / median capped ceiling,
immune to single corrupted kernel draws): pair B
{rom_b if rom_b is not None else '—'}, pair A
{rom_a if rom_a is not None else '—'}.**
**Contention-gated pair-B medians (draws whose string-kernel ceiling ≥ 0.4 —
kernel-side evidence only, so the gate cannot cherry-pick build draws;
{n_gated}/{n_cur} current-code draws pass): raw
{gmed_raw if gmed_raw is not None else '—'}, normalized
{gmed_norm if gmed_norm is not None else '—'}.** Rows are tagged with
the commit that produced them; `*` marks rows whose bench-relevant code
(corpus gen, build, query path, and the harness's measurement knobs) is
identical to HEAD's — those are the rows the medians are over. The r2
shuffle-payload packing + zstd writes changed build throughput ~2x, so
earlier rows describe earlier code, not this engine. The 4→16 columns exist
only for rows measured after the curve pair was added.

| code | docs | 8c docs/s | 32c docs/s | 8→32 raw | repr ceiling | 8→32 norm | 4→16 raw | 4→16 norm |
|---|---|---|---|---|---|---|---|---|
{hist_rows}
"""
        )


if __name__ == "__main__":
    main()
