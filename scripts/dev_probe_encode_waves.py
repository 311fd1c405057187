"""Probe the postings-encode first-wave penalty at local[32].

Runs the bench-shaped build once (warm + measured input tables), then
executes the encode+write stage TWICE in the same session over the same
doc_text store, with the input iterator instrumented via an accumulator:

    per task: (wait_first_batch_sec, consume_sec, python_work_sec, pid)

If run 2 loses the wave-1 penalty -> per-JVM/per-worker warm-up tied to the
stage; if wait_first_batch dominates wave 1 -> JVM input side (parquet read
/ Arrow) is the bottleneck, not Python.

Usage: taskset -c 0-31 python scripts/dev_probe_encode_waves.py 32 [n_docs]
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 250_000

    scratch = f"/dev/shm/spark_graft_ew_{cpus}"
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch, exist_ok=True)
    os.environ["SPARK_GRAFT_LOCAL_DIR"] = os.path.join(scratch, "local")
    os.environ.setdefault("SPARK_DRIVER_MEM", "16g")

    from pyspark.accumulators import AccumulatorParam

    from bench import _read_corpus, materialize_corpus
    from pdfsearch_spark.index_build import (
        DOC_STORE_SCHEMA,
        POSTING_SCHEMA,
        _whole_file_scans,
        build_index,
        encode_docs_partitions,
    )
    from pdfsearch_spark.session import get_spark

    class ListParam(AccumulatorParam):
        def zero(self, v):
            return []

        def addInPlace(self, a, b):
            a.extend(b)
            return a

    spark = get_spark("ew", master=f"local[{cpus}]", shuffle_partitions=cpus)
    index_dir = os.path.join(scratch, "index")
    corpus_dir = "/dev/shm/spark_prof_corpus"
    try:
        if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
            materialize_corpus(spark, n_docs, corpus_dir, 256)
        if not os.path.exists(os.path.join(corpus_dir + "_warm", "_SUCCESS")):
            materialize_corpus(spark, 20_000, corpus_dir + "_warm", 64)
        pages_w = _read_corpus(spark, corpus_dir + "_warm", 64)
        build_index(spark, pages_w, index_dir + "_warm", n_shards=128)
        pages = _read_corpus(spark, corpus_dir, 256)
        m = build_index(spark, pages, index_dir, n_shards=128)
        print(f"build: {m['elapsed_sec']:.1f}s  phases={m['phase_sec']}")
        avgdl = m["avgdl"]

        acc = spark.sparkContext.accumulator([], ListParam())

        inner = encode_docs_partitions(avgdl)

        def fn(it):
            t_enter = time.perf_counter()
            state = {"wait0": None, "consume": 0.0, "shard": -1, "n": 0}

            def timed(it):
                t_prev = time.perf_counter()
                for pdf in it:
                    now = time.perf_counter()
                    if state["wait0"] is None:
                        state["wait0"] = now - t_enter
                        if len(pdf):
                            state["shard"] = int(pdf["shard"].iloc[0])
                    state["consume"] += now - t_prev
                    state["n"] += len(pdf)
                    yield pdf
                    t_prev = time.perf_counter()

            for out in inner(timed(it)):
                yield out
            total = time.perf_counter() - t_enter
            acc.add(
                [
                    (
                        state["shard"],
                        round(state["wait0"] or 0.0, 3),
                        round(state["consume"], 3),
                        round(total, 3),
                        state["n"],
                        os.getpid(),
                    )
                ]
            )

        store = spark.read.schema(DOC_STORE_SCHEMA).parquet(
            os.path.join(index_dir, "doc_text")
        )
        for run in (1, 2):
            acc.value.clear()
            t0 = time.time()
            with _whole_file_scans(spark):
                rows = store.select("shard", "doc_id", "text")
                post = rows.mapInPandas(fn, schema=POSTING_SCHEMA)
                post.write.mode("overwrite").parquet(
                    os.path.join(scratch, f"post_run{run}")
                )
            wall = time.time() - t0
            vals = sorted(acc.value)
            pids = {}
            print(f"\nrun {run}: wall={wall:.2f}s  tasks={len(vals)}")
            print("shard  wait0  consume  total  rows   pid")
            slow = [v for v in vals if v[3] > 2.0]
            fast = [v for v in vals if v[3] <= 2.0]
            for label, group in (("SLOW", slow), ("fast", fast[:6])):
                for s, w0, c, t, n, pid in group[:40]:
                    fresh = pid not in pids
                    pids.setdefault(pid, s)
                    print(
                        f"{label} {s:4d} {w0:6.2f} {c:8.2f} {t:6.2f} {n:6d} "
                        f"{pid}{' NEW' if fresh else ''}"
                    )
            npids = len({v[5] for v in vals})
            print(f"distinct worker pids: {npids}; slow tasks: {len(slow)}")
    finally:
        spark.stop()
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
