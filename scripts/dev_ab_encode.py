"""A/B the postings-encode stage's cost components at one thread count.

After one bench-shaped build, times variants of the encode stage over the
same doc_text store, interleaved A/B/A/B to ride out host noise:

    drain    store read -> passthrough python (JVM read + Arrow cost)
    enc      store read -> real encode -> count (no write)
    zstd     store read -> real encode -> parquet write (zstd, prod default)
    lz4      store read -> real encode -> parquet write (lz4)
    enc2k    enc with arrow batch 2048 (pipelining)

Usage: taskset -c 0-31 python scripts/dev_ab_encode.py 32 [n_docs] [reps]
"""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 250_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    scratch = f"/dev/shm/spark_graft_ab_{cpus}"
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch, exist_ok=True)
    os.environ["SPARK_GRAFT_LOCAL_DIR"] = os.path.join(scratch, "local")
    os.environ.setdefault("SPARK_DRIVER_MEM", "16g")

    import pandas as pd

    from bench import _read_corpus, materialize_corpus
    from pdfsearch_spark.index_build import (
        DOC_STORE_SCHEMA,
        POSTING_SCHEMA,
        _whole_file_scans,
        build_index,
        encode_docs_partitions,
    )
    from pdfsearch_spark.session import get_spark

    spark = get_spark("ab", master=f"local[{cpus}]", shuffle_partitions=cpus)
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

        store = spark.read.schema(DOC_STORE_SCHEMA).parquet(
            os.path.join(index_dir, "doc_text")
        )
        enc = encode_docs_partitions(avgdl)

        def drain_fn(it):
            n = 0
            for pdf in it:
                n += len(pdf)
            yield pd.DataFrame({"n": [n]})

        def run(name: str) -> float:
            t0 = time.time()
            with _whole_file_scans(spark):
                rows = store.select("shard", "doc_id", "text")
                if name == "drain":
                    rows.mapInPandas(drain_fn, schema="n long").count()
                elif name in ("enc", "enc2k"):
                    if name == "enc2k":
                        spark.conf.set(
                            "spark.sql.execution.arrow.maxRecordsPerBatch", "2048"
                        )
                    rows.mapInPandas(enc, schema=POSTING_SCHEMA).select(
                        "term"
                    ).count()
                    if name == "enc2k":
                        spark.conf.set(
                            "spark.sql.execution.arrow.maxRecordsPerBatch", "10000"
                        )
                elif name in ("zstd", "lz4"):
                    spark.conf.set("spark.sql.parquet.compression.codec", name)
                    rows.mapInPandas(enc, schema=POSTING_SCHEMA).write.mode(
                        "overwrite"
                    ).parquet(os.path.join(scratch, f"post_{name}"))
                    spark.conf.set("spark.sql.parquet.compression.codec", "zstd")
            return time.time() - t0

        variants = ["drain", "enc", "zstd", "lz4", "enc2k"]
        for v in variants:  # warm each path once
            run(v)
        results: dict[str, list[float]] = {v: [] for v in variants}
        for _ in range(reps):
            for v in variants:
                results[v].append(run(v))
        print(f"\n{'variant':8s} runs (s)                 median")
        for v in variants:
            rs = sorted(results[v])
            med = rs[len(rs) // 2]
            print(
                f"{v:8s} {' '.join(f'{x:6.2f}' for x in results[v])}   {med:6.2f}"
            )
    finally:
        spark.stop()
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
