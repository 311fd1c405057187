"""Probe: why does the postings-encode FIRST WAVE of tasks run ~5x longer
than later waves at local[32]?  Runs the bench-shaped build (warm + measured)
and prints per-shard PYTHON-side encode seconds (from the metrics
accumulator) for shards 0-31 (wave 1) vs the rest — if the Python time
explains the task time, the cost is inside the encode fn (e.g. cold stem
cache); if not, it is outside (worker fork, Arrow init, JVM).

Usage: taskset -c 0-31 python scripts/dev_probe_firstwave.py 32 [n_docs]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 250_000

    scratch = f"/dev/shm/spark_graft_fw_{cpus}"
    import shutil

    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch, exist_ok=True)
    os.environ["SPARK_GRAFT_LOCAL_DIR"] = os.path.join(scratch, "local")
    os.environ.setdefault("SPARK_DRIVER_MEM", "16g")

    from bench import _read_corpus, materialize_corpus
    from pdfsearch_spark.index_build import build_index
    from pdfsearch_spark.session import get_spark

    spark = get_spark("fw", master=f"local[{cpus}]", shuffle_partitions=cpus)
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
        st = (
            spark.read.parquet(os.path.join(index_dir, "_build_state"))
            .select("shard", "encode_sec", "n_docs", "n_postings")
            .toPandas()
            .sort_values("shard")
        )
        w1 = st[st["shard"] < cpus]
        rest = st[st["shard"] >= cpus]
        print(
            f"wave1 (shard<{cpus}): encode_sec p50="
            f"{w1['encode_sec'].median():.2f} max={w1['encode_sec'].max():.2f}"
            f"  docs p50={w1['n_docs'].median():.0f}"
        )
        print(
            f"rest: encode_sec p50={rest['encode_sec'].median():.2f} "
            f"max={rest['encode_sec'].max():.2f} docs p50={rest['n_docs'].median():.0f}"
        )
        print("\nper-shard encode_sec, first 40 shards:")
        for _, r in st.head(40).iterrows():
            print(f"  shard={int(r['shard']):3d} sec={r['encode_sec']:.2f}")
    finally:
        spark.stop()
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
