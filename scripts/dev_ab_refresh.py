"""Pinned repeated-draw timing of the refresh + compaction phase (VERDICT r3
item 2: refresh_append_10pct moved 16.0s (r2) -> 22.0s (r3) without a pinned
A/B; unlike the five pipeline ops this phase was never re-measured under
controlled conditions).

Method mirrors BENCH/AB_PIPELINE.md: one taskset-pinned local[32] session,
the EXACT bench formulation (bench.run_refresh_bench — same corpus source,
same 10% append, same compaction + timed queries), K draws. Each draw gets a
pristine copy of one prebuilt 2-shard-free 20k-doc index, so only the
refresh/compact phase is timed and every draw starts from the identical
single-segment state the official bench starts from. If the HEAD K-draw
median is at/below the r2 official 16.0s, r3's 22.0s was a host-noise draw;
a true regression shows the whole distribution sitting at ~22s.

Usage: taskset -c 0-31 python scripts/dev_ab_refresh.py [K]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

R2_OFFICIAL = 16.0  # BENCH_r02 refresh_append_10pct at sf0.1 / local[32]
R3_OFFICIAL = 22.0  # BENCH_r03

BASE = "/tmp/ab_refresh_base_index"
RUN = "/tmp/ab_refresh_run_index"


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    os.environ.setdefault("SPARK_DRIVER_MEM", "16g")

    import bench
    from pdfsearch_spark.session import get_spark

    n_docs = bench.corpus_size(0.1)
    spark = get_spark("ab-refresh", master="local[32]", shuffle_partitions=32)
    draws: list[dict] = []
    try:
        bench._warm(spark)
        corpus_path = BASE + "_corpus"
        bench.materialize_corpus(spark, n_docs, corpus_path)
        # one warm throwaway + the measured base build, like the bench
        bench.run_build_and_search(
            spark, n_docs, n_shards=64, index_dir=BASE,
            with_queries=False, corpus_path=corpus_path,
        )
        for i in range(k):
            shutil.rmtree(RUN, ignore_errors=True)
            shutil.copytree(BASE, RUN)
            spark.catalog.clearCache()
            t0 = time.time()
            times = bench.run_refresh_bench(spark, n_docs, RUN)
            times["draw_total"] = round(time.time() - t0, 3)
            draws.append(times)
            print(f"draw {i + 1}: {json.dumps(times)}", flush=True)
    finally:
        spark.stop()
        shutil.rmtree(RUN, ignore_errors=True)

    for key in ("refresh_append_10pct", "compact", "compact_query_speedup"):
        vals = sorted(d[key] for d in draws)
        med = vals[len(vals) // 2]
        print(
            f"{key}: min={vals[0]} med={med} max={vals[-1]}"
        )
    med_refresh = sorted(d["refresh_append_10pct"] for d in draws)[k // 2]
    verdict = (
        "<= r2 official: r3's 22.0s attributed to host noise"
        if med_refresh <= R2_OFFICIAL
        else "ABOVE r2 official: real overhead, investigate"
    )
    print(f"refresh median {med_refresh} vs r2={R2_OFFICIAL} r3={R3_OFFICIAL}: {verdict}")


if __name__ == "__main__":
    main()
