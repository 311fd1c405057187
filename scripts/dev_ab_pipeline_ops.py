"""Repeated-draw timing of the pipeline ops VERDICT r2 flagged as possibly
regressed (q_minhash_lsh_pairs 4.2->10.8s, q_ngram_jaccard 6.8->20.4s,
q_cosine_topk 1.1->2.2s, q_ann_lsh 1.0->2.0s, q_bm25_ws 2.8->4.2s r1->r2).

Runs each op K times in one pinned session at the bench sf dir and prints
min/median/max per op. If the r1 AND r2 recorded values both fall inside
the spread observed here for unchanged code, the delta is shared-host
noise, not a code regression; a true regression shows as the whole HEAD
distribution sitting at/above the r2 value. Results go into
BENCH/AB_PIPELINE.md.

Usage: taskset -c 0-31 python scripts/dev_ab_pipeline_ops.py [K]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OPS = [
    "q_minhash_lsh_pairs",
    "q_ngram_jaccard",
    "q_cosine_topk",
    "q_ann_lsh",
    "q_bm25_ws",
]
R1R2 = {  # recorded official values (BENCH_r01/BENCH_r02 at sf0.1)
    "q_minhash_lsh_pairs": (4.2, 10.8),
    "q_ngram_jaccard": (6.8, 20.4),
    "q_cosine_topk": (1.1, 2.2),
    "q_ann_lsh": (1.0, 2.0),
    "q_bm25_ws": (2.8, 4.2),
}


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from pdfsearch_spark.session import get_spark

    spark = get_spark("ab", master="local[32]", shuffle_partitions=32)
    qs = entrymod.queries()
    results: dict[str, list[float]] = {o: [] for o in OPS}
    try:
        # warm: one untimed pass (JIT, file listing, python workers)
        for op in OPS:
            qs[op](spark, sf_dir).write.format("noop").mode("overwrite").save()
        for i in range(k):
            for op in OPS:
                spark.catalog.clearCache()
                t0 = time.time()
                qs[op](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                results[op].append(round(time.time() - t0, 3))
            print(f"pass {i + 1}/{k}: " + json.dumps(
                {o: results[o][-1] for o in OPS}))
    finally:
        spark.stop()

    print("\nop                     r1    r2    HEAD min/med/max   verdict")
    for op in OPS:
        v = sorted(results[op])
        r1, r2 = R1R2[op]
        lo, med, hi = v[0], v[len(v) // 2], v[-1]
        # noise-attributed when the r1..r2 band overlaps the HEAD spread
        noise = lo <= r2 and hi >= r1
        verdict = "noise" if noise else (
            "regressed" if lo > r2 else "improved")
        print(
            f"{op:22s} {r1:5.1f} {r2:5.1f}  "
            f"{lo:5.2f}/{med:5.2f}/{hi:5.2f}      {verdict}"
        )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
