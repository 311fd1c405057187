"""Phase-level occupancy profile of one pinned index build.

Runs the exact scaling-bench build (warm + measured) at a given thread
count with the Spark event log on, then buckets every task into the
build's sequential phases by launch time and reports, per phase:

    wall        phase wall-clock (from build_index's own phase timers)
    task_sum    sum of task executor run times
    occupancy   task_sum / (wall * cpus)  -- 1.0 = all threads busy
    gc          sum of JVM GC time
    deser       sum of executor deserialize time
    shuf_w      sum of shuffle write time

Low occupancy = threads idle (driver/serial work, stragglers, scheduling
gaps); high GC share = heap churn. This is a dev diagnostic, not a bench.

Usage:  taskset -c 0-7 python scripts/dev_scaling_profile.py 8 [n_docs]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = int(sys.argv[1])
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 250_000

    evdir = f"/dev/shm/spark_evlog_{cpus}"
    shutil.rmtree(evdir, ignore_errors=True)
    os.makedirs(evdir, exist_ok=True)
    scratch = f"/dev/shm/spark_graft_prof_{cpus}"
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch, exist_ok=True)
    os.environ["SPARK_GRAFT_LOCAL_DIR"] = os.path.join(scratch, "local")
    # match the scaling bench's heap (bench.scaling_worker): at 32 threads
    # the 8 GB default GC-thrashes and the profile measures the heap, not
    # the engine
    os.environ.setdefault("SPARK_DRIVER_MEM", "16g")
    # ad-hoc conf experiments: PROF_EXTRA_CONFS="k=v,k2=v2"
    extra = " ".join(
        f"--conf {kv}"
        for kv in os.environ.get("PROF_EXTRA_CONFS", "").split(",")
        if kv
    )
    os.environ["PYSPARK_SUBMIT_ARGS"] = (
        f"--conf spark.eventLog.enabled=true "
        f"--conf spark.eventLog.dir=file:{evdir} "
        f"--conf spark.eventLog.compress=false "
        f"--conf spark.eventLog.rolling.enabled=false "
        f"{extra} "
        f"--conf spark.ui.showConsoleProgress=false pyspark-shell"
    )

    from bench import _read_corpus, materialize_corpus
    from pdfsearch_spark.index_build import build_index
    from pdfsearch_spark.session import get_spark

    spark = get_spark("prof", master=f"local[{cpus}]", shuffle_partitions=cpus)
    index_dir = os.path.join(scratch, "index")
    corpus_dir = "/dev/shm/spark_prof_corpus"  # shared across cpu configs
    try:
        # stored-table input, same as the bench (materialized untimed)
        materialize_corpus(spark, 20_000, corpus_dir + "_warm", 64)
        materialize_corpus(spark, n_docs, corpus_dir, 256)
        # warm build (JIT/codegen/python workers), small
        pages_w = _read_corpus(spark, corpus_dir + "_warm", 64)
        build_index(spark, pages_w, index_dir + "_warm", n_shards=128)

        pages = _read_corpus(spark, corpus_dir, 256)
        t0 = time.time()
        m = build_index(spark, pages, index_dir, n_shards=128)
        t0_ms = t0 * 1000.0
        print(
            f"\nbuild {n_docs} docs on local[{cpus}]: "
            f"{m['elapsed_sec']:.1f}s  {m['docs_per_sec']:.0f} docs/s"
        )
        # phase boundaries (ms since epoch) from the sequential phase walls
        bounds = []
        cur = t0_ms
        for name, sec in m["phase_sec"].items():
            cur += sec * 1000.0
            bounds.append((name, cur))
        bounds.append(("tail", float("inf")))
        spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty(10_000)
    finally:
        spark.stop()

    # parse the event log: per-task metrics, bucketed by launch time
    time.sleep(1.0)
    logs = sorted(
        glob.glob(os.path.join(evdir, "*", "events_*"))
        + [p for p in glob.glob(os.path.join(evdir, "*")) if os.path.isfile(p)],
        key=os.path.getmtime,
    )
    agg: dict[str, list[float]] = {}
    walls: dict[str, float] = dict(
        (n, s) for n, s in m["phase_sec"].items()
    )
    prev = t0_ms
    spans: dict[str, tuple[float, float]] = {}
    for name, end in bounds[:-1]:
        spans[name] = (prev, end)
        prev = end
    runs_by_phase: dict[str, list[float]] = {}
    tasks_dump: list[tuple] = []
    with open(logs[-1]) as fh:
        for line in fh:
            if '"Event":"SparkListenerTaskEnd"' not in line:
                continue
            ev = json.loads(line)
            ti = ev.get("Task Info", {})
            tm = ev.get("Task Metrics") or {}
            launch = ti.get("Launch Time", 0)
            if launch < t0_ms:
                continue
            phase = "tail"
            for name, (lo, hi) in spans.items():
                if lo <= launch < hi:
                    phase = name
                    break
            run = tm.get("Executor Run Time", 0)
            cpu = tm.get("Executor CPU Time", 0) / 1e6  # ns -> ms
            gc = tm.get("JVM GC Time", 0)
            des = tm.get("Executor Deserialize Time", 0)
            sw = (tm.get("Shuffle Write Metrics") or {}).get(
                "Shuffle Write Time", 0
            ) / 1e6
            spill = tm.get("Memory Bytes Spilled", 0)
            a = agg.setdefault(phase, [0.0, 0.0, 0.0, 0.0, 0, 0.0, 0.0])
            a[0] += run / 1000.0
            a[1] += gc / 1000.0
            a[2] += des / 1000.0
            a[3] += sw / 1000.0
            a[4] += 1
            a[5] += cpu / 1000.0
            a[6] += spill / 1e6
            runs_by_phase.setdefault(phase, []).append(run / 1000.0)
            if os.environ.get("PROF_DUMP") and phase.startswith("postings"):
                tasks_dump.append(
                    (
                        launch - t0_ms,
                        run / 1000.0,
                        ti.get("Task ID"),
                        ti.get("Index"),
                    )
                )

    print(
        f"\n{'phase':34s} {'wall':>7s} {'tasks':>6s} {'task_sum':>9s} "
        f"{'cpu_sum':>8s} {'occ':>5s} {'gc':>6s} {'deser':>6s} "
        f"{'shuf_w':>7s} {'spillMB':>8s}"
    )
    for name in list(m["phase_sec"].keys()) + ["tail"]:
        wall = walls.get(name, 0.0)
        run, gc, des, sw, n, cpu, sp = agg.get(
            name, [0.0, 0.0, 0.0, 0.0, 0, 0.0, 0.0]
        )
        occ = run / (wall * cpus) if wall > 0 else 0.0
        print(
            f"{name:34s} {wall:7.2f} {n:6d} {run:9.2f} {cpu:8.2f} "
            f"{occ:5.2f} {gc:6.2f} {des:6.2f} {sw:7.2f} {sp:8.0f}"
        )
        rs = sorted(runs_by_phase.get(name, []))
        if rs and name != "tail":
            print(
                f"    task run: min={rs[0]:.2f} p50={rs[len(rs) // 2]:.2f} "
                f"p90={rs[int(len(rs) * 0.9)]:.2f} max={rs[-1]:.2f}"
            )
    if tasks_dump:
        print("\npostings tasks (launch_rel_s, run_s, task_id, part_index):")
        for la, run, tid, idx in sorted(tasks_dump):
            print(f"  {la / 1000.0:7.2f} {run:7.2f}  task={tid} part={idx}")
    shutil.rmtree(scratch, ignore_errors=True)
    shutil.rmtree(evdir, ignore_errors=True)


if __name__ == "__main__":
    main()
