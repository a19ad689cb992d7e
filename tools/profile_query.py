"""Time one or more registry queries in isolation (noop sink, best-of-N).

Usage: python tools/profile_query.py [-n RUNS] <query> [query ...]

Same methodology as bench.py (clearCache between runs, noop sink, JVM
warm-up first) but scoped to the named queries so a single operator can
be measured without the full 70-query suite (guide §1.4). With
SPARK_GRAFT_UI=true it additionally reports per-run deltas of total
executor CPU time / run time / shuffle bytes from the UI REST API —
CPU time is far more robust than wall clock on a machine with noisy
ambient load (this sandbox's host load drifts by >2×).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _metrics_snapshot(spark):
    """Sum of task metrics across all stages so far (UI REST API)."""
    try:
        import json
        import urllib.request

        base = spark.sparkContext.uiWebUrl
        if not base:
            return None
        app_id = spark.sparkContext.applicationId
        url = f"{base}/api/v1/applications/{app_id}/stages?status=complete"
        with urllib.request.urlopen(url, timeout=10) as r:
            stages = json.load(r)
        out = {"cpu_s": 0.0, "run_s": 0.0, "shuffle_mb": 0.0, "tasks": 0}
        for s in stages:
            out["cpu_s"] += s.get("executorCpuTime", 0) / 1e9
            out["run_s"] += s.get("executorRunTime", 0) / 1e3
            out["shuffle_mb"] += (
                s.get("shuffleReadBytes", 0) + s.get("shuffleWriteBytes", 0)
            ) / 1e6
            out["tasks"] += s.get("numCompleteTasks", 0)
        return out
    except Exception:
        return None


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    if args and args[0] == "-n":
        runs = int(args[1])
        args = args[2:]
    names = args

    from covid_custom_sql_engine_spark import get_spark
    import __spark_entry__ as entrymod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_query")
    qs = entrymod.queries()

    # warm-up (bench.py methodology)
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.range(10_000).write.format("noop").mode("overwrite").save()
    from covid_custom_sql_engine_spark.catalog import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t)

    for name in names:
        fn = qs[name]
        times = []
        deltas = []
        for _ in range(runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"profile:{name}")
            m0 = _metrics_snapshot(spark)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
            m1 = _metrics_snapshot(spark)
            if m0 is not None and m1 is not None:
                deltas.append({k: m1[k] - m0[k] for k in m0})
        line = f"{name}: best={min(times):.3f}s runs=" + ",".join(
            f"{t:.3f}" for t in times
        )
        if deltas:
            best = min(d["cpu_s"] for d in deltas)
            bestr = min(d["run_s"] for d in deltas)
            d0 = deltas[-1]
            line += (
                f" | cpu_min={best:.2f}s runtime_min={bestr:.2f}s"
                f" shuffle={d0['shuffle_mb']:.1f}MB tasks={d0['tasks']}"
            )
        print(line)


if __name__ == "__main__":
    main()
