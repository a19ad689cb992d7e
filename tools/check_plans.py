"""Physical-plan invariant checks for the headline queries.

Asserts the scale-critical plan properties hold (the things that decay
silently as queries evolve): column pruning at the parquet scan, filter
pushdown where filters exist, broadcast joins for dim tables, and no
cartesian products outside the brute-force ANN baseline (which is a
deliberate broadcast cross of a tiny query set).

Run: python tools/check_plans.py  → one line per query, exits non-zero
on any violation.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# query → (max columns any scan may read, expects_pushed_filters,
#          allow_nested_loop_or_cartesian)
EXPECT = {
    "flagship_revenue_by_nation": (5, True, False),
    "filter_range_project": (7, True, False),
    "group_agg_ref7": (3, False, False),
    "join_ref_inner": (8, True, False),
    "latest_per_group": (4, False, False),
    "window_running_sum": (4, False, False),
    "asof_join": (5, True, False),
    "tumbling_window": (3, True, False),
    "session_window": (3, True, False),
    "dedup_exact": (2, False, False),
    "minhash_lsh_pairs": (2, False, False),
    "token_counts": (2, False, False),
    "cosine_topk": (2, True, True),  # broadcast NLJ of 5-row query set: intended
    "stat_summary": (3, False, True),  # crossJoin of two 1-row aggregates: intended
    "session_ids": (3, False, False),
    "hourly_change": (2, False, False),
    "interval_overlap_join": (3, True, False),
    "corpus_filter_pipeline": (3, True, False),
    "asof_join_forward_tol": (6, True, False),
    "redact_pii": (2, False, False),
}


def main() -> int:
    from covid_custom_sql_engine_spark import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("check_plans")
    qs = entrymod.queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    failures = 0
    for name, (max_cols, want_pushed, allow_nlj) in EXPECT.items():
        plan = qs[name](spark, sf_dir)._jdf.queryExecution().explainString(mode)
        probs = []
        for schema in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
            ncols = len([c for c in schema.split(",") if c])
            if ncols > max_cols:
                probs.append(f"scan reads {ncols} cols (max {max_cols}) — pruning regressed")
        if want_pushed:
            pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
            if not any(p.strip() for p in pushed):
                probs.append("no PushedFilters — filter pushdown regressed")
        if not allow_nlj:
            for bad in ("BroadcastNestedLoopJoin", "CartesianProduct"):
                if bad in plan:
                    probs.append(f"{bad} in plan — join degenerated")
        status = "OK" if not probs else "VIOLATION"
        print(f"{status} {name}" + ("" if not probs else ": " + "; ".join(probs)))
        failures += bool(probs)
    print(f"{len(EXPECT) - failures} ok, {failures} violations")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
