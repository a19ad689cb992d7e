"""Physical-plan invariants for EVERY registered query (column pruning,
filter pushdown, no unintended nested-loop joins) — the scale properties
that silently decay as queries evolve. Delegates to tools/check_plans.py
so CI and the standalone tool share one guard table."""

from __future__ import annotations

import pytest

# Full-registry audit battery: excluded from the default (driver) test
# path by pytest.ini's `-m "not slow"` — run with `-m ""`. The same
# surface is gated standalone at round end (tools/check_oracle.py /
# check_plans.py / check_bare.py run the full 316-query versions).
pytestmark = pytest.mark.slow

import importlib.util
import os


def test_plan_guards_all_queries(spark, sf_dir):
    spec = importlib.util.spec_from_file_location(
        "check_plans",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "tools", "check_plans.py"),
    )
    cp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cp)
    assert cp.main(spark=spark, sf_dir=sf_dir) == 0


def test_interevent_percentiles_no_object_path_aggregate(spark, sf_dir):
    """VERDICT r2 #5 done-criteria: the grouped percentile query must
    not use Spark's exact `percentile` aggregate (its per-group
    value→count map grows with distinct-value count and merges on one
    reducer — the OOM shape for near-continuous gaps at 100 TB). The
    two-phase bucketed selection keeps per-group state at O(buckets)."""
    import __spark_entry__ as entrymod

    q = entrymod.queries()["interevent_gap_percentiles"]
    plan = q(spark, sf_dir)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "percentile(" not in plan.lower()
