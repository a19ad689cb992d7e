"""Physical-plan invariants for EVERY registered query (column pruning,
filter pushdown, no unintended nested-loop joins) — the scale properties
that silently decay as queries evolve. Delegates to tools/check_plans.py
so CI and the standalone tool share one guard table."""

from __future__ import annotations

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
