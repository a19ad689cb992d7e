"""Dump ``explain("formatted")`` for named queries to files.

Usage: python tools/capture_plans.py <outdir> <suffix> [query ...]
Writes <outdir>/<query>_<suffix>.txt for each query (default: the
bench HEADLINE + SCALE_REHEARSAL set). The optimization-round judge
reads these against the claims in OPTIMIZATION_r*.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    from covid_custom_sql_engine_spark import get_spark
    import __spark_entry__ as entrymod

    if not names:
        import bench

        names = list(bench.HEADLINE) + list(bench.SCALE_REHEARSAL)

    spark = get_spark("capture_plans")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = entrymod.queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
