"""Registry-wide flakiness detector: run every query TWICE on fresh
plans and require identical (order-insensitive) results.

The round-2 driver caught `pack_token_budget` returning different rows
across executions (an unpinned RangePartitioner re-sampling between two
jobs) while single-run gates stayed green — by construction, a
correctness oracle cannot see nondeterminism. This gate can: each
execution rebuilds the DataFrame from the registry callable (fresh
sampled exchanges, fresh AQE decisions, fresh shuffles) and the two
result multisets must match cell-for-cell.

Run: python tools/check_determinism.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)
    return str(v)


def table_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from covid_custom_sql_engine_spark import get_spark

    spark = get_spark("determinism_check")
    qs = entrymod.queries()

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            a_df = fn(spark, sf_dir)
            a = table_key(a_df.collect(), a_df.columns)
            b_df = fn(spark, sf_dir)
            b = table_key(b_df.collect(), b_df.columns)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if a == b:
            print(f"PASS {name}: {len(a)} rows stable in {time.time() - t0:.1f}s")
            n_pass += 1
        else:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: {len(a)} vs {len(b)} rows; first diffs {diff}")
            n_fail += 1
    print(f"DETERMINISM GATE: {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
