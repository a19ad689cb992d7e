"""Registry base: the QUERIES/ORACLES dicts, the @query decorator, and
the deterministic-aggregate SQL snippet helpers shared by every family
module.

Registry conventions (driver compare = row-count + schema +
order-insensitive value-hash, columns sorted by name):

Each entry exercises one operator/capability from SURVEY.md §2 on the
driver testdata tables. Conventions (driver compare = row-count + schema
+ order-insensitive value-hash, columns sorted by name):

- identical aliases on both sides;
- double-valued *computed* aggregates rounded identically on both sides
  (summation order differs between engines; raw pass-through columns are
  not rounded);
- timestamps emitted as formatted strings on both sides.
"""

from __future__ import annotations

import math

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from covid_custom_sql_engine_spark.catalog import load_table, parallelize_small
from covid_custom_sql_engine_spark.operators import core as ops
from covid_custom_sql_engine_spark.operators import composites as comp
from covid_custom_sql_engine_spark.operators import joins as xjoins
from covid_custom_sql_engine_spark.functions import corpus as cp
from covid_custom_sql_engine_spark.functions import dedup as dd
from covid_custom_sql_engine_spark.functions import similarity as sim
from covid_custom_sql_engine_spark.functions import sketches as sks
from covid_custom_sql_engine_spark.functions import text as tx

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# --- SQL snippets mirroring the deterministic aggregate mode (ops.dsum) ---
# Per-row double math is IEEE-deterministic; fixed-point summation is
# order-independent → bit-identical values on both engines, no rounding.


def _sql_dsum(x: str) -> str:
    return f"CAST(sum(CAST(({x}) AS DECIMAL(38,6))) AS DOUBLE)"


def _sql_dsum12(x: str) -> str:
    """Oracle twin of ``ops.dsum12`` — 12 fractional digits for sums of
    small-magnitude terms (second moments of fraction-valued columns)."""
    return f"CAST(sum(CAST(({x}) AS DECIMAL(38,12))) AS DOUBLE)"


def _sql_davg(x: str) -> str:
    return f"(CASE WHEN count({x}) > 0 THEN {_sql_dsum(x)} / count({x}) END)"


def _sql_dstd(x: str) -> str:
    # round(6): the n·Σx²−(Σx)² cancellation amplifies last-ulp
    # double→decimal cast differences between engines (~1e-10 absolute),
    # so std alone carries a final rounding on both sides.
    n = f"count({x})"
    sx, sxx = _sql_dsum(x), _sql_dsum(f"({x}) * ({x})")
    var = f"(({n} * {sxx} - {sx} * {sx}) / ({n} * ({n} - 1)))"
    return f"(CASE WHEN {n} < 2 THEN NULL ELSE round(sqrt(greatest({var}, 0.0)), 6) END)"


def _sql_safe_corr(x: str, y: str, min_pairs: int = 3) -> str:
    """Reference safe-corr (dataframe.py:250-273) as a SQL aggregate
    expression: pairwise-complete, min-pairs → NULL, zero denom → 0.0."""
    mx = f"(CASE WHEN ({x}) IS NOT NULL AND ({y}) IS NOT NULL THEN ({x}) END)"
    my = f"(CASE WHEN ({x}) IS NOT NULL AND ({y}) IS NOT NULL THEN ({y}) END)"
    n = f"count({mx})"
    sx, sy = _sql_dsum(mx), _sql_dsum(my)
    sxx, syy, sxy = (
        _sql_dsum(f"{mx} * {mx}"),
        _sql_dsum(f"{my} * {my}"),
        _sql_dsum(f"{mx} * {my}"),
    )
    dx = f"sqrt(greatest({n} * {sxx} - {sx} * {sx}, 0.0))"
    dy = f"sqrt(greatest({n} * {syy} - {sy} * {sy}, 0.0))"
    num = f"({n} * {sxy} - {sx} * {sy})"
    return (
        f"(CASE WHEN {n} < {min_pairs} THEN NULL"
        f" WHEN ({dx} * {dy}) = 0 THEN 0.0"
        f" ELSE {num} / ({dx} * {dy}) END)"
    )


def _sql_ref7(x: str) -> str:
    """The reference 7-fn aggregate block with {fn}_{col} aliases."""
    return f"""
           count(*) AS count_{x},
           {_sql_dsum(x)} AS sum_{x},
           {_sql_davg(x)} AS avg_{x},
           min({x}) AS min_{x},
           max({x}) AS max_{x},
           median({x}) AS median_{x},
           {_sql_dstd(x)} AS std_{x}"""


