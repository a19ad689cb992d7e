"""Named query registry — facade over the per-family package.

Split in round 10 from a single 10k-line file into
``covid_custom_sql_engine_spark/registry/`` (one module per query
family; see ``registry/__init__.py`` for the registration order).
This module re-exports the public surface unchanged, so every
existing import site (``__spark_entry__``, tests, tools) keeps
working:

- ``QUERIES``: name -> callable(spark, sf_dir) -> DataFrame
- ``ORACLES``: name -> equivalent DuckDB SQL over the same tables
- ``_DRIVER_WINDOW_PRIORITY``: the driver-window rotation order
- ``query``: the registration decorator
"""

from __future__ import annotations

from covid_custom_sql_engine_spark.registry import (  # noqa: F401
    _DRIVER_WINDOW_PRIORITY,
    ORACLES,
    QUERIES,
    query,
)
