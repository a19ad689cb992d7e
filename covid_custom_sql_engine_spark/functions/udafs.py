"""Pandas-UDF aggregate surface (SURVEY G3 / §2.3).

The reference's only UDF/UDAF surface is ``DataFrame.agg`` with an
arbitrary Python callable over a whole column (dataframe.py:207-212).
The Spark analogue is a grouped-agg Pandas UDF: Arrow-batched (no
per-row serde), runs per group on executors — the sanctioned slow path
for semantics built-ins can't express.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


@F.pandas_udf("double")
def geometric_mean(v: pd.Series) -> float:
    """exp(mean(ln(x))) over positive values — not expressible as a
    single built-in aggregate; the canonical UDAF example."""
    arr = v.dropna()
    arr = arr[arr > 0]
    if len(arr) == 0:
        return None
    return float(np.exp(np.log(arr.to_numpy()).mean()))


def grouped_geometric_mean(df: DataFrame, key: str, value_col: str) -> DataFrame:
    return df.groupBy(key).agg(geometric_mean(F.col(value_col)).alias(f"gmean_{value_col}"))
