"""CSV source with the reference parser's semantics (SURVEY §2.1 S1-S3).

The reference (``src/csv_parser.py``) is a from-scratch char-level CSV
parser: header row → column names; quote toggling with ``""`` escapes;
configurable single-char separator; blank lines skipped; ragged rows
padded/truncated; per-CELL type coercion '' → None, else int, else
float, else str (csv_parser.py:6-16, 49-79).

Spark mapping: the built-in (distributed, pushdown-capable) CSV reader
covers quoting/separator/null handling natively. Per-cell dynamic typing
has no Spark analogue (a column has one type), so the parity mode loads
every column as STRING and exposes ``try_cast``-style accessors — which
reproduces the reference's "filter to numerics before aggregating"
behavior (dataframe.py:48) exactly. An inference mode gives normal typed
columns for well-typed files.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F


def read_csv_ref(
    spark: SparkSession,
    path: str,
    separator: str = ",",
    infer_schema: bool = False,
) -> DataFrame:
    """Read a CSV with reference-compatible options.

    - header row = column names (csv_parser.py:60-63)
    - ``"`` quoting with ``""`` escape (csv_parser.py:30-41)
    - empty cell → NULL (csv_parser.py:8-9; nullValue='')
    - blank lines skipped (csv_parser.py:66-68; Spark default)
    - PERMISSIVE mode tolerates ragged rows (short → null-padded,
      csv_parser.py:71-75)
    - ``infer_schema=False`` (default) = parity mode: all STRING, use
      :func:`try_float` at use sites.
    """
    return (
        spark.read.options(
            header=True,
            sep=separator,
            quote='"',
            escape='"',
            nullValue="",
            emptyValue="",
            mode="PERMISSIVE",
            inferSchema=infer_schema,
        ).csv(path)
    )


def try_float(col: str | Column) -> Column:
    """S3 — ``to_float_or_none`` (csv_parser.py:81-86): cast to double or
    NULL, never raise. ``try_cast`` is the exact Spark analogue."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("double")


def try_long(col: str | Column) -> Column:
    """S2 int-arm of ``try_convert_type`` (csv_parser.py:6-16)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("bigint")


def coerce_cell(col: str | Column) -> Column:
    """S2 — per-cell coercion order (int, then float, else keep string),
    surfaced as the best *numeric* interpretation: bigint-valued doubles
    for int-looking cells, double for float-looking, NULL for text.
    The original string stays available in the source column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.try_cast("bigint").cast("double"), c.try_cast("double"))


def validate_required_columns(df: DataFrame, required: set[str]) -> None:
    """A1 — schema validation (app.py:86-94, 107-115): error listing the
    missing columns as a set difference."""
    missing = sorted(required - set(df.columns))
    if missing:
        raise ValueError(f"missing required columns: {missing}")


def read_jsonl(spark, path: str, schema=None):
    """JSON-lines source (one object per line — the interchange format
    of text-pipeline corpora). With an explicit schema the reader skips
    the inference pass entirely (schema inference = a full extra scan at
    100 TB; always pass one in production)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)
