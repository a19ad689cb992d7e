"""CSV source parity (reference csv_parser.py semantics; FIXTURES.md §3)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from covid_custom_sql_engine_spark.sources import read_csv_ref, validate_required_columns
from covid_custom_sql_engine_spark.sources.csv_source import coerce_cell, try_float, try_long


def _write(content: str, suffix=".csv") -> str:
    f = tempfile.NamedTemporaryFile("w", suffix=suffix, delete=False)
    f.write(content)
    f.close()
    return f.name


def test_quoted_separator_one_cell(spark):
    # csv_parser.py:37-41 — quoted field containing the separator
    path = _write('a,b\n"x,y",2\n')
    (r,) = read_csv_ref(spark, path).collect()
    assert r.a == "x,y" and r.b == "2"


def test_escaped_quote(spark):
    # csv_parser.py:30-33 — "" inside quotes → literal quote
    path = _write('a\n"say ""hi"""\n')
    (r,) = read_csv_ref(spark, path).collect()
    assert r.a == 'say "hi"'


def test_empty_cell_is_null(spark):
    # csv_parser.py:8-9 — '' → None
    path = _write("a,b,c\n1,,3\n")
    (r,) = read_csv_ref(spark, path).collect()
    assert r.b is None


def test_mixed_type_column_try_cast(spark):
    # per-cell coercion (csv_parser.py:6-16): engine loads as string and
    # try_cast reproduces "filter to numerics" (dataframe.py:48)
    # (a trailing blank line is SKIPPED, not a null row — csv_parser.py:66-68)
    path = _write("v\n1\n2.5\nx\n\n")
    df = read_csv_ref(spark, path)
    assert dict(df.dtypes)["v"] == "string"
    vals = [r.f for r in df.select(try_float("v").alias("f")).collect()]
    assert vals == [1.0, 2.5, None]
    coerced = [r.c for r in df.select(coerce_cell("v").alias("c")).collect()]
    assert coerced == [1.0, 2.5, None]
    ints = [r.i for r in df.select(try_long("v").alias("i")).collect()]
    assert ints == [1, None, None]  # int-first arm


def test_int_vs_float_looking(spark):
    path = _write("v\n7\n7.0\n")
    df = read_csv_ref(spark, path, infer_schema=True)
    # inference promotes to double for the mixed column — values survive
    assert [r.v for r in df.collect()] == [7.0, 7.0]


def test_alternate_separators(spark):
    for sep in ["\t", ";", "|"]:
        path = _write(f"a{sep}b\n1{sep}2\n")
        (r,) = read_csv_ref(spark, path, separator=sep).collect()
        assert (r.a, r.b) == ("1", "2")


def test_blank_interior_line_skipped(spark):
    # csv_parser.py:66-68
    path = _write("a\n1\n\n2\n")
    assert read_csv_ref(spark, path).count() == 2


def test_ragged_short_row_padded(spark):
    # csv_parser.py:71-72 — short rows padded with nulls (PERMISSIVE)
    path = _write("a,b,c\n1,2\n")
    (r,) = read_csv_ref(spark, path).collect()
    assert r.a == "1" and r.b == "2" and r.c is None


def test_validate_required_columns(spark):
    path = _write("a,b\n1,2\n")
    df = read_csv_ref(spark, path)
    validate_required_columns(df, {"a"})
    with pytest.raises(ValueError, match=r"\['c', 'd'\]"):
        validate_required_columns(df, {"a", "c", "d"})


def test_jsonl_roundtrip_and_corrupt_line(spark):
    """JSONL: explicit schema, null for missing fields, corrupt lines
    land in _corrupt_record instead of failing the read (PERMISSIVE)."""
    from covid_custom_sql_engine_spark.sources.csv_source import read_jsonl

    path = _write(
        '{"doc_id": 1, "text": "hello", "lang": "en"}\n'
        '{"doc_id": 2, "text": "welt"}\n'
        "this is not json\n",
        suffix=".jsonl",
    )
    schema = "doc_id LONG, text STRING, lang STRING, _corrupt_record STRING"
    df = read_jsonl(spark, path, schema).cache()
    try:
        good = df.filter(F.col("_corrupt_record").isNull())
        assert good.count() == 2
        rows = {r.doc_id: r for r in good.collect()}
        assert rows[2].lang is None
        assert df.filter(F.col("_corrupt_record").isNotNull()).count() == 1
    finally:
        df.unpersist()
