"""Schema-pinned readers.

Every reader takes an explicit ``StructType`` — never ``inferSchema``.
The reference resolves all types at plan-build time from a DDL-declared
catalog (doradb-plan/src/lgc/resolv.rs); inference would be (a) a
semantic divergence and (b) an extra full pass over the data at scale.

``columns``/``where`` parameters exist so callers can express pruning
and pushdown *at the scan*: Catalyst pushes them into the source
(``PushedFilters`` / ``ReadSchema`` in the formatted plan), the file-
format analog of the reference's ``TableScan {cols, filt}``
(doradb-plan/src/lgc/op.rs:543-553).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import types as T


def _prune(df: DataFrame, columns: Sequence[str] | None, where: Column | str | None) -> DataFrame:
    if where is not None:
        df = df.filter(where)
    if columns:
        df = df.select(*columns)
    return df


def read_parquet(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    columns: Sequence[str] | None = None,
    where: Column | str | None = None,
) -> DataFrame:
    """Parquet scan. ``schema`` optional — parquet is self-describing and
    the footer schema is authoritative; pass one only to assert/pin it
    (mismatch surfaces as an analysis error instead of silent nulls)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return _prune(reader.parquet(path), columns, where)


def read_orc(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    columns: Sequence[str] | None = None,
    where: Column | str | None = None,
) -> DataFrame:
    """ORC scan — same contract as read_parquet (self-describing footer,
    optional schema pin, pruning/pushdown at the scan; ORC supports
    PushedFilters the same way parquet does)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return _prune(reader.orc(path), columns, where)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    sep: str = ",",
    header: bool = False,
    columns: Sequence[str] | None = None,
    where: Column | str | None = None,
    **options: str,
) -> DataFrame:
    """CSV with mandatory explicit schema. ``mode=FAILFAST`` — a malformed
    row is a data bug, not something to null-fill silently."""
    reader = (
        spark.read.schema(schema)
        .option("sep", sep)
        .option("header", str(header).lower())
        .option("mode", options.pop("mode", "FAILFAST"))
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return _prune(reader.csv(path), columns, where)


def read_tbl(
    spark: SparkSession,
    path: str,
    table: str,
    schema: T.StructType | None = None,
) -> DataFrame:
    """Classic ``dbgen``-style ``.tbl``: pipe-delimited, no header, with a
    trailing ``|`` per line (so raw files parse with one phantom column
    that we drop). This is the file format the reference's benchmark
    corpus would be loaded from had its storage engine shipped.
    """
    from xngin_spark.sources.schemas import schema_for

    schema = schema or schema_for(table)
    padded = T.StructType(
        list(schema.fields) + [T.StructField("_trailing", T.StringType(), True)]
    )
    df = spark.read.schema(padded).option("sep", "|").option("header", "false").csv(path)
    return df.select(*[f.name for f in schema.fields])


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    columns: Sequence[str] | None = None,
    where: Column | str | None = None,
    **options: str,
) -> DataFrame:
    """JSON-lines with mandatory explicit schema (inference on JSON is a
    full extra scan — never at 100 TB)."""
    reader = spark.read.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return _prune(reader.json(path), columns, where)
