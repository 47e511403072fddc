"""Sinks: partitioned parquet + bucketed tables.

The reference never shipped a writer path (INSERT parses but is not
planned — doradb-sql/src/ast.rs:22-33, SURVEY.md §2.6); these are the
Spark-native equivalents designed for the 100 TB profile:

- **Partitioned parquet** → directory-level partition pruning. Choose a
  low-cardinality, filter-aligned column (e.g. a date) — the analog of
  the reference's zone-map block skipping but at file granularity.
- **Bucketed table** → pre-shuffled layout. Two tables bucketed by the
  same key into the same bucket count join/aggregate WITHOUT a shuffle
  — the decisive layout optimization for repeated fact-fact joins
  (e.g. lineitem ⋈ orders on orderkey at every query).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] | None = None,
    mode: str = "error",
    compression: str = "zstd",
    max_records_per_file: int | None = None,
) -> None:
    """Parquet writer.

    ``max_records_per_file`` caps file size so downstream scans
    parallelize (one giant file = one task until splittable row groups
    kick in; many tiny files = footer-read storm — aim ~128 MB files).
    """
    writer = df.write.mode(mode).option("compression", compression)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "error",
) -> None:
    """Persist ``df`` as a bucketed (optionally sorted) managed table.

    Joins between tables bucketed on the same columns with the same
    ``num_buckets`` skip the exchange entirely (SortMergeJoin with no
    Exchange on either side — asserted in tests/test_sources.py). Size
    ``num_buckets`` so one bucket of the LARGER table ≈ 100–200 MB at
    the target scale; at 100 TB of lineitem that is O(10⁵) buckets.
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def insert_into(df: DataFrame, table: str) -> None:
    """INSERT INTO ... SELECT, executed.

    The reference parses INSERT (values and select forms,
    doradb-sql/src/ast.rs:22-33, parser/dml.rs) but never plans or
    executes DML; here the append path is real for any saved table.
    By-name resolution (append ``saveAsTable``) rather than positional —
    schema-evolution-safe. UPDATE/DELETE are executed by the
    copy-on-write helpers in sources/dml.py (beyond the reference, which
    parses but never plans them).
    """
    df.write.mode("append").saveAsTable(table)
