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
from pyspark.sql import functions as F


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] | None = None,
    mode: str = "error",
    compression: str = "zstd",
    max_records_per_file: int | None = None,
    dynamic_partition_overwrite: bool = False,
) -> None:
    """Parquet writer.

    ``max_records_per_file`` caps file size so downstream scans
    parallelize (one giant file = one task until splittable row groups
    kick in; many tiny files = footer-read storm — aim ~128 MB files).

    ``dynamic_partition_overwrite`` (requires ``mode="overwrite"`` and
    ``partition_by``) replaces ONLY the partitions present in ``df``,
    leaving sibling partitions untouched — the backfill primitive:
    rewrite one day/source of a 100 TB partitioned table without
    clobbering the rest. Static overwrite (the default) would delete
    the whole root first. Set per-write (writer option), not
    session-wide, so concurrent static writers keep their semantics.
    """
    writer = df.write.mode(mode).option("compression", compression)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if dynamic_partition_overwrite:
        if mode != "overwrite" or not partition_by:
            raise ValueError(
                "dynamic_partition_overwrite needs mode='overwrite' and partition_by"
            )
        writer = writer.option("partitionOverwriteMode", "dynamic")
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


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "xs1",
    fmt: str = "parquet",
) -> None:
    """Materialize the deterministic global shuffle as training shards:
    ``path/shard=K/`` parquet, each shard internally ordered by the
    content hash — the "shuffle the corpus once, stream shards in
    order" export before training (operators/corpus.shuffle_shards is
    the queryable twin of the same assignment).

    Scale shape: the hash is a map-side projection; the ONE shuffle is
    ``repartition(n_shards, shard)`` — the same shuffle any writer
    would pay — and ordering is a partition-local sort (no global
    sort). Hash-partitioning on the shard id keeps every shard wholly
    inside one task, so each shard directory holds one ordered file;
    size n_shards to the target shard bytes (total/shard_size) exactly
    like the queryable twin. Re-running with the same seed is
    byte-stable; a new seed is a fresh epoch-level reshuffle.

    ``fmt="json"`` writes JSON-lines shards instead of parquet — the
    format most LM training dataloaders stream directly (one JSON
    object per line, same shard layout and in-shard order).
    """
    from xngin_spark.operators.corpus import shard_assignment_cols

    if fmt not in ("parquet", "json"):
        raise ValueError(f"fmt must be 'parquet' or 'json', got {fmt!r}")
    h8, shard = shard_assignment_cols(n_shards, id_col, text_col, seed)
    out = df.withColumn("h8", h8).withColumn("shard", shard)
    writer = (
        out.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "h8", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
    )
    if fmt == "parquet":
        writer.parquet(path)
    else:
        writer.json(path)
