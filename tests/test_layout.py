"""Z-order layout: file-level min/max statistics must narrow for EVERY
interleaved column, not just a leading sort key — checked directly in
the parquet footers with pyarrow, no Spark-vs-Spark timing flake."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from xngin_spark.sources.layout import write_zordered, zorder_value

N_FILES = 8


def _file_spans(path: str, col_a: str, col_b: str) -> list[tuple[int, int]]:
    """Per-file (span_a, span_b) = max-min of each column's values."""
    spans = []
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(path, f))
        mins = {col_a: [], col_b: []}
        maxs = {col_a: [], col_b: []}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                name = c.path_in_schema
                if name in mins and c.statistics is not None:
                    mins[name].append(c.statistics.min)
                    maxs[name].append(c.statistics.max)
        if mins[col_a] and mins[col_b]:
            spans.append(
                (
                    max(maxs[col_a]) - min(mins[col_a]),
                    max(maxs[col_b]) - min(mins[col_b]),
                )
            )
    return spans


@pytest.fixture(scope="module")
def grid_df(spark):
    # a 256x256 grid of (x, y) points — every x co-occurs with every y,
    # so a single-column sort cannot narrow the other column's stats
    return spark.range(256 * 256).select(
        (F.col("id") % 256).alias("x"),
        (F.col("id") / 256).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )


def test_zorder_narrows_both_columns(spark, grid_df, tmp_path):
    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    write_zordered(grid_df, zpath, [F.col("x"), F.col("y")], n_files=N_FILES)
    # baseline: sort by x only
    (
        grid_df.repartitionByRange(N_FILES, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    z_spans = _file_spans(zpath, "x", "y")
    l_spans = _file_spans(lpath, "x", "y")
    assert len(z_spans) >= 4 and len(l_spans) >= 4
    # linear layout: x narrows, y spans the full domain in every file —
    # a filter on y can never skip a file
    assert all(sy >= 250 for _, sy in l_spans)
    # z-order: the NON-sort dimension narrows in every file (≤ half the
    # domain), so y-filters skip files too. x still narrows in most
    # files; the one file straddling a Morton boundary may span x fully,
    # which is expected — assert the majority narrows.
    assert all(sy <= 128 for _, sy in z_spans), z_spans
    assert sum(1 for sx, _ in z_spans if sx <= 160) >= len(z_spans) - 1, z_spans
    # and correctness: the clustered copy holds exactly the same rows
    assert (
        spark.read.parquet(zpath).orderBy("payload").collect()
        == grid_df.orderBy("payload").collect()
    )


def test_zorder_value_locality(spark):
    # Morton property: the z-range covering a small (x,y) tile is far
    # smaller than the range covering a thin full-height stripe
    df = spark.range(256 * 256).select(
        (F.col("id") % 256).alias("x"), (F.col("id") / 256).cast("long").alias("y")
    )
    z = zorder_value([F.col("x"), F.col("y")])
    tile = df.filter((F.col("x") < 16) & (F.col("y") < 16)).agg(
        (F.max(z) - F.min(z)).alias("span")
    ).collect()[0].span
    stripe = df.filter(F.col("x") < 16).agg(
        (F.max(z) - F.min(z)).alias("span")
    ).collect()[0].span
    assert tile < stripe / 100, (tile, stripe)


def test_compact_small_files_binpacks_and_keeps_big(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    from xngin_spark.sources.layout import compact_small_files

    path = str(tmp_path / "accreted")
    # one healthy big file + a spray of small ones (the post-streaming /
    # post-merge shape)
    spark.range(0, 200_000).select(
        F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("v")
    ).coalesce(1).write.parquet(path)
    big = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(big) == 1
    big_inode = os.stat(os.path.join(path, big[0])).st_ino
    for i in range(6):
        spark.range(i * 10, i * 10 + 10).select(
            F.col("id"), F.concat(F.lit("s"), F.col("id")).alias("v")
        ).coalesce(1).write.mode("append").parquet(path)
    n0 = spark.read.parquet(path).count()
    files0 = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files0) == 7

    big_size = os.stat(os.path.join(path, big[0])).st_size
    stats = compact_small_files(spark, path, target_bytes=2 * big_size)
    assert stats["files_before"] == 7
    assert stats["files_compacted"] == 6
    assert stats["files_written"] == 1
    files1 = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files1) == 2
    # the healthy file is byte-identical on disk
    assert big[0] in files1
    assert os.stat(os.path.join(path, big[0])).st_ino == big_inode
    # no rows lost or duplicated
    got = spark.read.parquet(path)
    assert got.count() == n0
    assert got.filter(F.col("v").startswith("s")).count() == 60

    # idempotent: a second pass finds nothing to do
    stats2 = compact_small_files(spark, path, target_bytes=2 * big_size)
    assert stats2["files_compacted"] == 0
