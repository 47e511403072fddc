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
