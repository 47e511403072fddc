"""Column profiling and snapshot drift — data-quality monitoring.

The Deequ/Great-Expectations-shaped capability a production pipeline
runs BEFORE trusting a new snapshot: per-column row/null/distinct
counts, and the drift report between two snapshots of the same table
(the v1→v2 pair a CDC diff also consumes). Metrics are exact integers,
so the report is value-checkable against a DuckDB oracle bit-for-bit —
profiling that can itself be wrong is worse than none.

Scale notes:

- ``column_profile`` computes ALL columns in ONE aggregation pass.
  Multiple exact COUNT(DISTINCT) in one aggregate plan through Spark's
  Expand (one duplicated stream per distinct aggregate) — a deliberate
  cost: ~len(cols)× the scan for audit-grade numbers. For routine
  monitoring at 100 TB pass ``approximate=True`` — HLL sketches
  (approx_count_distinct) keep it a single narrow pass with map-side
  partials; the oracle row uses exact mode, the production default is
  approximate.
- ``profile_drift`` joins two profiles on column name — a
  columns-count-sized table; cost is the two profile passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_profile(
    df: DataFrame,
    cols: list[str] | None = None,
    approximate: bool = True,
) -> DataFrame:
    """One row per column: (col_name, n_rows, n_nulls, n_distinct).
    Default is APPROXIMATE (HLL n_distinct): exact COUNT(DISTINCT) on
    every column costs a len(cols)× Expand over the full scan — at
    100 TB that is len(cols) shuffled passes, so exact mode is for
    audits that explicitly opt in with ``approximate=False``.
    NULLs don't count toward n_distinct (COUNT DISTINCT semantics in
    both engines)."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"__nulls_{c}"))
        aggs.append(
            (
                F.approx_count_distinct(c)
                if approximate
                else F.countDistinct(c)
            ).alias(f"__dist_{c}")
        )
    wide = df.agg(*aggs)
    # unpivot the single wide row to one row per column — stack() is a
    # single projection over the 1-row aggregate, no extra pass
    stack_args = ", ".join(
        f"'{c}', __nulls_{c}, __dist_{c}" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (col_name, n_nulls, n_distinct)"
        ),
        "n_rows",
    ).select(
        "col_name",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.col("n_nulls").cast("bigint").alias("n_nulls"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
    )


def profile_drift(
    old: DataFrame,
    new: DataFrame,
    cols: list[str] | None = None,
    approximate: bool = True,
) -> DataFrame:
    """Drift report between two snapshots: per column, both profiles
    side by side plus integer deltas — the check a pipeline gates a
    snapshot promotion on (row-count collapse, null-ratio spike,
    cardinality cliff all show here as exact numbers)."""
    cols = cols or [c for c in old.columns if c in set(new.columns)]
    po = column_profile(old, cols, approximate).select(
        "col_name",
        F.col("n_rows").alias("rows_v1"),
        F.col("n_nulls").alias("nulls_v1"),
        F.col("n_distinct").alias("distinct_v1"),
    )
    pn = column_profile(new, cols, approximate).select(
        "col_name",
        F.col("n_rows").alias("rows_v2"),
        F.col("n_nulls").alias("nulls_v2"),
        F.col("n_distinct").alias("distinct_v2"),
    )
    return po.join(pn, "col_name").select(
        "col_name",
        "rows_v1",
        "rows_v2",
        "nulls_v1",
        "nulls_v2",
        "distinct_v1",
        "distinct_v2",
        (F.col("rows_v2") - F.col("rows_v1")).alias("d_rows"),
        (F.col("distinct_v2") - F.col("distinct_v1")).alias("d_distinct"),
    )


def schema_drift(old: DataFrame, new: DataFrame) -> dict:
    """Driver-side schema diff between two snapshots: added/removed
    columns and type changes — the zero-cost check that runs before
    any data pass (a schema break should fail promotion before a
    single byte of the 100 TB snapshot is profiled). Pure metadata,
    no Spark job."""
    o = {f.name: f.dataType.simpleString() for f in old.schema.fields}
    n = {f.name: f.dataType.simpleString() for f in new.schema.fields}
    return {
        "added": sorted(set(n) - set(o)),
        "removed": sorted(set(o) - set(n)),
        "type_changed": sorted(
            (c, o[c], n[c]) for c in set(o) & set(n) if o[c] != n[c]
        ),
        "unchanged": o == n,
    }
