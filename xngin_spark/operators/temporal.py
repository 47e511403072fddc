"""Temporal joins Spark's DataFrame API lacks as primitives: as-of join
and bounded range join — expressed as compositions of built-in
operators (union + window forward-fill, binned equi-join) so Catalyst
and Tungsten still own the physical execution. No Python UDFs, no
mapInPandas: both shapes stay whole-stage-codegen'd.

- **as-of join**: for each left row, the latest right row with
  ``right.ts <= left.ts`` within the same key (market-data /
  feature-store point-in-time correctness). The naive formulation is a
  non-equi theta join (quadratic per key); the union + window
  forward-fill used here is one shuffle on the key and a per-key sort —
  the same cost profile as a groupBy, scales to any key cardinality.
- **range join**: pairs within a bounded time distance. A raw
  ``|a.ts - b.ts| <= h`` condition gives Catalyst no equi-key and plans
  a per-key cartesian; binning both sides to ``h``-wide buckets and
  equi-joining on (key, bin±1) bounds candidates to the two adjacent
  bins — the standard interval-bucketing rewrite (cf. Spark's own
  range-join hints on Databricks, DuckDB's IEJoin literature).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_micros(dtype: str, col: str) -> Column:
    """Exact integer microseconds since epoch for either timestamp
    flavor. ``unix_micros`` only accepts TIMESTAMP (tz-adjusted); for
    TIMESTAMP_NTZ (zoneless — what TIMESTAMP(MICROS, utc=false) parquet
    surfaces as) take a naive micro diff from the NTZ epoch, which is
    timezone-free and matches DuckDB's naive arithmetic exactly."""
    if dtype == "timestamp_ntz":
        return F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', `{col}`)"
        )
    return F.unix_micros(F.col(col))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | None = None,
    value_cols: list[str] | None = None,
    suffix: str = "_r",
    tolerance_sec: int | None = None,
) -> DataFrame:
    """Point-in-time join: left rows enriched with the most recent right
    values at or before their ``on`` timestamp (per ``by`` key when
    given); NULL when no earlier right row exists.

    Shape: tag sides, union only (key, ts, right-row struct), one
    window ``last(struct, ignoreNulls=True)`` over rows-between
    (unbounded preceding, current), keep left rows. The matched right
    ROW travels as one struct — never per-column fills — so a NULL in
    one value column cannot make that column reach further back than
    the others: the result is exactly the latest right row's values,
    NULLs included (DuckDB ASOF / pandas merge_asof row semantics).
    Right rows order before left rows at equal timestamps, so ties are
    inclusive (right.ts == left.ts matches).

    ``tolerance_sec`` bounds the lookback (pandas merge_asof's
    ``tolerance``): matches older than the bound become NULL, exactly
    ``left.on <= matched.on + INTERVAL tol SECOND``. The mask tests the
    matched row's own timestamp (same struct), and the comparison is
    exact timestamp arithmetic (no second-truncation), so
    fractional-second data agrees with the DuckDB oracle.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in {on, by}
    ]
    keys = ([by] if by else []) + [on]
    lt = left.withColumn("__side", F.lit(1))
    row = F.struct(
        F.col(on).alias("__matched_on"),
        *[F.col(c).alias(c) for c in value_cols],
    )
    rt = right.select(
        *[F.col(c) for c in keys], row.alias("__asof_row")
    ).withColumn("__side", F.lit(0))
    # align schemas: left gains a NULL __asof_row; right gains NULL left
    # columns; unionByName fills the gaps
    u = lt.unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(*([by] if by else []))
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = (
        u.withColumn("__asof_row", F.last("__asof_row", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
        .drop("__side")
    )
    matched = F.col("__asof_row.__matched_on")
    if tolerance_sec is not None:
        on_dtype = dict(left.dtypes)[on]
        if on_dtype.startswith("timestamp"):
            bound = F.expr(
                f"`{on}` <= __asof_row.__matched_on"
                f" + INTERVAL {int(tolerance_sec)} SECOND"
            )
        elif on_dtype == "date":
            # date + int adds DAYS in Spark — a 600-second tolerance
            # would silently become a 600-day one. A date axis has no
            # sub-day resolution, so seconds-granular tolerance is
            # ill-defined; require the caller to cast to timestamp.
            raise ValueError(
                f"asof_join tolerance_sec on DATE column '{on}': cast to "
                "timestamp first (date arithmetic is day-granular)"
            )
        else:  # numeric event-time axis: plain arithmetic
            bound = F.col(on) <= matched + F.lit(tolerance_sec)
        keep = matched.isNotNull() & bound
    else:
        keep = None
    for c in value_cols:
        val = F.col(f"__asof_row.{c}")
        u = u.withColumn(
            f"{c}{suffix}", F.when(keep, val) if keep is not None else val
        )
    return u.drop("__asof_row")


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | None = None,
    lower: Column | float = 0.0,
    upper: Column | float = 300.0,
    suffix: str = "_r",
) -> DataFrame:
    """Bounded-interval join: pairs with
    ``left.ts + lower <= right.ts <= left.ts + upper`` (seconds), per
    ``by`` key. Implemented as an equi-join on (key, time-bin) with the
    left side exploded to the covered bins, then the exact predicate as
    a post-filter — candidates are bounded by bin width instead of the
    whole key group.
    """
    # exact integer microseconds for timestamps (a float epoch-seconds
    # representation is inexact and can flip a boundary comparison);
    # plain doubles for numeric axes
    if dict(left.dtypes)[on].startswith("timestamp"):
        lsec = _epoch_micros(dict(left.dtypes)[on], on)
        rsec = _epoch_micros(dict(right.dtypes)[on], on)
        lo: object = int(float(lower) * 1_000_000)
        hi: object = int(float(upper) * 1_000_000)
        width: object = max(hi - lo, 1)
    else:
        lsec = F.col(on).cast("double")
        rsec = F.col(on).cast("double")
        lo = float(lower)
        hi = float(upper)
        width = max(hi - lo, 1e-9)
    # a [l+lo, l+hi] window of width w covers at most 2 adjacent w-wide
    # bins, so each left row explodes to <=2 bin rows — constant fan-out
    lbins = F.sequence(
        F.floor((lsec + F.lit(lo)) / F.lit(width)).cast("long"),
        F.floor((lsec + F.lit(hi)) / F.lit(width)).cast("long"),
    )
    lt = left.select(
        "*", lsec.alias("__lsec"), F.explode_outer(lbins).alias("__bin")
    ).filter(F.col("__bin").isNotNull())
    rt = right.select(
        *[F.col(c).alias(f"{c}{suffix}") for c in right.columns],
        rsec.alias("__rsec"),
        F.floor(rsec / F.lit(width)).cast("long").alias("__bin"),
    )
    cond = lt["__bin"] == rt["__bin"]
    if by is not None:
        cond = cond & (lt[by] == rt[f"{by}{suffix}"])
    out = (
        lt.join(rt, on=cond, how="inner")
        .filter(
            (F.col("__rsec") >= F.col("__lsec") + F.lit(lo))
            & (F.col("__rsec") <= F.col("__lsec") + F.lit(hi))
        )
        .drop(lt["__bin"])
        .drop(rt["__bin"])
        .drop("__lsec", "__rsec")
    )
    return out


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    start: str = "start",
    end: str = "end",
    bin_width_s: int = 3600,
    suffix: str = "_r",
) -> DataFrame:
    """Interval-overlap join: pairs (l, r) whose [start, end] intervals
    intersect (inclusive bounds) — the third temporal-join shape after
    as-of and bounded range. A raw ``l.start <= r.end AND r.start <=
    l.end`` condition has no equi-key, so Catalyst would plan a
    cartesian; instead both sides explode to the ``bin_width_s``-wide
    time bins their interval touches and equi-join on the bin, with the
    exact overlap predicate applied after. Duplicate hits (an
    overlapping pair shares every bin both intervals cover) are
    removed by keeping only the FIRST shared bin — max(floor(l.s/w),
    floor(r.s/w)) == bin — a closed-form dedup with no distinct
    shuffle.

    Scale: fan-out per row = interval length / bin width + 1 (size the
    bin to the typical interval); per-bin candidates are bounded by the
    number of concurrent intervals — the physical concurrency of the
    domain, not the table size. One equi-shuffle on the 8-byte bin.
    """
    w = F.lit(int(bin_width_s * 1_000_000))
    ls = _epoch_micros(dict(left.dtypes)[start], start)
    le = _epoch_micros(dict(left.dtypes)[end], end)
    rs = _epoch_micros(dict(right.dtypes)[start], start)
    re_ = _epoch_micros(dict(right.dtypes)[end], end)
    lbins = F.sequence(F.floor(ls / w), F.floor(le / w))
    rbins = F.sequence(F.floor(rs / w), F.floor(re_ / w))
    lt = left.select(
        "*",
        ls.alias("__ls"),
        le.alias("__le"),
        F.explode_outer(lbins).alias("__bin"),
    ).filter(F.col("__bin").isNotNull())
    rt = right.select(
        *[F.col(c).alias(f"{c}{suffix}") for c in right.columns],
        rs.alias("__rs"),
        re_.alias("__re"),
        F.explode_outer(rbins).alias("__bin"),
    ).filter(F.col("__bin").isNotNull())
    joined = lt.join(rt, "__bin").filter(
        (F.col("__ls") <= F.col("__re"))
        & (F.col("__rs") <= F.col("__le"))
        # first-shared-bin dedup: emit the pair only from the later of
        # the two interval starts' bins
        & (
            F.greatest(
                F.floor(F.col("__ls") / w), F.floor(F.col("__rs") / w)
            )
            == F.col("__bin")
        )
    )
    return joined.drop("__bin", "__ls", "__le", "__rs", "__re")
