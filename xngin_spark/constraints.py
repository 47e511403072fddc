"""Executable verification of the reference's declared key constraints.

The reference catalog attaches PK/UK/FK attributes to columns
(doradb-catalog/src/lib.rs:92-99, 147-153; the TPC-H fixture declares
them in doradb-tpch-tests/src/lib.rs:6-174) but — like Spark — never
enforces them at write time. This module makes the declarations
CHECKABLE: one report row per constraint with its violation count, so
an ingest pipeline can gate on `violations == 0`.

Scale shape: a PK check is one aggregate over the table
(count + count-distinct of the key struct — the distinct shuffles only
key columns); an FK check is a left-anti join of the child's distinct
keys against the parent's key projection (broadcast when the parent is
a dimension). Nothing ever shuffles non-key columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (table, key columns) — primary keys per the reference fixture
TPCH_PRIMARY_KEYS: list[tuple[str, tuple[str, ...]]] = [
    ("region", ("r_regionkey",)),
    ("nation", ("n_nationkey",)),
    ("customer", ("c_custkey",)),
    ("supplier", ("s_suppkey",)),
    ("part", ("p_partkey",)),
    ("orders", ("o_orderkey",)),
    ("lineitem", ("l_orderkey", "l_linenumber")),
]

# (child table, child col, parent table, parent col)
TPCH_FOREIGN_KEYS: list[tuple[str, str, str, str]] = [
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
]


def pk_report(df: DataFrame, table: str, cols: tuple[str, ...]) -> DataFrame:
    """One row: duplicate-key count + null-key count for a declared PK."""
    key = F.struct(*[F.col(c) for c in cols])
    null_pred = None
    for c in cols:
        p = F.col(c).isNull()
        null_pred = p if null_pred is None else (null_pred | p)
    return df.agg(
        (F.count(F.lit(1)) - F.count_distinct(key)).cast("long").alias("dups"),
        F.sum(F.when(null_pred, 1).otherwise(0)).cast("long").alias("nulls"),
    ).select(
        F.lit(f"pk_{table}").alias("constraint"),
        F.lit("primary_key").alias("kind"),
        (F.col("dups") + F.col("nulls")).alias("violations"),
    )


def fk_report(
    child: DataFrame, child_col: str, parent: DataFrame, parent_col: str, name: str
) -> DataFrame:
    """One row: count of child keys with no matching parent row."""
    orphans = (
        child.select(F.col(child_col).alias("k"))
        .filter(F.col("k").isNotNull())
        .distinct()
        .join(
            F.broadcast(parent.select(F.col(parent_col).alias("k")).distinct()),
            "k",
            "left_anti",
        )
    )
    return orphans.agg(F.count(F.lit(1)).cast("long").alias("violations")).select(
        F.lit(name).alias("constraint"),
        F.lit("foreign_key").alias("kind"),
        "violations",
    )


def verify_tpch_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full constraint report over the driver's TPC-H-ish tables."""
    from xngin_spark.queries.tpch import T

    parts = [
        pk_report(T(spark, sf_dir, t), t, cols) for t, cols in TPCH_PRIMARY_KEYS
    ]
    parts += [
        fk_report(
            T(spark, sf_dir, c), cc, T(spark, sf_dir, p), pc, f"fk_{c}_{cc}"
        )
        for c, cc, p, pc in TPCH_FOREIGN_KEYS
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
