"""Explicit StructTypes for the reference catalog's tables.

Transcribed from the reference's test catalog ``tpch_catalog()``
(doradb-tpch-tests/src/lib.rs:6-174) via the type mapping in SURVEY.md
§1.2: i32 → IntegerType, decimal(18,2) → DecimalType(18,2),
date → DateType, ascii/utf8/var_* → StringType.

These are the full 8-table reference schemas (including ``partsupp``,
which the driver testdata omits) — used for schema-pinned reads of raw
files and for the parse-parity harness that analyzes the reference's
verbatim SQL corpus (tests/test_dialect_corpus.py).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _st(*fields: tuple[str, T.DataType]) -> T.StructType:
    # TPC-H data is all NOT NULL (FIXTURES.md); nullable=False lets the
    # optimizer drop null checks.
    return T.StructType([T.StructField(n, t, nullable=False) for n, t in fields])


_I = T.IntegerType()
_D = T.DecimalType(18, 2)
_S = T.StringType()
_DT = T.DateType()

REFERENCE_SCHEMAS: dict[str, T.StructType] = {
    # doradb-tpch-tests/src/lib.rs:11-47
    "lineitem": _st(
        ("l_orderkey", _I), ("l_partkey", _I), ("l_suppkey", _I),
        ("l_linenumber", _I), ("l_quantity", _D), ("l_extendedprice", _D),
        ("l_discount", _D), ("l_tax", _D), ("l_returnflag", _S),
        ("l_linestatus", _S), ("l_shipdate", _DT), ("l_commitdate", _DT),
        ("l_receiptdate", _DT), ("l_shipinstruct", _S), ("l_shipmode", _S),
        ("l_comment", _S),
    ),
    # lib.rs:50-72
    "orders": _st(
        ("o_orderkey", _I), ("o_custkey", _I), ("o_orderstatus", _S),
        ("o_totalprice", _D), ("o_orderdate", _DT), ("o_orderpriority", _S),
        ("o_clerk", _S), ("o_shippriority", _I), ("o_comment", _S),
    ),
    # lib.rs:74-91
    "customer": _st(
        ("c_custkey", _I), ("c_name", _S), ("c_address", _S),
        ("c_nationkey", _I), ("c_phone", _S), ("c_acctbal", _D),
        ("c_mktsegment", _S), ("c_comment", _S),
    ),
    # lib.rs:93-111
    "partsupp": _st(
        ("ps_partkey", _I), ("ps_suppkey", _I), ("ps_availqty", _I),
        ("ps_supplycost", _D), ("ps_comment", _S),
    ),
    # lib.rs:113-131
    "part": _st(
        ("p_partkey", _I), ("p_name", _S), ("p_mfgr", _S), ("p_brand", _S),
        ("p_type", _S), ("p_size", _I), ("p_container", _S),
        ("p_retailprice", _D), ("p_comment", _S),
    ),
    # lib.rs:133-149
    "supplier": _st(
        ("s_suppkey", _I), ("s_name", _S), ("s_address", _S),
        ("s_nationkey", _I), ("s_phone", _S), ("s_acctbal", _D),
        ("s_comment", _S),
    ),
    # lib.rs:151-160
    "nation": _st(
        ("n_nationkey", _I), ("n_name", _S), ("n_regionkey", _I),
        ("n_comment", _S),
    ),
    # lib.rs:162-171
    "region": _st(("r_regionkey", _I), ("r_name", _S), ("r_comment", _S)),
}


def schema_for(table: str) -> T.StructType:
    try:
        return REFERENCE_SCHEMAS[table]
    except KeyError:
        raise KeyError(
            f"no reference schema for {table!r} (have {sorted(REFERENCE_SCHEMAS)})"
        ) from None
