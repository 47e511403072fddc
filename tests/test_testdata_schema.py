"""Testdata drift guard: the driver regenerates /root/testdata between
rounds (round 4 silently moved event time from TIMESTAMP-NANOS to
MICROS and broke six gate queries). This test pins every table's
parquet schema so a regeneration that changes shape fails HERE with a
one-line diff instead of surfacing as dozens of cryptic query errors.

On an intentional driver-side change: update EXPECTED from the printed
diff and audit readers (catalog.events_df, sources/schemas.py,
streaming/io.py) for type-sensitive paths.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMALL

EXPECTED = {
    "region": [("r_regionkey", "int32"), ("r_name", "string")],
    "nation": [("n_nationkey", "int32"), ("n_name", "string"), ("n_regionkey", "int32")],
    "customer": [("c_custkey", "int64"), ("c_name", "string"), ("c_nationkey", "int32"), ("c_acctbal", "double"), ("c_mktsegment", "string")],
    "supplier": [("s_suppkey", "int64"), ("s_name", "string"), ("s_nationkey", "int32"), ("s_acctbal", "double")],
    "part": [("p_partkey", "int64"), ("p_name", "string"), ("p_brand", "string"), ("p_type", "string"), ("p_size", "int32"), ("p_retailprice", "double")],
    "orders": [("o_orderkey", "int64"), ("o_custkey", "int64"), ("o_orderstatus", "string"), ("o_totalprice", "double"), ("o_orderdate", "timestamp[us]"), ("o_orderpriority", "string")],
    "lineitem": [("l_orderkey", "int64"), ("l_partkey", "int64"), ("l_suppkey", "int64"), ("l_linenumber", "int32"), ("l_quantity", "double"), ("l_extendedprice", "double"), ("l_discount", "double"), ("l_tax", "double"), ("l_returnflag", "string"), ("l_linestatus", "string"), ("l_shipdate", "timestamp[us]")],
    "events": [("event_id", "int64"), ("ts", "timestamp[us]"), ("user_id", "int64"), ("event_type", "string"), ("value", "double"), ("props", "string")],
    "documents": [("doc_id", "int64"), ("text", "string"), ("lang", "string"), ("source", "string"), ("n_chars", "int64")],
    "embeddings": [("vec_id", "int64"), ("embedding", "list<element: float>"), ("label", "int32")],
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_table_schema_unchanged(table):
    path = f"{SF_SMALL}/{table}.parquet"
    if not os.path.exists(path):
        pytest.skip(f"{table} absent at {SF_SMALL}")
    got = [(f.name, str(f.type)) for f in pq.read_schema(path)]
    assert got == EXPECTED[table], (
        f"driver testdata schema drifted for {table!r}:\n"
        f"  expected {EXPECTED[table]}\n  got      {got}\n"
        "Update EXPECTED and audit type-sensitive readers "
        "(catalog.events_df, sources/schemas.py, streaming/io.py)."
    )
