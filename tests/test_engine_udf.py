"""UDF registration — executing the hook the reference only parses
(FuncExpr.fname, doradb-sql/src/ast.rs:976-983)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf

from xngin_spark.engine import Engine


def test_scalar_udf_roundtrip(spark):
    e = Engine(spark=spark)
    e.register_udf("xs_quality_bucket", lambda q: "hi" if q and q > 0.7 else "lo", "string")
    got = e.sql("SELECT xs_quality_bucket(0.9) AS b, xs_quality_bucket(0.1) AS c",
                dialect="spark").collect()[0]
    assert (got.b, got.c) == ("hi", "lo")


def test_pandas_udf_roundtrip(spark):
    e = Engine(spark=spark)

    @pandas_udf("double")
    def xs_sq(v: pd.Series) -> pd.Series:
        return v * v

    e.register_pandas_udf("xs_sq", xs_sq)
    rows = e.sql("SELECT xs_sq(CAST(id AS DOUBLE)) AS s FROM range(4)",
                 dialect="spark").collect()
    assert sorted(r.s for r in rows) == [0.0, 1.0, 4.0, 9.0]
