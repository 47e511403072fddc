

def test_table_diff_ops_and_null_safety(spark):
    from xngin_spark.sources.dml import table_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None), (3, "c", 3.0), (4, None, 4.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0),        # unchanged -> no row
         (2, "b", None),       # unchanged incl. NULL == NULL -> no row
         (3, "c", 3.5),        # value change -> update
         (5, "e", 5.0)],       # new key -> insert; key 4 gone -> delete
        "k long, s string, v double",
    )
    got = {r.k: r.op for r in table_diff(old, new, ["k"]).collect()}
    assert got == {3: "update", 4: "delete", 5: "insert"}
    # NULL -> value and value -> NULL are both updates (null-safe compare)
    new2 = spark.createDataFrame(
        [(2, "b", 2.0), (4, None, None), (1, "a", 1.0), (3, "c", 3.0)],
        "k long, s string, v double",
    )
    got2 = {r.k: r.op for r in table_diff(old, new2, ["k"]).collect()}
    assert got2 == {2: "update", 4: "update"}
