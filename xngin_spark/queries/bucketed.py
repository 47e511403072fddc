"""Bucketed-layout TPC-H variants — the Spark analog of the reference's
shard-key table attribute (``SK`` in doradb-catalog/src/lib.rs:147-153):
co-locating orders and lineitem on the join key at WRITE time so the
fact-fact join never shuffles at READ time.

``q3_bucketed`` / ``q5_bucketed`` / ``q18_bucketed`` run the *same*
query definitions as q3/q5/q18 (via the table-override hook in
``tpch.T``) against orders/lineitem persisted bucketed+sorted by
orderkey. Results are identical (same oracle SQL); the physical plans
drop the orderkey Exchange on both fact sides — asserted in
tests/test_plan_shape.py. At 100 TB this is the difference between
shuffling the two largest tables per query and never shuffling them:
the one-time layout cost is paid at ingest, like the reference's
sharded storage.

Bucket count here is 16 (local-scale); size it at ~100-200 MB per
bucket of lineitem for a real cluster (O(10^5) buckets at 100 TB).
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

from xngin_spark.queries import ORACLE, QUERIES, register
from xngin_spark.queries import tpch  # noqa: F401 — ensures q3/q5/q18 registered
from xngin_spark.sources.writers import write_bucketed_table

_BUCKETS = 16


def _tag(sf_dir: str) -> str:
    return sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_").replace("-", "_")


# once per (application, sf_dir): the three bucketed bench queries each
# call ensure_bucketed, and catalog round-trips per query add up.
# Memo value carries the source fingerprints it was built from — a hit
# only short-circuits when the (cheap, os.stat-walk) fingerprints still
# match, so a source regenerated mid-application invalidates the memo
# instead of being served stale twins.
_ENSURED: dict[tuple[str, str], tuple[dict[str, str], dict[str, str]]] = {}


def _src_fingerprint(path: str) -> str:
    """Identity of the source parquet (file or directory of parts) —
    the staleness guard: the driver regenerates testdata between
    rounds, and serving bucketed twins built from a previous round's
    files would silently return wrong results."""
    import os

    if os.path.isfile(path):
        st = os.stat(path)
        return f"{st.st_mtime_ns}:{st.st_size}"
    parts = []
    for root, _, files in os.walk(path):
        for f in sorted(files):
            if f.endswith(".parquet") or f.startswith("part-"):
                st = os.stat(os.path.join(root, f))
                parts.append(f"{f}:{st.st_mtime_ns}:{st.st_size}")
    return ";".join(parts)


def ensure_bucketed(spark: SparkSession, sf_dir: str) -> dict[str, str]:
    """Write bucketed twins of orders/lineitem for ``sf_dir`` once per
    warehouse; return {logical name -> managed table name}.

    Orders and lineitem build CONCURRENTLY (two threads → two Spark
    jobs; the scheduler interleaves their stages across cores), and a
    source fingerprint marker invalidates twins whose source parquet
    changed. Results are memoized per (application, sf_dir)."""
    import os
    import shutil
    from concurrent.futures import ThreadPoolExecutor

    memo_key = (spark.sparkContext.applicationId, sf_dir)
    if memo_key in _ENSURED:
        mapping, fps = _ENSURED[memo_key]
        if all(
            _src_fingerprint(os.path.join(sf_dir, f"{name}.parquet")) == fp
            for name, fp in fps.items()
        ):
            return mapping
        del _ENSURED[memo_key]  # source regenerated under us — rebuild

    tag = _tag(sf_dir)
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")

    def build(name: str, key: str) -> tuple[str, str]:
        table = f"{name}_bkt_{tag}"
        loc = os.path.join(wh, table)
        marker = os.path.join(loc, "_xngin_src")
        src_fp = _src_fingerprint(os.path.join(sf_dir, f"{name}.parquet"))
        fresh = False
        try:
            with open(marker) as fh:
                fresh = fh.read() == src_fp
        except OSError:
            pass
        if spark.catalog.tableExists(table) and fresh:
            return name, table
        if os.path.isdir(loc) and fresh:
            # catalog metadata is session-scoped but the warehouse
            # persists: re-register the existing bucketed files (bucket
            # ids live in the file names) instead of paying the layout
            # write again — keeps bench startup flat across sessions
            schema = tpch.T(spark, sf_dir, name).schema
            cols = ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
            )
            try:
                spark.sql(
                    f"CREATE TABLE `{table}` ({cols}) USING parquet "
                    f"CLUSTERED BY (`{key}`) SORTED BY (`{key}`) "
                    f"INTO {_BUCKETS} BUCKETS LOCATION '{loc}'"
                )
                return name, table
            except Exception:
                pass  # unreadable leftovers — fall through to rebuild
        spark.sql(f"DROP TABLE IF EXISTS `{table}`")
        shutil.rmtree(loc, ignore_errors=True)
        # a regenerated source (same path, new files) may still be
        # cached twice over: the session's file-listing cache AND
        # tpch.T's memoized DataFrame, whose plan pins the old file
        # list — drop both before re-reading or the rebuild scan dies
        # on missing files
        spark.catalog.refreshByPath(os.path.join(sf_dir, f"{name}.parquet"))
        tpch._SCAN_CACHE.pop((id(spark), sf_dir, name), None)
        df = tpch.T(spark, sf_dir, name)
        write_bucketed_table(
            df, table, [key], _BUCKETS, sort_cols=[key], mode="overwrite"
        )
        with open(marker, "w") as fh:
            fh.write(src_fp)
        return name, table

    with ThreadPoolExecutor(max_workers=2) as ex:
        mapping = dict(
            ex.map(
                lambda nk: build(*nk),
                (("orders", "o_orderkey"), ("lineitem", "l_orderkey")),
            )
        )
    _ENSURED[memo_key] = (
        mapping,
        {
            name: _src_fingerprint(os.path.join(sf_dir, f"{name}.parquet"))
            for name in mapping
        },
    )
    return mapping


@contextmanager
def _overridden(mapping: dict[str, str]):
    tpch._TABLE_OVERRIDES.update(mapping)
    try:
        yield
    finally:
        for k in mapping:
            tpch._TABLE_OVERRIDES.pop(k, None)


def _bucketed_variant(base: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        mapping = ensure_bucketed(spark, sf_dir)
        with _overridden(mapping):
            return QUERIES[base](spark, sf_dir)

    run.__name__ = f"{base}_bucketed"
    run.__doc__ = f"{base} against orderkey-bucketed orders/lineitem (same oracle)."
    return run


for _base in ("q3", "q5", "q18"):
    register(f"{_base}_bucketed", ORACLE[_base])(_bucketed_variant(_base))
