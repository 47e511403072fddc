"""Local oracle-parity harness: Spark result vs DuckDB SQL on the same
parquet.

Mirrors the driver's correctness gate (row-count + schema + order-
insensitive value-hash): columns sorted by name, rows sorted by all
columns, values hashed. Used by tests/ to prove every queries() entry
matches its oracle_sql() entry *before* the driver runs the real gate.

Determinism policy (why exact compare is possible with double columns):
every floating aggregate in the query corpus routes through an exact
decimal accumulation — ``SUM(CAST(expr AS DECIMAL(25,6)))`` — then a
final cast to double, in BOTH the Spark plan and the oracle SQL. The
per-row double arithmetic is identical IEEE ops in both engines; the
decimal sum is exact and order-independent; decimal→double conversion is
deterministic. So value hashes agree bit-for-bit.
"""

from __future__ import annotations

import hashlib
import math
import os
from dataclasses import dataclass

import duckdb
from pyspark.sql import DataFrame

from xngin_spark.catalog import ALL_TABLES


def duckdb_connect(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    # let heavy oracles SPILL instead of dying: an in-memory DuckDB has
    # no temp directory, so a 100M-row window/string_agg at the sf100
    # parity scale aborts with OOM (observed: events_pattern_match's
    # per-user sequence build) while the same query completes fine
    # against disk. A bounded memory_limit keeps the oracle from
    # starving the Spark JVM it shares the host with.
    try:
        con.execute("SET temp_directory='/tmp/duckdb_oracle_spill'")
        con.execute(
            "SET memory_limit='"
            + os.environ.get("XNGIN_ORACLE_MEM", "24GB")
            + "'"
        )
    except duckdb.Error:
        pass  # older duckdb without these pragmas: previous behavior
    for name in ALL_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _norm_cell(v: object) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr is shortest round-trip — identical for identical doubles
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _digest_rows(cols: list[str], row_iter) -> tuple[int, str]:
    """Order-insensitive multiset digest of a row stream: per-row
    sha256 summed mod 2^256 (the AdHash construction) — equal row
    MULTISETS (duplicates counted) produce equal digests regardless of
    order, and the accumulator is O(1) memory, so a 25M-row sf100
    result streams through instead of materializing a sorted line list
    (the previous sort-then-hash fingerprint MemoryError'd collecting
    events_asof_join at sf100). Same per-cell normalization as before;
    columns still compare by sorted name."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    acc = 0
    n = 0
    for r in row_iter:
        line = "\x1f".join(_norm_cell(r[i]) for i in order)
        acc = (
            acc + int.from_bytes(hashlib.sha256(line.encode()).digest(), "big")
        ) % (1 << 256)
        n += 1
    return n, format(acc, "064x")[:16]


def result_fingerprint(cols: list[str], rows: list[tuple]) -> tuple[int, str]:
    return _digest_rows(cols, iter(rows))


@dataclass
class ParityResult:
    name: str
    spark_rows: int
    oracle_rows: int
    spark_hash: str
    oracle_hash: str
    spark_cols: list[str]
    oracle_cols: list[str]

    @property
    def ok(self) -> bool:
        return (
            self.spark_rows == self.oracle_rows
            and self.spark_hash == self.oracle_hash
            and sorted(self.spark_cols) == sorted(self.oracle_cols)
        )


def compare(
    name: str,
    sdf: DataFrame,
    con: "duckdb.DuckDBPyConnection",
    oracle_sql: str,
) -> ParityResult:
    scols = list(sdf.columns)
    sn, sh = _digest_rows(
        scols, sdf.toLocalIterator(prefetchPartitions=True)
    )
    cur = con.execute(oracle_sql)
    ocols = [d[0] for d in cur.description]

    def oracle_rows():
        while batch := cur.fetchmany(65536):
            yield from batch

    on, oh = _digest_rows(ocols, oracle_rows())
    return ParityResult(name, sn, on, sh, oh, scols, ocols)
