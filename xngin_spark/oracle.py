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


def result_fingerprint(cols: list[str], rows: list[tuple]) -> tuple[int, str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), h


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
    srows = [tuple(r) for r in sdf.collect()]
    scols = list(sdf.columns)
    cur = con.execute(oracle_sql)
    ocols = [d[0] for d in cur.description]
    orows = [tuple(r) for r in cur.fetchall()]
    sn, sh = result_fingerprint(scols, srows)
    on, oh = result_fingerprint(ocols, orows)
    return ParityResult(name, sn, on, sh, oh, scols, ocols)
