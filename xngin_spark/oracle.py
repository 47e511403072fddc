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


#: exact-match normalizations verified against Python's _norm_cell:
#: DuckDB's double->VARCHAR is shortest-roundtrip with repr()-identical
#: exponent thresholds (probed over the full magnitude range incl.
#: denormals/inf/-0.0); decimals/dates/ints stringify identically.
_SQL_NORM_SIMPLE = (
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT", "UHUGEINT",
    "VARCHAR", "DATE",
)


def _norm_cell_sql(col: str, dtype: str) -> str | None:
    """SQL expression producing EXACTLY _norm_cell's text for one
    column, or None if the type has no verified SQL twin (caller falls
    back to the Python digest)."""
    q = '"' + col.replace('"', '""') + '"'
    t = dtype.upper()
    if t in ("FLOAT", "REAL"):
        # fetched floats widen to Python doubles before repr; widen in
        # SQL too or the 32-bit shortest form ('0.1') diverges from the
        # widened repr ('0.10000000149011612')
        q, t = f"CAST({q} AS DOUBLE)", "DOUBLE"
    if t == "DOUBLE":
        body = f"CASE WHEN isnan({q}) THEN 'NaN' ELSE CAST({q} AS VARCHAR) END"
    elif t == "BOOLEAN":
        # NULL must FALL THROUGH to the COALESCE (an ELSE branch would
        # normalize NULL as 'false' — caught by the planted edge test)
        body = f"CASE WHEN {q} THEN 'true' WHEN NOT {q} THEN 'false' END"
    elif t == "TIMESTAMP":
        # str(datetime) omits '.000000' entirely but prints TRAILING
        # zeros of nonzero micros; DuckDB's cast trims them — strftime
        # branches reproduce Python exactly
        body = (
            f"CASE WHEN date_trunc('second', {q}) = {q} "
            f"THEN strftime({q}, '%Y-%m-%d %H:%M:%S') "
            f"ELSE strftime({q}, '%Y-%m-%d %H:%M:%S.%f') END"
        )
    elif t in _SQL_NORM_SIMPLE or t.startswith("DECIMAL"):
        body = f"CAST({q} AS VARCHAR)"
    else:
        return None
    return f"COALESCE({body}, '<NULL>')"


def _digest_sql(
    con: "duckdb.DuckDBPyConnection", oracle_sql: str
) -> tuple[int, str, list[str]] | None:
    """Run the AdHash multiset digest INSIDE DuckDB: per-row sha256
    over the same chr(31)-joined normalized cells, summed as eight
    32-bit limb sums (HUGEINT-safe to ~1e19 rows) recombined in Python
    mod 2^256 — bit-identical to _digest_rows by construction. The
    oracle result is never materialized, fetched, or hashed in Python:
    at sf100 the Python path's full-result fetch was the probe's disk/
    memory killer (bm25_topk spilled 381s then died; a 15M-row
    tfidf_topk fetch is minutes of pure conversion). Returns None when
    a result column's type has no verified SQL normalization (caller
    falls back to the Python digest — same verdicts either way,
    guaranteed by a corpus-wide equivalence test)."""
    desc = con.execute(f"DESCRIBE {oracle_sql}").fetchall()
    cols = [(r[0], r[1]) for r in desc]
    order = sorted(range(len(cols)), key=lambda i: cols[i][0])
    norms = []
    for i in order:
        e = _norm_cell_sql(cols[i][0], cols[i][1])
        if e is None:
            return None
        norms.append(e)
    line = f"concat_ws(chr(31), {', '.join(norms)})" if norms else "''"
    limbs = ", ".join(
        f"SUM(CAST(CAST('0x' || substr(h, {1 + 8 * i}, 8) AS BIGINT) AS HUGEINT)) AS l{i}"
        for i in range(8)
    )
    row = con.execute(
        f"WITH __oq AS ({oracle_sql}), "
        f"__oh AS (SELECT sha256({line}) AS h FROM __oq) "
        f"SELECT COUNT(*) AS n, {limbs} FROM __oh"
    ).fetchone()
    n = int(row[0])
    acc = 0
    for i in range(8):
        acc += int(row[1 + i] or 0) << (32 * (7 - i))
    return n, format(acc % (1 << 256), "064x")[:16], [c for c, _ in cols]


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
    mode = os.environ.get("XNGIN_ORACLE_DIGEST", "auto")
    if mode in ("auto", "sql"):
        try:
            r = _digest_sql(con, oracle_sql)
        except Exception:
            if mode == "sql":
                raise
            r = None
        if r is not None:
            on, oh, ocols = r
            return ParityResult(name, sn, on, sh, oh, scols, ocols)
        if mode == "sql":
            raise ValueError(
                f"{name}: oracle result has a column type without a "
                "verified SQL normalization; XNGIN_ORACLE_DIGEST=sql "
                "refuses the Python fallback"
            )
    cur = con.execute(oracle_sql)
    ocols = [d[0] for d in cur.description]

    def oracle_rows():
        while batch := cur.fetchmany(65536):
            yield from batch

    on, oh = _digest_rows(ocols, oracle_rows())
    return ParityResult(name, sn, on, sh, oh, scols, ocols)
