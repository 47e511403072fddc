"""Reference-dialect DDL → Spark schemas.

The reference parses MySQL-style DDL (doradb-sql/src/parser/ddl.rs, ~700
LoC; AST ``TableSpec`` doradb-sql/src/ast.rs:1452-1536) into its catalog.
Spark SQL's CREATE TABLE differs (USING parquet, no inline PRIMARY KEY,
no unsigned), so this module translates the reference's DDL surface into
(StructType, primary-key, table-properties) and registers the result.

Type mapping per SURVEY.md §1.2: TINYINT/SMALLINT/INT/BIGINT (+UNSIGNED
widened to the next signed type, BIGINT UNSIGNED → DECIMAL(20,0)),
DECIMAL(p,s), FLOAT/DOUBLE, CHAR/VARCHAR → string, DATE, DATETIME →
timestamp_ntz, BOOL.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import types as T

_TYPE_RE = re.compile(r"^(\w+)\s*(?:\(\s*(\d+)\s*(?:,\s*(\d+))?\s*\))?", re.IGNORECASE)

# unsigned ints widen to the next signed type that holds the full range
# (doradb-datatype/src/lib.rs:33 carries an `unsigned` flag; Spark has
# no unsigned ints)
_UNSIGNED_WIDEN = {
    "tinyint": T.ShortType(),
    "smallint": T.IntegerType(),
    "int": T.LongType(),
    "integer": T.LongType(),
    "bigint": T.DecimalType(20, 0),
}

_SIMPLE = {
    "tinyint": T.ByteType(),
    "smallint": T.ShortType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "bigint": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "real": T.DoubleType(),
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
    "date": T.DateType(),
    "datetime": T.TimestampNTZType(),
    "timestamp": T.TimestampNTZType(),
    # reference TIME (doradb-datatype/src/lib.rs:47) — Spark 4 has a
    # native TimeType (time-of-day, no date part)
    "time": T.TimeType(),
    "char": T.StringType(),
    "varchar": T.StringType(),
    "text": T.StringType(),
    "binary": T.BinaryType(),
    "varbinary": T.BinaryType(),
}


def parse_type(sql_type: str) -> T.DataType:
    m = _TYPE_RE.match(sql_type.strip())
    if not m:
        raise ValueError(f"unparseable type: {sql_type!r}")
    base = m.group(1).lower()
    unsigned = "unsigned" in sql_type.lower()
    if base == "decimal" or base == "numeric":
        p = int(m.group(2) or 10)
        s = int(m.group(3) or 0)
        return T.DecimalType(p, s)
    if unsigned and base in _UNSIGNED_WIDEN:
        return _UNSIGNED_WIDEN[base]
    if base in _SIMPLE:
        return _SIMPLE[base]
    raise ValueError(f"unsupported reference type: {sql_type!r}")


@dataclass
class ParsedTable:
    name: str
    schema: T.StructType
    primary_key: tuple[str, ...] = ()
    unique_keys: tuple[tuple[str, ...], ...] = ()


_CREATE_RE = re.compile(
    r"create\s+table\s+(?:if\s+not\s+exists\s+)?[`\"]?(\w+)[`\"]?\s*\((.*?)\)\s*(?:engine[^;]*)?;",
    re.IGNORECASE | re.DOTALL,
)
_PK_RE = re.compile(r"^primary\s+key\s*\(([^)]*)\)", re.IGNORECASE)
_UK_RE = re.compile(r"^unique\s+(?:key|index)?\s*\w*\s*\(([^)]*)\)", re.IGNORECASE)
_KEY_RE = re.compile(r"^(?:key|index)\s", re.IGNORECASE)


def _split_columns(body: str) -> list[str]:
    """Split the CREATE TABLE body on top-level commas (parens nest)."""
    parts, depth, cur = [], 0, []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


def parse_ddl(ddl: str) -> dict[str, ParsedTable]:
    """Parse every CREATE TABLE in a reference-dialect DDL script.

    CREATE DATABASE / USE / DROP are recognized and skipped (our catalog
    is flat; the reference's schema level maps to a view-name prefix if
    ever needed).
    """
    out: dict[str, ParsedTable] = {}
    for m in _CREATE_RE.finditer(ddl):
        name = m.group(1).lower()
        fields: list[T.StructField] = []
        pk: tuple[str, ...] = ()
        uks: list[tuple[str, ...]] = []
        for item in _split_columns(m.group(2)):
            pk_m = _PK_RE.match(item)
            if pk_m:
                pk = tuple(c.strip(" `\"").lower() for c in pk_m.group(1).split(","))
                continue
            uk_m = _UK_RE.match(item)
            if uk_m:
                uks.append(
                    tuple(c.strip(" `\"").lower() for c in uk_m.group(1).split(","))
                )
                continue
            if _KEY_RE.match(item):
                continue  # secondary index — no Spark analog, metadata only
            col_m = re.match(r"[`\"]?(\w+)[`\"]?\s+(.*)", item, re.DOTALL)
            if not col_m:
                continue
            col, rest = col_m.group(1).lower(), col_m.group(2)
            nullable = not re.search(r"\bnot\s+null\b", rest, re.IGNORECASE)
            fields.append(T.StructField(col, parse_type(rest), nullable))
        out[name] = ParsedTable(name, T.StructType(fields), pk, tuple(uks))
    return out


def register_empty(spark, tables: dict[str, ParsedTable]) -> None:
    """Register each parsed table as an empty temp view (DDL-then-load flow,
    and the fixture for verbatim-SQL analysis parity tests)."""
    for t in tables.values():
        spark.createDataFrame([], t.schema).createOrReplaceTempView(t.name)
