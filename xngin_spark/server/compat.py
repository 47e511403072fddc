"""MySQL client-compatibility shims for the wire server.

Stock clients open a session with housekeeping statements the engine's
SQL surface doesn't know — ``select @@version_comment limit 1`` (mysql
CLI banner), ``SET NAMES utf8mb4`` / ``SET autocommit=1`` (connectors),
``SELECT DATABASE()`` (prompt). The reference services these from its
session state (doradb-protocol conn.rs sysvar handling); here they are
rewritten/absorbed BEFORE Engine.sql so every stock client's opening
handshake succeeds against the Spark engine.

Scope is deliberately tiny: recognized MySQL session SETs become no-op
OKs (a ``SET spark.sql.*`` or any unrecognized SET still reaches the
engine — Spark conf-over-the-wire keeps working), known @@sysvars
become literals, unknown ones become NULL (reads as "not set" instead
of an ERR that aborts a client's init script), DATABASE() becomes the
current schema literal.
"""

from __future__ import annotations

import re

#: advertised session variables — the set stock clients/connectors read
#: at connect time. Values mirror a permissive MySQL 8 default session.
SYSVARS: dict[str, object] = {
    "version_comment": "xngin-spark",
    "version": "8.0.0-xngin-spark",
    "max_allowed_packet": 67108864,
    "character_set_client": "utf8mb4",
    "character_set_connection": "utf8mb4",
    "character_set_results": "utf8mb4",
    "character_set_server": "utf8mb4",
    "collation_server": "utf8mb4_0900_ai_ci",
    "collation_connection": "utf8mb4_0900_ai_ci",
    "autocommit": 1,
    "sql_mode": "",
    "lower_case_table_names": 0,
    "transaction_isolation": "REPEATABLE-READ",
    "wait_timeout": 28800,
    "interactive_timeout": 28800,
    "net_write_timeout": 60,
    "net_buffer_length": 16384,
    "sql_auto_is_null": 0,
    "auto_increment_increment": 1,
}

#: MySQL session SETs absorbed as no-ops. Anything else (notably
#: ``SET spark.*`` / ``SET <conf>=<value>`` for the engine) passes
#: through untouched.
_NOOP_SET = re.compile(
    r"(?i)^\s*SET\s+(?:(?:SESSION|GLOBAL|LOCAL)\s+)?"
    r"(NAMES\b|character_set_\w+|collation_\w+|autocommit\b|sql_mode\b|"
    r"sql_auto_is_null\b|sql_select_limit\b|wait_timeout\b|"
    r"interactive_timeout\b|net_write_timeout\b|net_read_timeout\b|"
    r"transaction\b|@+\w+)"
)

_SYSVAR = re.compile(r"@@(?:session\.|global\.)?(\w+)", re.IGNORECASE)
_DATABASE_FN = re.compile(r"(?i)\bDATABASE\s*\(\s*\)|\bSCHEMA\s*\(\s*\)")


def _lit(v: object) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, (int, float)):
        return str(v)
    # Backslash first, then quote-doubling: Spark treats \ as an escape
    # inside string literals, so an unescaped backslash could consume
    # the closing quote (same contract as server._sql_literal).
    return "'" + str(v).replace("\\", "\\\\").replace("'", "''") + "'"


def rewrite(sql: str, current_db: str | None = None) -> str | None:
    """Compat-rewrite ``sql`` for the wire path.

    Returns None when the statement is a recognized MySQL session SET
    to absorb (caller answers OK without touching the engine);
    otherwise the (possibly rewritten) SQL text.
    """
    if _NOOP_SET.match(sql):
        return None
    out = _SYSVAR.sub(lambda m: _lit(SYSVARS.get(m.group(1).lower())), sql)
    out = _DATABASE_FN.sub(_lit(current_db), out)
    return out
