"""MySQL client/server wire protocol — the packet layer.

Reference parity: doradb-protocol/src/mysql/{packet.rs, handshake.rs,
resultset.rs, auth.rs} implement the same surface for the reference's
server loop (doradb-server/src/mysql/serve_tcp.rs:47). This module is
written from the public MySQL protocol documentation (Protocol::
HandshakeV10, Protocol::HandshakeResponse41, COM_QUERY text resultset,
mysql_native_password): 3-byte little-endian length + 1-byte sequence
framing, length-encoded integers/strings, OK/ERR/EOF packets, column
definitions, and the SHA1 challenge-response scramble.

Scope: handshake + auth + COM_QUERY text resultsets +
COM_FIELD_LIST (the reference's MyCmd surface,
doradb-protocol/src/mysql/cmd/mod.rs:89-92), plus — beyond the
reference — the prepared-statement binary protocol
(COM_STMT_PREPARE/EXECUTE/CLOSE/RESET with per-type binary row
encoding), which JDBC-style connectors use by default. No
compression, no TLS.
"""

from __future__ import annotations

import hashlib
import socket
import struct
from dataclasses import dataclass

# capability flags (public protocol constants)
CLIENT_LONG_PASSWORD = 0x1
CLIENT_FOUND_ROWS = 0x2
CLIENT_LONG_FLAG = 0x4
CLIENT_CONNECT_WITH_DB = 0x8
CLIENT_PROTOCOL_41 = 0x200
CLIENT_TRANSACTIONS = 0x2000
CLIENT_SECURE_CONNECTION = 0x8000
CLIENT_PLUGIN_AUTH = 0x80000
CLIENT_PLUGIN_AUTH_LENENC_CLIENT_DATA = 0x200000
CLIENT_DEPRECATE_EOF = 0x1000000

SERVER_CAPABILITIES = (
    CLIENT_LONG_PASSWORD
    | CLIENT_LONG_FLAG
    | CLIENT_CONNECT_WITH_DB
    | CLIENT_PROTOCOL_41
    | CLIENT_TRANSACTIONS
    | CLIENT_SECURE_CONNECTION
    | CLIENT_PLUGIN_AUTH
)

# command bytes
COM_QUIT = 0x01
COM_INIT_DB = 0x02
COM_QUERY = 0x03
COM_FIELD_LIST = 0x04
COM_PING = 0x0E
COM_STMT_PREPARE = 0x16
COM_STMT_EXECUTE = 0x17
COM_STMT_CLOSE = 0x19
COM_STMT_RESET = 0x1A

# column types (text protocol sends all values as strings; the type
# byte tells the client how to interpret them; the binary protocol
# encodes per-type — see build_binary_row)
TYPE_TINY = 0x01
TYPE_SHORT = 0x02
TYPE_LONG = 0x03
TYPE_FLOAT = 0x04
TYPE_DOUBLE = 0x05
TYPE_NULL = 0x06
TYPE_LONGLONG = 0x08
TYPE_DATE = 0x0A
TYPE_DATETIME = 0x0C
TYPE_NEWDECIMAL = 0xF6
TYPE_BLOB = 0xFC
TYPE_VAR_STRING = 0xFD
TYPE_STRING = 0xFE

CHARSET_UTF8MB4 = 45  # utf8mb4_general_ci
SERVER_STATUS_AUTOCOMMIT = 0x0002

AUTH_PLUGIN = b"mysql_native_password"


# ---- framing ---------------------------------------------------------------


def read_packet(sock: socket.socket) -> tuple[int, bytes]:
    """Read one framed packet: (sequence_id, payload)."""
    head = _read_exact(sock, 4)
    (length,) = struct.unpack("<I", head[:3] + b"\x00")
    seq = head[3]
    return seq, _read_exact(sock, length)


def write_packet(sock: socket.socket, seq: int, payload: bytes) -> int:
    """Write one framed packet; returns the next sequence id."""
    if len(payload) >= 0xFFFFFF:  # pragma: no cover - resultset rows are small
        raise ValueError("multi-packet payloads not supported")
    sock.sendall(struct.pack("<I", len(payload))[:3] + bytes([seq & 0xFF]) + payload)
    return seq + 1


def _read_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed mid-packet")
        buf += chunk
    return buf


# ---- length-encoded primitives ---------------------------------------------


def lenenc_int(n: int) -> bytes:
    if n < 0xFB:
        return bytes([n])
    if n < 1 << 16:
        return b"\xfc" + struct.pack("<H", n)
    if n < 1 << 24:
        return b"\xfd" + struct.pack("<I", n)[:3]
    return b"\xfe" + struct.pack("<Q", n)


def lenenc_str(s: bytes) -> bytes:
    return lenenc_int(len(s)) + s


def read_lenenc_int(buf: bytes, pos: int) -> tuple[int, int]:
    first = buf[pos]
    if first < 0xFB:
        return first, pos + 1
    if first == 0xFC:
        return struct.unpack_from("<H", buf, pos + 1)[0], pos + 3
    if first == 0xFD:
        (v,) = struct.unpack("<I", buf[pos + 1 : pos + 4] + b"\x00")
        return v, pos + 4
    if first == 0xFE:
        return struct.unpack_from("<Q", buf, pos + 1)[0], pos + 9
    raise ValueError(f"invalid lenenc prefix {first:#x}")


def read_lenenc_str(buf: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = read_lenenc_int(buf, pos)
    return buf[pos : pos + n], pos + n


# ---- auth ------------------------------------------------------------------


def native_password_scramble(password: str, nonce: bytes) -> bytes:
    """mysql_native_password: SHA1(pw) XOR SHA1(nonce + SHA1(SHA1(pw)))."""
    if not password:
        return b""
    h1 = hashlib.sha1(password.encode()).digest()
    h2 = hashlib.sha1(h1).digest()
    h3 = hashlib.sha1(nonce + h2).digest()
    return bytes(a ^ b for a, b in zip(h1, h3))


def verify_native_password(
    password: str, nonce: bytes, auth_response: bytes
) -> bool:
    return native_password_scramble(password, nonce) == auth_response


# ---- handshake -------------------------------------------------------------


def build_handshake_v10(
    connection_id: int, nonce: bytes, server_version: bytes = b"8.0.0-xngin-spark"
) -> bytes:
    """Initial Handshake Packet (Protocol::HandshakeV10)."""
    assert len(nonce) == 20
    caps = SERVER_CAPABILITIES
    return b"".join(
        [
            b"\x0a",
            server_version + b"\x00",
            struct.pack("<I", connection_id),
            nonce[:8],
            b"\x00",
            struct.pack("<H", caps & 0xFFFF),
            bytes([CHARSET_UTF8MB4]),
            struct.pack("<H", SERVER_STATUS_AUTOCOMMIT),
            struct.pack("<H", caps >> 16),
            bytes([len(nonce) + 1]),  # auth plugin data length
            b"\x00" * 10,
            nonce[8:] + b"\x00",  # part 2 (12 bytes + NUL)
            AUTH_PLUGIN + b"\x00",
        ]
    )


@dataclass
class HandshakeResponse:
    capabilities: int
    max_packet: int
    charset: int
    username: str
    auth_response: bytes
    database: str | None
    auth_plugin: str | None


def parse_handshake_response(payload: bytes) -> HandshakeResponse:
    """Protocol::HandshakeResponse41."""
    caps, max_packet = struct.unpack_from("<II", payload, 0)
    if not caps & CLIENT_PROTOCOL_41:
        raise ValueError("pre-4.1 clients not supported")
    charset = payload[8]
    pos = 9 + 23  # 23 reserved zero bytes
    end = payload.index(b"\x00", pos)
    username = payload[pos:end].decode()
    pos = end + 1
    if caps & CLIENT_PLUGIN_AUTH_LENENC_CLIENT_DATA:
        auth, pos = read_lenenc_str(payload, pos)
    elif caps & CLIENT_SECURE_CONNECTION:
        n = payload[pos]
        auth = payload[pos + 1 : pos + 1 + n]
        pos += 1 + n
    else:
        end = payload.index(b"\x00", pos)
        auth = payload[pos:end]
        pos = end + 1
    database = None
    if caps & CLIENT_CONNECT_WITH_DB and pos < len(payload):
        end = payload.index(b"\x00", pos)
        database = payload[pos:end].decode()
        pos = end + 1
    plugin = None
    if caps & CLIENT_PLUGIN_AUTH and pos < len(payload):
        end = payload.find(b"\x00", pos)
        end = len(payload) if end < 0 else end
        plugin = payload[pos:end].decode()
    return HandshakeResponse(
        caps, max_packet, charset, username, auth, database, plugin
    )


# ---- generic packets -------------------------------------------------------


def build_ok(affected: int = 0, info: bytes = b"") -> bytes:
    return (
        b"\x00"
        + lenenc_int(affected)
        + lenenc_int(0)  # last insert id
        + struct.pack("<H", SERVER_STATUS_AUTOCOMMIT)
        + struct.pack("<H", 0)  # warnings
        + info
    )


def build_err(errno: int, message: str, sqlstate: str = "HY000") -> bytes:
    return (
        b"\xff"
        + struct.pack("<H", errno)
        + b"#"
        + sqlstate.encode()[:5].ljust(5, b"0")
        + message.encode()[:500]
    )


def build_eof() -> bytes:
    return b"\xfe" + struct.pack("<HH", 0, SERVER_STATUS_AUTOCOMMIT)


def is_ok(payload: bytes) -> bool:
    return bool(payload) and payload[0] == 0x00


def is_err(payload: bytes) -> bool:
    return bool(payload) and payload[0] == 0xFF


def is_eof(payload: bytes) -> bool:
    return bool(payload) and payload[0] == 0xFE and len(payload) < 9


def parse_err(payload: bytes) -> tuple[int, str]:
    (errno,) = struct.unpack_from("<H", payload, 1)
    msg = payload[4 + 5 :].decode(errors="replace")
    return errno, msg


# ---- text resultset --------------------------------------------------------


def build_column_definition(
    name: str,
    type_byte: int,
    decimals: int = 0,
    table: str = "",
    with_default: bool = False,
) -> bytes:
    """Protocol::ColumnDefinition41 (text resultset header entry).
    ``with_default`` appends the lenenc default-value field the spec
    requires when the definition answers COM_FIELD_LIST."""
    return b"".join(
        [
            lenenc_str(b"def"),  # catalog, always "def"
            lenenc_str(b""),  # schema
            lenenc_str(table.encode()),
            lenenc_str(table.encode()),  # org_table
            lenenc_str(name.encode()),
            lenenc_str(name.encode()),  # org_name
            lenenc_int(0x0C),  # fixed-length fields below
            struct.pack("<H", CHARSET_UTF8MB4),
            struct.pack("<I", 1024),  # display length
            bytes([type_byte]),
            struct.pack("<H", 0),  # flags
            bytes([decimals]),
            b"\x00\x00",
        ]
        + ([lenenc_int(0)] if with_default else [])  # zero-length default
    )


# ---- prepared statements (binary protocol) ---------------------------------


def build_stmt_prepare_ok(stmt_id: int, n_cols: int, n_params: int) -> bytes:
    """COM_STMT_PREPARE_OK first packet (followed by param + column
    definition blocks when the counts are non-zero)."""
    return (
        b"\x00"
        + struct.pack("<I", stmt_id)
        + struct.pack("<H", n_cols)
        + struct.pack("<H", n_params)
        + b"\x00"  # reserved filler
        + struct.pack("<H", 0)  # warnings
    )


def _marker_positions(sql: str) -> list[int]:
    """Positions of ``?`` parameter markers that are OUTSIDE quoted
    literals and OUTSIDE SQL comments (``-- …`` line and ``/* … */``
    block) — a ``?`` inside either is text, not a binding slot."""
    pos, in_q = [], ""
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if in_q:
            if ch == in_q:
                if i + 1 < n and sql[i + 1] == in_q:  # '' escape
                    i += 1
                else:
                    in_q = ""
        elif ch == "-" and sql.startswith("--", i):
            nl = sql.find("\n", i)
            i = n if nl < 0 else nl
        elif ch == "/" and sql.startswith("/*", i):
            end = sql.find("*/", i + 2)
            i = n if end < 0 else end + 1
        elif ch in ("'", '"', "`"):
            in_q = ch
        elif ch == "?":
            pos.append(i)
        i += 1
    return pos


def count_placeholders(sql: str) -> int:
    """Number of ``?`` parameter markers outside quotes and comments."""
    return len(_marker_positions(sql))


def substitute_params(sql: str, literals: list[str]) -> str:
    """Replace each real ``?`` marker (quote- and comment-aware, same
    scanner as count_placeholders) with the corresponding pre-rendered
    SQL literal."""
    out, last = [], 0
    for p, lit in zip(_marker_positions(sql), literals):
        out.append(sql[last:p])
        out.append(lit)
        last = p + 1
    out.append(sql[last:])
    return "".join(out)


def parse_stmt_execute(
    payload: bytes, n_params: int, prev_types: list[int] | None
) -> tuple[int, list[int] | None, list[object]]:
    """Parse a COM_STMT_EXECUTE body (after the command byte):
    returns (stmt_id, param_types, decoded_python_values). When the
    client sets new_params_bound=0 it re-uses ``prev_types`` from the
    statement's first execute (the protocol's re-execute fast path)."""
    stmt_id, _flags, _iters = struct.unpack_from("<IBI", payload, 0)
    pos = 9
    if n_params == 0:
        return stmt_id, prev_types, []
    nb = (n_params + 7) // 8
    null_bitmap = payload[pos : pos + nb]
    pos += nb
    new_bound = payload[pos]
    pos += 1
    if new_bound:
        types = [
            struct.unpack_from("<H", payload, pos + 2 * i)[0]
            for i in range(n_params)
        ]
        pos += 2 * n_params
    else:
        if prev_types is None:
            raise ValueError("execute without bound parameter types")
        types = prev_types
    values: list[object] = []
    for i in range(n_params):
        if null_bitmap[i // 8] & (1 << (i % 8)):
            values.append(None)
            continue
        t, unsigned = types[i] & 0xFF, bool(types[i] & 0x8000)
        if t == TYPE_NULL:
            values.append(None)
        elif t == TYPE_TINY:
            values.append(
                payload[pos] if unsigned
                else struct.unpack_from("<b", payload, pos)[0]
            )
            pos += 1
        elif t == TYPE_SHORT:
            values.append(struct.unpack_from("<H" if unsigned else "<h", payload, pos)[0])
            pos += 2
        elif t == TYPE_LONG:
            values.append(struct.unpack_from("<I" if unsigned else "<i", payload, pos)[0])
            pos += 4
        elif t == TYPE_LONGLONG:
            values.append(struct.unpack_from("<Q" if unsigned else "<q", payload, pos)[0])
            pos += 8
        elif t == TYPE_FLOAT:
            values.append(struct.unpack_from("<f", payload, pos)[0])
            pos += 4
        elif t == TYPE_DOUBLE:
            values.append(struct.unpack_from("<d", payload, pos)[0])
            pos += 8
        else:  # VAR_STRING / STRING / BLOB / NEWDECIMAL / DATE-as-text …
            v, pos = read_lenenc_str(payload, pos)
            values.append(v)
    return stmt_id, types, values


def build_binary_row(typed_values: list[tuple[int, object]]) -> bytes:
    """Binary-protocol resultset row: 0x00 header, NULL bitmap at
    offset 2, then per-type encoded non-NULL values in column order.
    ``typed_values`` pairs each value with the ADVERTISED column type
    byte (the contract: encode exactly what the column definition
    promised, or the client mis-parses every later column)."""
    n = len(typed_values)
    bitmap = bytearray((n + 7 + 2) // 8)
    body = []
    for i, (t, v) in enumerate(typed_values):
        if v is None:
            bitmap[(i + 2) // 8] |= 1 << ((i + 2) % 8)
            continue
        if t == TYPE_TINY:
            body.append(struct.pack("<b", int(v)))
        elif t == TYPE_LONGLONG:
            body.append(struct.pack("<q", int(v)))
        elif t == TYPE_DOUBLE:
            body.append(struct.pack("<d", float(v)))
        elif t == TYPE_DATE:
            body.append(struct.pack("<BHBB", 4, v.year, v.month, v.day))
        elif t == TYPE_DATETIME:
            body.append(
                struct.pack(
                    "<BHBBBBBI", 11, v.year, v.month, v.day,
                    v.hour, v.minute, v.second, v.microsecond,
                )
            )
        else:  # NEWDECIMAL / VAR_STRING / everything text-shaped
            b = v if isinstance(v, bytes) else str(v).encode()
            body.append(lenenc_str(b))
    return b"\x00" + bytes(bitmap) + b"".join(body)


def parse_binary_row(
    payload: bytes, types: list[int]
) -> list[object]:
    """Client-side decode of a binary resultset row."""
    n = len(types)
    nb = (n + 7 + 2) // 8
    bitmap = payload[1 : 1 + nb]
    pos = 1 + nb
    out: list[object] = []
    for i, t in enumerate(types):
        if bitmap[(i + 2) // 8] & (1 << ((i + 2) % 8)):
            out.append(None)
            continue
        if t == TYPE_TINY:
            out.append(struct.unpack_from("<b", payload, pos)[0])
            pos += 1
        elif t == TYPE_LONGLONG:
            out.append(struct.unpack_from("<q", payload, pos)[0])
            pos += 8
        elif t == TYPE_DOUBLE:
            out.append(struct.unpack_from("<d", payload, pos)[0])
            pos += 8
        elif t == TYPE_DATE:
            ln = payload[pos]
            y, m, d = struct.unpack_from("<HBB", payload, pos + 1) if ln else (0, 0, 0)
            import datetime as _dt

            out.append(_dt.date(y, m, d) if ln else None)
            pos += 1 + ln
        elif t == TYPE_DATETIME:
            ln = payload[pos]
            import datetime as _dt

            if ln >= 7:
                y, mo, d, h, mi, s = struct.unpack_from("<HBBBBB", payload, pos + 1)
                us = struct.unpack_from("<I", payload, pos + 8)[0] if ln == 11 else 0
                out.append(_dt.datetime(y, mo, d, h, mi, s, us))
            else:
                out.append(None)
            pos += 1 + ln
        else:
            v, pos = read_lenenc_str(payload, pos)
            out.append(v)
    return out


def build_text_row(values: list[bytes | None]) -> bytes:
    out = []
    for v in values:
        out.append(b"\xfb" if v is None else lenenc_str(v))
    return b"".join(out)


def parse_text_row(payload: bytes, n_cols: int) -> list[bytes | None]:
    vals: list[bytes | None] = []
    pos = 0
    for _ in range(n_cols):
        if payload[pos] == 0xFB:
            vals.append(None)
            pos += 1
        else:
            v, pos = read_lenenc_str(payload, pos)
            vals.append(v)
    return vals
