"""MySQL client/server wire protocol — the packet layer.

Reference parity: doradb-protocol/src/mysql/{packet.rs, handshake.rs,
resultset.rs, auth.rs} implement the same surface for the reference's
server loop (doradb-server/src/mysql/serve_tcp.rs:47). This module is
written from the public MySQL protocol documentation (Protocol::
HandshakeV10, Protocol::HandshakeResponse41, COM_QUERY text resultset,
mysql_native_password): 3-byte little-endian length + 1-byte sequence
framing, length-encoded integers/strings, OK/ERR/EOF packets, column
definitions, and the SHA1 challenge-response scramble.

Scope matches the reference: handshake + auth + COM_QUERY text
resultsets (the subset every driver/CLI needs); no prepared-statement
binary protocol, no compression, no TLS.
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

# column types (text protocol sends all values as strings; the type
# byte tells the client how to interpret them)
TYPE_TINY = 0x01
TYPE_LONGLONG = 0x08
TYPE_DOUBLE = 0x05
TYPE_NEWDECIMAL = 0xF6
TYPE_DATE = 0x0A
TYPE_DATETIME = 0x0C
TYPE_VAR_STRING = 0xFD

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
