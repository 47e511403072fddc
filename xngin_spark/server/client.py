"""Minimal MySQL text-protocol client — the test harness's counterpart
to server.py (the reference tests its protocol the same way:
doradb-protocol round-trips its own serde in-crate).

Implements exactly the client half of the subset the server speaks:
HandshakeResponse41 with mysql_native_password, COM_QUERY, text
resultset parsing. Not a production driver — stock drivers (PyMySQL,
mysql CLI, JDBC) speak the same packets and are the intended real
clients; this exists so the wire format is verified end-to-end without
external dependencies.
"""

from __future__ import annotations

import socket
import struct

from xngin_spark.server import protocol as P


class MySQLError(Exception):
    def __init__(self, errno: int, message: str) -> None:
        super().__init__(f"({errno}) {message}")
        self.errno = errno


class Connection:
    def __init__(
        self,
        host: str,
        port: int,
        user: str = "root",
        password: str = "",
        database: str | None = None,
        timeout: float = 60.0,
    ) -> None:
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self._login(user, password, database)

    # ---- handshake ---------------------------------------------------------

    def _login(self, user: str, password: str, database: str | None) -> None:
        seq, payload = P.read_packet(self.sock)
        if P.is_err(payload):
            raise MySQLError(*P.parse_err(payload))
        if payload[0] != 0x0A:
            raise MySQLError(-1, f"unexpected protocol version {payload[0]}")
        # server version (NUL-terminated), connection id, scramble parts
        pos = payload.index(b"\x00", 1) + 1
        pos += 4  # connection id
        nonce = payload[pos : pos + 8]
        pos += 8 + 1  # + filler
        pos += 2 + 1 + 2 + 2  # caps lower, charset, status, caps upper
        auth_len = payload[pos]
        pos += 1 + 10  # + reserved
        nonce += payload[pos : pos + max(auth_len - 9, 12)]
        nonce = nonce[:20]

        caps = (
            P.CLIENT_PROTOCOL_41
            | P.CLIENT_SECURE_CONNECTION
            | P.CLIENT_PLUGIN_AUTH
            | (P.CLIENT_CONNECT_WITH_DB if database else 0)
        )
        auth = P.native_password_scramble(password, nonce)
        resp = b"".join(
            [
                struct.pack("<II", caps, 1 << 24),
                bytes([P.CHARSET_UTF8MB4]),
                b"\x00" * 23,
                user.encode() + b"\x00",
                bytes([len(auth)]) + auth,
                (database.encode() + b"\x00") if database else b"",
                P.AUTH_PLUGIN + b"\x00",
            ]
        )
        seq = P.write_packet(self.sock, seq + 1, resp)
        _, payload = P.read_packet(self.sock)
        if P.is_err(payload):
            raise MySQLError(*P.parse_err(payload))
        if not P.is_ok(payload):
            raise MySQLError(-1, "login did not return OK")

    # ---- commands ----------------------------------------------------------

    def query(self, sql: str) -> tuple[list[str], list[list[str | None]]]:
        """COM_QUERY; returns (column_names, rows-as-text)."""
        P.write_packet(self.sock, 0, bytes([P.COM_QUERY]) + sql.encode())
        _, payload = P.read_packet(self.sock)
        if P.is_err(payload):
            raise MySQLError(*P.parse_err(payload))
        if P.is_ok(payload):
            return [], []
        n_cols, _ = P.read_lenenc_int(payload, 0)
        names = []
        for _ in range(n_cols):
            _, col = P.read_packet(self.sock)
            names.append(self._column_name(col))
        _, eof = P.read_packet(self.sock)
        if not P.is_eof(eof):
            raise MySQLError(-1, "missing EOF after column definitions")
        rows: list[list[str | None]] = []
        while True:
            _, payload = P.read_packet(self.sock)
            if P.is_eof(payload):
                return names, rows
            if P.is_err(payload):
                raise MySQLError(*P.parse_err(payload))
            rows.append(
                [
                    None if v is None else v.decode()
                    for v in P.parse_text_row(payload, n_cols)
                ]
            )

    def field_list(self, table: str, wildcard: str = "") -> list[str]:
        """COM_FIELD_LIST (legacy metadata command); returns the
        table's column names matching the optional LIKE wildcard."""
        P.write_packet(
            self.sock,
            0,
            bytes([P.COM_FIELD_LIST]) + table.encode() + b"\x00" + wildcard.encode(),
        )
        names: list[str] = []
        while True:
            _, payload = P.read_packet(self.sock)
            if P.is_eof(payload):
                return names
            if P.is_err(payload):
                raise MySQLError(*P.parse_err(payload))
            names.append(self._column_name(payload))

    # ---- prepared statements (binary protocol) -----------------------------

    def stmt_prepare(self, sql: str) -> tuple[int, int, int]:
        """COM_STMT_PREPARE; returns (stmt_id, n_params, n_cols)."""
        P.write_packet(self.sock, 0, bytes([P.COM_STMT_PREPARE]) + sql.encode())
        _, payload = P.read_packet(self.sock)
        if P.is_err(payload):
            raise MySQLError(*P.parse_err(payload))
        stmt_id = int.from_bytes(payload[1:5], "little")
        n_cols = int.from_bytes(payload[5:7], "little")
        n_params = int.from_bytes(payload[7:9], "little")
        for block in (n_params, n_cols):  # definition blocks + EOFs
            if block:
                for _ in range(block):
                    P.read_packet(self.sock)
                _, eof = P.read_packet(self.sock)
                if not P.is_eof(eof):
                    raise MySQLError(-1, "missing EOF in prepare response")
        return stmt_id, n_params, n_cols

    def stmt_execute(
        self, stmt_id: int, params: tuple = ()
    ) -> tuple[list[str], list[list[object]]]:
        """COM_STMT_EXECUTE; binds ``params`` (None/bool/int/float/str/
        bytes) and returns (column_names, typed rows decoded from the
        binary protocol)."""
        body = struct.pack("<IBI", stmt_id, 0, 1)
        if params:
            bitmap = bytearray((len(params) + 7) // 8)
            types, values = b"", b""
            for i, v in enumerate(params):
                if v is None:
                    bitmap[i // 8] |= 1 << (i % 8)
                    types += struct.pack("<H", P.TYPE_NULL)
                elif isinstance(v, bool):
                    types += struct.pack("<H", P.TYPE_TINY)
                    values += struct.pack("<b", int(v))
                elif isinstance(v, int):
                    types += struct.pack("<H", P.TYPE_LONGLONG)
                    values += struct.pack("<q", v)
                elif isinstance(v, float):
                    types += struct.pack("<H", P.TYPE_DOUBLE)
                    values += struct.pack("<d", v)
                else:
                    types += struct.pack("<H", P.TYPE_VAR_STRING)
                    b = v if isinstance(v, bytes) else str(v).encode()
                    values += P.lenenc_str(b)
            body += bytes(bitmap) + b"\x01" + types + values
        P.write_packet(self.sock, 0, bytes([P.COM_STMT_EXECUTE]) + body)
        _, payload = P.read_packet(self.sock)
        if P.is_err(payload):
            raise MySQLError(*P.parse_err(payload))
        if P.is_ok(payload):
            return [], []
        n_cols, _ = P.read_lenenc_int(payload, 0)
        names, col_types = [], []
        for _ in range(n_cols):
            _, col = P.read_packet(self.sock)
            name, tb = self._column_def(col)
            names.append(name)
            col_types.append(tb)
        _, eof = P.read_packet(self.sock)
        if not P.is_eof(eof):
            raise MySQLError(-1, "missing EOF after column definitions")
        rows: list[list[object]] = []
        while True:
            _, payload = P.read_packet(self.sock)
            if P.is_eof(payload):
                return names, rows
            if P.is_err(payload):
                raise MySQLError(*P.parse_err(payload))
            rows.append(P.parse_binary_row(payload, col_types))

    def stmt_close(self, stmt_id: int) -> None:
        P.write_packet(
            self.sock, 0, bytes([P.COM_STMT_CLOSE]) + struct.pack("<I", stmt_id)
        )  # no response by spec

    def ping(self) -> bool:
        P.write_packet(self.sock, 0, bytes([P.COM_PING]))
        _, payload = P.read_packet(self.sock)
        return P.is_ok(payload)

    def close(self) -> None:
        try:
            P.write_packet(self.sock, 0, bytes([P.COM_QUIT]))
        except OSError:
            pass
        self.sock.close()

    def __enter__(self) -> "Connection":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    @staticmethod
    def _column_name(payload: bytes) -> str:
        pos = 0
        for i in range(5):  # catalog, schema, table, org_table, name
            s, pos = P.read_lenenc_str(payload, pos)
        return s.decode()

    @staticmethod
    def _column_def(payload: bytes) -> tuple[str, int]:
        """ColumnDefinition41 -> (name, type_byte)."""
        pos, name = 0, b""
        for i in range(6):  # catalog, schema, table, org_table, name, org_name
            s, pos = P.read_lenenc_str(payload, pos)
            if i == 4:
                name = s
        _, pos = P.read_lenenc_int(payload, pos)  # fixed-length marker (0x0C)
        pos += 2 + 4  # charset + display length
        return name.decode(), payload[pos]


def connect(host: str, port: int, **kw) -> Connection:
    return Connection(host, port, **kw)
