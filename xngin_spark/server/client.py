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


def connect(host: str, port: int, **kw) -> Connection:
    return Connection(host, port, **kw)
