"""MySQL-wire server for the engine (doradb-server serve_tcp analog)."""

from xngin_spark.server.server import MySQLServer, serve  # noqa: F401
