"""Minimal DB-API 2.0 adapter over the driver JVM's ``java.sql``.

``delete_and_insert`` / ``ensure_table_ddl`` (sinks/jdbc_sink.py) take a
DB-API connection factory for their driver-side statements — the
reference uses psycopg2 there (pipeline.py:148-176).  When the target
is only reachable through a JDBC jar (no Python driver installed), this
adapter provides the same factory through py4j: statements execute on
the Spark driver's JVM connection, with DB-API transaction semantics
(``with conn:`` commits on success, rolls back on error, like sqlite3/
psycopg2).  Parameter placeholders are JDBC-style ``?`` — the same
paramstyle sqlite3 uses, so call sites work with either factory.

Driver-side singleton statements only (DELETE scope, DDL); bulk data
still flows through the distributed ``write.jdbc`` path.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import SparkSession


class JdbcCursor:
    """DB-API cursor over a ``java.sql.Connection``."""

    def __init__(self, jconn):
        self._jconn = jconn
        self.rowcount = -1
        self._rows: list[tuple] | None = None

    def execute(self, sql: str, params: Sequence[object] = ()) -> None:
        if params:
            ps = self._jconn.prepareStatement(sql)
            try:
                for i, p in enumerate(params, start=1):
                    ps.setObject(i, p)
                has_rs = ps.execute()
                self._consume(ps, has_rs)
            finally:
                ps.close()
        else:
            st = self._jconn.createStatement()
            try:
                has_rs = st.execute(sql)
                self._consume(st, has_rs)
            finally:
                st.close()

    def _consume(self, stmt, has_rs: bool) -> None:
        if has_rs:
            rs = stmt.getResultSet()
            ncols = rs.getMetaData().getColumnCount()
            rows = []
            while rs.next():
                rows.append(tuple(rs.getObject(i)
                                  for i in range(1, ncols + 1)))
            rs.close()
            self._rows = rows
            self.rowcount = len(rows)
        else:
            self._rows = None
            self.rowcount = stmt.getUpdateCount()

    def fetchall(self) -> list[tuple]:
        return list(self._rows or [])

    def fetchone(self):
        return self._rows.pop(0) if self._rows else None

    def close(self) -> None:
        self._rows = None


class JdbcConnection:
    """DB-API connection over ``java.sql.DriverManager``.

    Context-manager semantics mirror sqlite3/psycopg2: ``with conn:``
    commits on clean exit, rolls back on exception, does NOT close.
    """

    def __init__(self, jconn):
        self._jconn = jconn
        jconn.setAutoCommit(False)

    def cursor(self) -> JdbcCursor:
        return JdbcCursor(self._jconn)

    def commit(self) -> None:
        self._jconn.commit()

    def rollback(self) -> None:
        self._jconn.rollback()

    def close(self) -> None:
        # DB-API: closing rolls back any uncommitted transaction
        # (Derby refuses to close mid-transaction otherwise).
        if not self._jconn.isClosed():
            self._jconn.rollback()
        self._jconn.close()

    def __enter__(self) -> "JdbcConnection":
        return self

    def __exit__(self, exc_type, exc, tb) -> bool:
        if exc_type is None:
            self.commit()
        else:
            self.rollback()
        return False


def jdbc_dbapi_connect(spark: SparkSession, url: str) -> JdbcConnection:
    """Open a DB-API connection to ``url`` through the driver JVM.

    Usage: ``delete_and_insert(df, lambda: jdbc_dbapi_connect(spark,
    url), url, ...)`` — any JDBC driver on Spark's classpath
    (autoloaded via ``java.sql.DriverManager``) works.
    """
    jconn = spark._jvm.java.sql.DriverManager.getConnection(url)  # noqa: SLF001 — py4j gateway is the supported JVM bridge
    return JdbcConnection(jconn)
