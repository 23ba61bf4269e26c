"""In-process SQL gateway: a live JDBC endpoint for the JDBC source/sink.

The reference's JDBC extractor executes its generated SQL against a real
database server over JDBC (gobblin-modules/gobblin-sql/.../source/jdbc/
JdbcExtractor.java:161 getExtractSql, :383 query build; connection
handling in JdbcProvider). The engine's ``read_jdbc`` delegates to
``spark.read.jdbc`` — but proving that path end-to-end needs a server.

This module boots Spark's own HiveServer2-compatible Thrift endpoint
(HiveThriftServer2, bundled in spark-hive-thriftserver) inside the
current JVM and points ``spark.read.jdbc`` back at it through the
bundled ``hive-jdbc`` driver. That exercises the REAL executor-side
JDBC scan machinery — driver class loading, schema resolution over a
wire protocol, WHERE-clause pushdown into the remote SQL, and
``predicates=[...]`` partitioned range scans — against a live SQL
server, with zero services outside the JVM.

Dialect note: Spark's JDBC relation quotes identifiers with double
quotes. Spark SQL (the dialect this server speaks) treats "x" as an
identifier only under ``spark.sql.ansi.doubleQuotedIdentifiers``; the
gateway URL therefore carries that setting as a per-connection conf so
every JDBC session parses the generated queries correctly regardless of
server-side defaults.

Scale posture: the gateway is a test/dev loopback — production targets
are real warehouse endpoints reached through the same ``read_jdbc``
code path (only the URL and driver class change). Nothing here is on
the data path at scale. Loopback-only scheduling rule: an outer JDBC
scan task blocks on an inner query in the SAME scheduler, so outer
parallelism must stay strictly below the local core count or the two
jobs deadlock; external servers have no such coupling.
"""

from __future__ import annotations

import socket
import time

from pyspark.sql import SparkSession

HIVE_DRIVER = "org.apache.hive.jdbc.HiveDriver"

# one thrift server per JVM (HiveThriftServer2 is a process singleton);
# remember the bound port so repeated calls reuse it
_started_port: int | None = None


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _port_open(port: int) -> bool:
    with socket.socket() as s:
        s.settimeout(0.2)
        return s.connect_ex(("127.0.0.1", port)) == 0


def start_sql_gateway(spark: SparkSession, port: int | None = None, timeout: float = 30.0) -> int:
    """Start (or reuse) the in-process Thrift SQL endpoint; returns the
    bound port. Tables visible to JDBC sessions are the shared-catalog
    ones (``CREATE TABLE ... USING parquet LOCATION ...``); temp views
    are session-scoped and NOT visible across connections."""
    global _started_port
    if _started_port is not None:
        return _started_port
    port = port or _free_port()
    spark.conf.set("hive.server2.thrift.port", str(port))
    spark.conf.set("hive.server2.thrift.bind.host", "127.0.0.1")
    jvm = spark._jvm
    jvm.org.apache.spark.sql.hive.thriftserver.HiveThriftServer2.startWithContext(
        spark._jsparkSession.sqlContext()
    )
    deadline = time.monotonic() + timeout
    while not _port_open(port):
        if time.monotonic() > deadline:
            raise TimeoutError(f"thrift SQL gateway did not open port {port}")
        time.sleep(0.2)
    _started_port = port
    return port


def gateway_url(port: int, database: str = "default") -> str:
    """JDBC URL for the gateway; carries the double-quoted-identifier
    conf per connection (see module docstring)."""
    return (
        f"jdbc:hive2://127.0.0.1:{port}/{database}"
        "?spark.sql.ansi.doubleQuotedIdentifiers=true"
    )


def register_shared_table(spark: SparkSession, name: str, parquet_path: str) -> None:
    """Expose a parquet table to every JDBC session via the shared
    external catalog (temp views would be invisible to new sessions)."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(f"CREATE TABLE {name} USING parquet LOCATION '{parquet_path}'")
