"""Serving & ops veneer (SURVEY.md §7.1 M6).

Reference surface being reproduced:
* BI connectivity — Superset connects via SQLAlchemy
  ``trino://trino:80/hive`` (reference: tf/superset/superset.tf:62).
  Spark's Thrift JDBC/ODBC server speaks the HiveServer2 protocol, so
  the equivalent URI is ``hive://host:10000/default`` — zero engine
  code beyond launching it.
* ``system``/runtime introspection — the reference registers a
  dedicated `trino-system` datasource exposing node/query stats
  (reference: tf/superset/superset.tf:63-68, README.md:184-185).
* pre-execution cost estimates (reference: tf/superset/superset.tf:61
  ``cost_estimate_enabled``) — ``EXPLAIN COST``.
"""

from __future__ import annotations

import os
import subprocess

from pyspark.sql import DataFrame, SparkSession


def system_runtime(spark: SparkSession) -> DataFrame:
    """`system.runtime.nodes`-style view: executor ids, memory, block
    status — queryable as a DataFrame (register as a temp view for BI).
    """
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    jobs = tracker.getActiveJobsIds()
    stages = tracker.getActiveStageIds()
    # executor memory status: JVM map executorId -> (maxMem, remainingMem)
    mem = sc._jsc.sc().getExecutorMemoryStatus()
    it = mem.iterator()
    rows = []
    while it.hasNext():
        kv = it.next()
        addr = kv._1()
        tup = kv._2()
        rows.append((str(addr), int(tup._1()), int(tup._2()), len(jobs), len(stages)))
    return spark.createDataFrame(
        rows,
        "executor string, max_mem_bytes long, free_mem_bytes long, "
        "active_jobs int, active_stages int",
    )


class QueryLog:
    """Query-history recorder — the reference's `system.runtime.queries`
    analog (README.md:184-185, Superset's trino-system datasource,
    tf/superset/superset.tf:63-68): one row per served statement with
    the columns BI tools expect — id, text, duration, state, error.
    Bounded ring buffer in-process; a cluster deployment points the
    same record() call at an external store. (pyspark exposes no Python
    QueryExecutionListener, so recording lives in the serving facade —
    WaldenSession.sql — which is where served-query history belongs.)"""

    MAX_ROWS = 1000

    def __init__(self):
        self.rows: list[tuple] = []
        self._next_id = 0

    def record(self, query: str, duration_sec: float, error: str | None) -> None:
        import time as _t

        self.rows.append(
            (
                self._next_id,
                query[:500],
                duration_sec,
                "FAILED" if error else "FINISHED",
                error,
                _t.time(),
            )
        )
        self._next_id += 1
        if len(self.rows) > self.MAX_ROWS:
            del self.rows[: -self.MAX_ROWS]


def system_queries(spark: SparkSession, log: QueryLog) -> DataFrame:
    """`system.runtime.queries`-style view over a QueryLog."""
    return spark.createDataFrame(
        log.rows,
        "query_id long, query string, duration_sec double, state string, "
        "error string, ended_at_unix double",
    )


def explain_cost(spark: SparkSession, sql: str) -> str:
    """EXPLAIN COST text (CBO row-count/size estimates when stats exist)."""
    return spark.sql(f"EXPLAIN COST {sql}").collect()[0][0]


def thrift_server_command(
    port: int = 10000, master: str = "local[*]", conf: dict[str, str] | None = None
) -> list[str]:
    """The launch command for Spark's Thrift JDBC/ODBC server — the BI
    entry point (SQLAlchemy `hive://localhost:{port}/default`, replacing
    the reference's `trino://trino:80/hive`). Returned (not executed) so
    deployments wire it into their own process supervisor."""
    cmd = [
        os.path.join(os.environ.get("SPARK_HOME", ""), "sbin", "start-thriftserver.sh"),
        "--master", master,
        "--hiveconf", f"hive.server2.thrift.port={port}",
    ]
    for k, v in (conf or {}).items():
        cmd += ["--conf", f"{k}={v}"]
    return cmd


def start_thrift_server(port: int = 10000, **kwargs) -> subprocess.Popen:
    """Launch the Thrift server as a subprocess (requires a full Spark
    distribution with sbin/; in pip-installed pyspark use
    ``HiveThriftServer2.startWithContext`` via the JVM gateway)."""
    return subprocess.Popen(thrift_server_command(port, **kwargs))


def start_thrift_in_session(spark: SparkSession, port: int = 10000) -> None:
    """In-process Thrift server on an existing session (pip pyspark
    path). BI tools connect to hive://localhost:{port} and see the
    session catalog."""
    spark.conf.set("hive.server2.thrift.port", str(port))
    jvm = spark._jvm
    jvm.org.apache.spark.sql.hive.thriftserver.HiveThriftServer2.startWithContext(
        spark._jsparkSession.sqlContext()
    )
