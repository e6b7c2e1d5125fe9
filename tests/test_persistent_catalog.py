"""Persistent catalog: metadata must outlive the engine process.

The reference's defining catalog trait is a metadata service that
survives engine restarts (Nessie+Postgres, tf/main.tf:34-60, or the
legacy Hive metastore image, docker/metastore/Dockerfile:6-27). Spark's
default in-memory catalog dies with the session, so get_spark grows a
``persistent_catalog`` mode backed by a Hive metastore (embedded Derby
locally, thrift URI in production). Embedded Derby allows one live JVM
at a time, so the restart cycle runs as two sequential subprocesses —
exactly the "engine restarted, BI client reconnects" scenario.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap


def _run(py: str, cwd: str) -> str:
    proc = subprocess.run(
        [sys.executable, "-c", textwrap.dedent(py)],
        capture_output=True,
        text=True,
        timeout=240,
        cwd=cwd,
    )
    assert proc.returncode == 0, f"subprocess failed:\n{proc.stdout}\n{proc.stderr}"
    return proc.stdout


def test_catalog_survives_engine_restart(tmp_path):
    wh = tmp_path / "warehouse"
    ms = tmp_path / "metastore_db"
    prelude = f"""
    import sys
    sys.path.insert(0, {str(sys.path[0] or '.')!r})
    sys.path.insert(0, '/root/repo')
    from walden_spark.session import get_spark
    spark = get_spark(
        app_name="persist_test", master="local[2]", shuffle_partitions=2,
        warehouse_dir={str(wh)!r}, persistent_catalog=True,
        metastore_dir={str(ms)!r},
    )
    """
    _run(
        prelude
        + """
    from walden_spark.catalog import Catalog
    cat = Catalog(spark)
    cat.create_schema("persist_s")
    cat.ctas("persist_s.kv", "SELECT 1 AS k, 'one' AS v")
    spark.stop()
    """,
        cwd=str(tmp_path),
    )
    out = _run(
        prelude
        + """
    rows = spark.table("persist_s.kv").collect()
    dbs = [r[0] for r in spark.sql("SHOW DATABASES").collect()]
    print("ROWS", rows)
    print("HAS_SCHEMA", "persist_s" in dbs)
    spark.stop()
    """,
        cwd=str(tmp_path),
    )
    assert "ROWS [Row(k=1, v='one')]" in out
    assert "HAS_SCHEMA True" in out
