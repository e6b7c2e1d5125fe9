"""VersionedTable: snapshot retention, time travel, expiry
(reference capability: Nessie/Iceberg snapshots, tf/nessie-values.yaml)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from walden_spark.timetravel import VersionedTable


@pytest.fixture()
def vt(spark, tmp_path):
    t = VersionedTable(spark, str(tmp_path / "tbl"))
    df = spark.createDataFrame([(i, float(i)) for i in range(10)], "id long, v double")
    t.write(df)
    return t


def test_every_dml_is_a_snapshot(spark, vt):
    vt.delete_where(F.col("id") >= 5)          # v1
    vt.update_where({"v": F.col("v") * 10}, F.col("id") == 0)  # v2
    assert vt.current_version() == 2
    assert vt.read(version=0).count() == 10
    assert vt.read(version=1).count() == 5
    assert vt.read(version=2).filter("id = 0").collect()[0].v == 0.0 * 10
    ops = [r.operation for r in vt.history().orderBy("version").collect()]
    assert ops == ["write", "delete", "update"]


def test_merge_snapshot_and_null_update(spark, vt):
    src = spark.createDataFrame([(1, None), (99, 9.0)], "id long, v double")
    vt.merge_into(src, on=["id"])
    cur = {r.id: r.v for r in vt.read().collect()}
    assert cur[1] is None          # NULL update applied
    assert cur[99] == 9.0          # insert
    assert vt.read(version=0).filter("id = 1").collect()[0].v == 1.0  # history intact


def test_read_as_of_timestamp(spark, vt):
    ts_v0 = [m for m in vt._manifests()][0]["timestamp"]
    vt.delete_where(F.col("id") >= 1)
    assert vt.read_as_of(ts_v0).count() == 10
    assert vt.read().count() == 1


def test_expire_versions(spark, vt):
    vt.delete_where(F.col("id") >= 8)   # v1
    vt.delete_where(F.col("id") >= 6)   # v2
    dropped = vt.expire_versions(keep_last=2)
    assert dropped == [0]
    with pytest.raises(ValueError):
        vt.read(version=0)
    assert vt.read(version=1).count() == 8
    assert vt.read().count() == 6
