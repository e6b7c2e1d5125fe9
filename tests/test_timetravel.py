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


def test_branch_tag_merge_fast_forward(spark, vt):
    """Nessie-analog refs: branch from main, commit on the branch
    (main untouched), tag the pre-branch state, fast-forward merge."""
    from walden_spark.timetravel import MergeConflictError

    v0 = vt.create_branch("etl")
    assert v0 == 0
    vt.create_tag("release-0")
    branch_df = vt.read(branch="etl").filter(F.col("id") < 3)
    vt.write(branch_df, operation="branch_filter", branch="etl")   # v1 on etl
    assert vt.head("main") == 0            # main unaffected
    assert vt.head("etl") == 1
    assert vt.read(branch="main").count() == 10
    assert vt.read(branch="etl").count() == 3
    # fast-forward: main's head (v0) is etl's ancestor
    new_head = vt.merge_branch("etl", into="main")
    assert new_head == 1
    assert vt.read(branch="main").count() == 3
    assert vt.read(tag="release-0").count() == 10   # tag pinned at v0
    refs = {(r.ref_type, r.ref_name): r.version for r in vt.refs().collect()}
    assert refs[("branch", "main")] == 1
    assert refs[("tag", "release-0")] == 0
    # merging again is a no-op, not an error
    assert vt.merge_branch("etl", into="main") == 1


def test_merge_conflict_on_divergence(spark, vt):
    """Divergent heads must refuse the content-unaware merge."""
    from walden_spark.timetravel import MergeConflictError

    vt.create_branch("b")
    vt.write(vt.read(branch="b").filter("id < 5"), branch="b")       # b → v1
    vt.write(vt.read(branch="main").filter("id >= 5"), branch="main")  # main → v2
    with pytest.raises(MergeConflictError):
        vt.merge_branch("b", into="main")
    # both branches still intact and readable after the failed merge
    assert vt.read(branch="b").count() == 5
    assert vt.read(branch="main").count() == 5


def test_ref_bookkeeping_errors(spark, vt):
    with pytest.raises(ValueError):
        vt.create_branch("main", at_version=0)  # already exists implicitly? explicit dup
    vt.create_tag("t0")
    with pytest.raises(ValueError):
        vt.create_tag("t0")
    with pytest.raises(ValueError):
        vt.read(tag="nope")
    with pytest.raises(ValueError):
        vt.delete_ref("branch", "main")
    vt.create_branch("dev")
    vt.delete_ref("branch", "dev")
    with pytest.raises(ValueError):
        vt.head("dev")


def test_concurrent_commit_conflict(spark, vt):
    """Two writers race the same next version: exactly one commits, the
    loser gets a clean ConcurrentWriteError, no torn state (VERDICT r03
    next-round #6 — enforce, not just document, single-writer)."""
    from walden_spark.timetravel import ConcurrentWriteError, VersionedTable

    # second handle = second client session onto the same table path
    other = VersionedTable(spark, vt.path)
    df = spark.createDataFrame([(100, 1.0)], "id long, v double")

    # freeze writer B's view of the table at the pre-commit state, so
    # both writers compute the same next version — the exact interleave
    # of two clients that both read before either commits
    ms_frozen = other._manifests()
    other._manifests = lambda: ms_frozen  # type: ignore[method-assign]
    v_a = vt.write(df, operation="writer_a")
    with pytest.raises(ConcurrentWriteError):
        other.write(df, operation="writer_b")
    # winner's commit intact; manifest content is writer A's; B's
    # staged data dir was cleaned up (only A's v_a data dir remains)
    real = VersionedTable(spark, vt.path)
    assert real._manifests()[-1]["operation"] == "writer_a"
    assert real.read().filter("id = 100").count() == 1
    import os

    v_dirs = [d for d in os.listdir(f"{vt.path}/data") if d.startswith(f"v={v_a}-")]
    assert len(v_dirs) == 1
