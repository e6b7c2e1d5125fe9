"""Property-based differential for the SQL:2016 frame-exclusion
emulations (win_exclude_current / group / ties): random frames WITH
NULL values and duplicate order keys through the Spark emulation and
DuckDB's NATIVE EXCLUDE must agree exactly. The fixture corpus is
non-null, so these are the only tests exercising the ADVICE r09 #4
NULL edges (NULL current row; all-NULL neighborhoods; NULL peers)."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

# (grp, day, value): days collide (peer groups!), values include NULLs
row = st.tuples(
    st.integers(min_value=0, max_value=1),
    st.integers(min_value=0, max_value=5),
    st.one_of(st.none(), st.integers(min_value=-3, max_value=3)),
)
frame = st.lists(row, min_size=1, max_size=14)

SETTINGS = settings(
    max_examples=8,  # each example runs several Spark jobs — keep the suite fast
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _spark_df(spark, rows):
    # rid gives every row a stable identity (days collide by design)
    return spark.createDataFrame(
        [(i, g, d, v) for i, (g, d, v) in enumerate(rows)],
        "rid int, grp int, day int, v int",
    )


def _duck(rows, exclude):
    con = duckdb.connect()
    pdf = pd.DataFrame(
        [(i, g, d, v) for i, (g, d, v) in enumerate(rows)],
        columns=["rid", "grp", "day", "v"],
    ).astype({"rid": "int64", "grp": "int64", "day": "int64", "v": "Int64"})
    con.register("t", pdf)
    out = con.execute(
        f"""
SELECT rid,
       CAST(SUM(v) OVER w AS INT) AS s,
       CAST(COUNT(*) OVER w AS INT) AS c
FROM t
WINDOW w AS (PARTITION BY grp ORDER BY day
             RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING
             EXCLUDE {exclude})
ORDER BY rid
"""
    ).fetchall()
    con.close()
    return [
        (rid, None if pd.isna(s) else int(s), int(c)) for rid, s, c in out
    ]


def _emulate(spark, rows, exclude):
    df = _spark_df(spark, rows)
    wf = Window.partitionBy("grp").orderBy("day").rangeBetween(-2, 2)
    wp = Window.partitionBy("grp").orderBy("day").rangeBetween(0, 0)
    v = F.col("v")
    v0 = F.coalesce(v, F.lit(0))
    if exclude == "CURRENT ROW":
        nn = F.count(v).over(wf) - F.when(v.isNotNull(), 1).otherwise(0)
        s = F.when(nn > 0, F.sum(v).over(wf) - v0)
        c = F.count(F.lit(1)).over(wf) - 1
    elif exclude == "GROUP":
        nn = F.count(v).over(wf) - F.count(v).over(wp)
        # peer sum must coalesce: an all-NULL peer group sums to NULL
        # and would poison the subtraction (found by THIS test)
        s = F.when(
            nn > 0, F.sum(v).over(wf) - F.coalesce(F.sum(v).over(wp), F.lit(0))
        )
        c = F.count(F.lit(1)).over(wf) - F.count(F.lit(1)).over(wp)
    else:  # TIES
        nn = (
            F.count(v).over(wf)
            - F.count(v).over(wp)
            + F.when(v.isNotNull(), 1).otherwise(0)
        )
        s = F.when(
            nn > 0,
            F.sum(v).over(wf) - F.coalesce(F.sum(v).over(wp), F.lit(0)) + v0,
        )
        c = F.count(F.lit(1)).over(wf) - F.count(F.lit(1)).over(wp) + 1
    out = df.select(
        "rid", s.cast("int").alias("s"), c.cast("int").alias("c")
    ).orderBy("rid")
    return [tuple(r) for r in out.collect()]


@SETTINGS
@given(x=frame)
def test_exclude_current_row_matches_native(spark, x):
    assert _emulate(spark, x, "CURRENT ROW") == _duck(x, "CURRENT ROW")


@SETTINGS
@given(x=frame)
def test_exclude_group_matches_native(spark, x):
    assert _emulate(spark, x, "GROUP") == _duck(x, "GROUP")


@SETTINGS
@given(x=frame)
def test_exclude_ties_matches_native(spark, x):
    assert _emulate(spark, x, "TIES") == _duck(x, "TIES")
