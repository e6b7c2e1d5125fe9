"""SQL-text entry parity: the same queries users would type into the
shell / Thrift endpoint (literal Spark SQL over registered views) must
equal the DataFrame-built registry results — proving the SQL surface
is the DataFrame surface (one Catalyst underneath)."""

from __future__ import annotations

from walden_spark.registry import load_all
from walden_spark.tables import register_views


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_sql_text_equals_dataframe_q6(spark, sf_dir):
    register_views(spark, sf_dir)
    reg = load_all()
    df_result = reg["tpch_q6"].fn(spark, sf_dir)
    sql_result = spark.sql(
        """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
        """
    )
    assert _rows(df_result) == _rows(sql_result)


def test_sql_text_equals_dataframe_q1(spark, sf_dir):
    register_views(spark, sf_dir)
    reg = load_all()
    df_result = reg["tpch_q1"].fn(spark, sf_dir)
    sql_result = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(4,2)))
                        * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
               CAST(SUM(l_quantity) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
               CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    )
    assert _rows(df_result) == _rows(sql_result)


def test_agg_mv_rollup_serves_from_mv(spark, sf_dir, tmp_path):
    """ddl_mv_rollup_rewrite's serving evidence: a derivable coarser
    aggregate must READ THE MV's files (never the base parquet), an
    underivable request must fall back to the base, and the MV answer
    must equal the direct aggregation exactly."""
    from pyspark.sql import functions as F

    from walden_spark.catalog import Catalog

    cat = Catalog(spark)
    base = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    base.createOrReplaceTempView("mvt_base")
    spark.sql("DROP TABLE IF EXISTS walden_mvt_rollup")
    dec_q = "CAST(l_quantity AS DECIMAL(18,2))"
    cat.create_agg_mv(
        "walden_mvt_rollup",
        "mvt_base",
        keys=["l_returnflag", "l_linestatus"],
        aggs={"sum_q": ("sum", dec_q), "n_rows": ("count", "*")},
    )
    try:
        served = cat.serve_agg(
            "mvt_base", ["l_returnflag"], {"sum_qty": ("sum", dec_q), "n": ("count", "*")}
        )
        mv_files = set(spark.table("walden_mvt_rollup").inputFiles())
        base_files = set(base.inputFiles())
        got = set(served.inputFiles())
        assert got <= mv_files and not (got & base_files), "must serve from the MV"
        direct = base.groupBy("l_returnflag").agg(
            F.sum(F.expr(dec_q)).alias("sum_qty"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        assert sorted(map(tuple, served.collect())) == sorted(map(tuple, direct.collect()))
        # underivable (min not in MV) -> falls back to the base scan
        fb = cat.serve_agg("mvt_base", ["l_returnflag"], {"m": ("min", "l_quantity")})
        assert set(fb.inputFiles()) <= base_files
    finally:
        spark.sql("DROP TABLE walden_mvt_rollup")


def test_agg_mv_choice_scans_no_mv(spark, monkeypatch):
    """VERDICT r08 #3: serve_agg must pick the cheapest candidate MV
    from row counts CACHED in TBLPROPERTIES at create/refresh time —
    never by scanning every MV per serve call. Proven by making any
    DataFrame.count() during choice a hard failure; also checks the
    cheapest (coarser) of two matching MVs wins, the cached count is
    refreshed by refresh_agg_mv, and a pre-cache MV (property absent)
    still serves via the one-time count fallback."""
    from pyspark.sql import DataFrame

    from walden_spark.catalog import Catalog

    cat = Catalog(spark)
    spark.createDataFrame(
        [(1, "a", 10), (1, "b", 20), (2, "a", 5), (2, "b", 7)],
        "g int, h string, x bigint",
    ).createOrReplaceTempView("mvc_base")
    for t in ("walden_mvc_fine", "walden_mvc_coarse"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    cat.create_agg_mv(
        "walden_mvc_fine", "mvc_base",
        keys=["g", "h"], aggs={"s": ("sum", "x"), "n": ("count", "*")},
    )
    cat.create_agg_mv(
        "walden_mvc_coarse", "mvc_base",
        keys=["g"], aggs={"s": ("sum", "x"), "n": ("count", "*")},
    )
    try:
        def _no_scan(self, *a, **k):
            raise AssertionError("serve_agg scanned an MV during choice")

        monkeypatch.setattr(DataFrame, "count", _no_scan)
        served = cat.serve_agg("mvc_base", ["g"], {"s": ("sum", "x")})
        monkeypatch.undo()
        # the 2-row coarse MV must beat the 4-row fine MV
        assert set(served.inputFiles()) <= set(
            spark.table("walden_mvc_coarse").inputFiles()
        )
        assert {(r.g, r.s) for r in served.collect()} == {(1, 30), (2, 12)}

        # refresh keeps the cached count in sync
        spark.createDataFrame(
            [(1, "a", 1)] * 9, "g int, h string, x bigint"
        ).createOrReplaceTempView("mvc_base")
        cat.refresh_agg_mv("walden_mvc_coarse")
        _, nrows = cat._agg_mv_props("walden_mvc_coarse")
        assert nrows == 1

        # pre-cache MV (no walden.mv.rows property) falls back to count
        spark.sql(
            "ALTER TABLE walden_mvc_fine UNSET TBLPROPERTIES ('walden.mv.rows')"
        )
        spark.sql(
            "ALTER TABLE walden_mvc_coarse UNSET TBLPROPERTIES ('walden.mv.rows')"
        )
        fb = cat.serve_agg("mvc_base", ["g"], {"s": ("sum", "x")})
        assert fb.collect()
    finally:
        for t in ("walden_mvc_fine", "walden_mvc_coarse"):
            spark.sql(f"DROP TABLE {t}")


def test_agg_mv_refresh_catches_up_with_base(spark, tmp_path):
    """Agg-MV freshness contract: serve_agg answers as-at the last
    refresh (the Trino MV grace semantics); refresh_agg_mv re-runs the
    stored definition and the next serve reflects the new base."""
    from walden_spark.catalog import Catalog

    cat = Catalog(spark)
    spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 5.0)], "g int, x double"
    ).createOrReplaceTempView("mvr_base")
    spark.sql("DROP TABLE IF EXISTS walden_mvr")
    cat.create_agg_mv(
        "walden_mvr", "mvr_base",
        keys=["g"], aggs={"s": ("sum", "x"), "n": ("count", "*")},
    )
    try:
        first = {
            r.g: (r.s, r.n)
            for r in cat.serve_agg("mvr_base", ["g"], {"s": ("sum", "x"), "n": ("count", "*")}).collect()
        }
        assert first == {1: (30.0, 2), 2: (5.0, 1)}
        # base moves; the MV serves the stale-but-consistent snapshot
        spark.createDataFrame(
            [(1, 10.0), (1, 20.0), (2, 5.0), (2, 95.0)], "g int, x double"
        ).createOrReplaceTempView("mvr_base")
        stale = {
            r.g: (r.s, r.n)
            for r in cat.serve_agg("mvr_base", ["g"], {"s": ("sum", "x"), "n": ("count", "*")}).collect()
        }
        assert stale == first
        cat.refresh_agg_mv("walden_mvr")
        fresh = {
            r.g: (r.s, r.n)
            for r in cat.serve_agg("mvr_base", ["g"], {"s": ("sum", "x"), "n": ("count", "*")}).collect()
        }
        assert fresh == {1: (30.0, 2), 2: (100.0, 2)}
    finally:
        spark.sql("DROP TABLE walden_mvr")
