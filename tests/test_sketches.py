"""Sketch surface: HLL estimates must be mergeable and bounded.
(Sketch bytes are engine-specific, so the registry entry is rows-only;
this test pins the semantics instead.)"""

from __future__ import annotations

from walden_spark.registry import load_all


def test_hll_estimates_bounded_and_mergeable(spark, sf_dir):
    reg = load_all()
    rows = {(r.c_mktsegment, r.level): r for r in reg["agg_hll_sketch"].fn(spark, sf_dir).collect()}
    segs = [r for (seg, lvl), r in rows.items() if lvl == "segment"]
    assert segs, "expected per-segment sketches"
    for r in segs:  # default lgK=12 → ~2% error; allow 5%
        assert abs(r.approx_distinct - r.exact_distinct) <= max(2, 0.05 * r.exact_distinct)
    total = rows[("ALL", "union")]
    assert abs(total.approx_distinct - total.exact_distinct) <= max(2, 0.05 * total.exact_distinct)
    # merged estimate must be consistent with the parts (union ≥ max part)
    assert total.approx_distinct >= max(r.approx_distinct for r in segs)
