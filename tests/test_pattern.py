"""Unit tests for the row-pattern compiler (operators/pattern.py) on
hand-computable sequences — the oracle queries check it against DuckDB
on real data; these pin the exact MATCH_RECOGNIZE-subset semantics:
maximal runs, greedy +, AFTER MATCH SKIP TO LAST overlap, min_len
bounds, and the FLAT class breaking UP/DOWN runs."""

from __future__ import annotations

import pytest

from walden_spark.operators.pattern import (
    DOWN,
    FLAT,
    UP,
    Step,
    classify_islands,
    match_pattern,
)


def _series(spark, values, pid=1):
    rows = [(pid, day, float(v)) for day, v in enumerate(values)]
    return spark.createDataFrame(rows, "pid int, day long, v double")


def test_islands_maximal_runs(spark):
    # values: 5 3 2 4 4 6 1  → transitions: D D U F U D
    df = _series(spark, [5, 3, 2, 4, 4, 6, 1])
    isl = {
        (r.dir, r.start_prev, r.end, r.len, r.anchor_val, r.end_val)
        for r in classify_islands(df, "pid", "day", "v").collect()
    }
    assert isl == {
        (DOWN, 0, 2, 2, 5.0, 2.0),  # 5→3→2
        (UP, 2, 3, 1, 2.0, 4.0),    # 2→4
        (FLAT, 3, 4, 1, 4.0, 4.0),  # 4→4
        (UP, 4, 5, 1, 4.0, 6.0),    # 4→6
        (DOWN, 5, 6, 1, 6.0, 1.0),  # 6→1
    }


def test_vshape_match_and_flat_breaks_adjacency(spark):
    # 5 3 2 4 4 6 1: DOWN(0..2) then UP(2..3) is a V; the FLAT at 3..4
    # breaks adjacency so UP(4..5) does NOT extend or re-anchor it.
    df = _series(spark, [5, 3, 2, 4, 4, 6, 1])
    m = match_pattern(df, "pid", "day", "v", [Step("d", DOWN), Step("u", UP)])
    rows = m.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.anchor_day, r.anchor_val, r.d_end, r.d_val, r.u_end, r.u_val) == (
        0, 5.0, 2, 2.0, 3, 4.0,
    )


def test_skip_to_last_overlap(spark):
    # 4 2 5 1 6: DOWN(0..1) UP(1..2) DOWN(2..3) UP(3..4) — two V's
    # sharing row 2 (end of first match anchors the second descent):
    # AFTER MATCH SKIP TO LAST UP semantics.
    df = _series(spark, [4, 2, 5, 1, 6])
    m = match_pattern(df, "pid", "day", "v", [Step("d", DOWN), Step("u", UP)])
    got = sorted((r.anchor_day, r.d_end, r.u_end) for r in m.collect())
    assert got == [(0, 1, 2), (2, 3, 4)]
    # and the same sequence is exactly one W
    w = match_pattern(
        df, "pid", "day", "v",
        [Step("d1", DOWN), Step("u1", UP), Step("d2", DOWN), Step("u2", UP)],
    )
    rows = w.collect()
    assert len(rows) == 1
    assert (rows[0].anchor_day, rows[0].u2_end) == (0, 4)


def test_min_len_quantifier(spark):
    # 1 2 3 4 0: one UP island of len 3, one DOWN of len 1
    df = _series(spark, [1, 2, 3, 4, 0])
    long_up = match_pattern(df, "pid", "day", "v", [Step("u", UP, min_len=3)])
    assert [(r.anchor_day, r.u_end, r.u_len) for r in long_up.collect()] == [(0, 3, 3)]
    assert match_pattern(
        df, "pid", "day", "v", [Step("u", UP, min_len=4)]
    ).count() == 0


def test_partitions_do_not_mix(spark):
    a = _series(spark, [3, 1, 5], pid=1)
    b = _series(spark, [2, 9], pid=2)  # UP only — no V
    m = match_pattern(
        a.unionByName(b), "pid", "day", "v", [Step("d", DOWN), Step("u", UP)]
    )
    assert [r.pid for r in m.collect()] == [1]


def test_flat_step_matches_plateau(spark):
    # 2 2 2 5: FLAT(len 2) then UP — a plateau surge
    df = _series(spark, [2, 2, 2, 5])
    m = match_pattern(
        df, "pid", "day", "v", [Step("p", FLAT, min_len=2), Step("s", UP)]
    )
    rows = m.collect()
    assert len(rows) == 1
    assert (rows[0].anchor_day, rows[0].p_len, rows[0].s_end, rows[0].s_val) == (
        0, 2, 3, 5.0,
    )


def test_bad_patterns_rejected(spark):
    df = _series(spark, [1, 2])
    with pytest.raises(ValueError, match="at least one step"):
        match_pattern(df, "pid", "day", "v", [])
    with pytest.raises(ValueError, match="duplicate"):
        match_pattern(df, "pid", "day", "v", [Step("x", UP), Step("x", DOWN)])


# ---- property test: compiler vs a brute-force reference matcher ----

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _brute_matches(values, steps):
    """Reference matcher in plain Python: classify transitions, find
    maximal same-class runs, chain adjacent runs per the pattern."""
    trans = []  # (pos, prev_idx, idx, dir)
    for i in range(1, len(values)):
        d = (values[i] > values[i - 1]) - (values[i] < values[i - 1])
        trans.append((i, d))
    runs = []  # (dir, start_prev_idx, end_idx, length)
    for i, d in trans:
        if runs and runs[-1][0] == d and runs[-1][2] == i - 1:
            runs[-1][2], runs[-1][3] = i, runs[-1][3] + 1
        else:
            runs.append([d, i - 1, i, 1])
    matches = []
    for r0 in runs:
        if r0[0] != steps[0].dir or r0[3] < steps[0].min_len:
            continue
        chain, cur = [r0], r0
        ok = True
        for s in steps[1:]:
            nxt = next(
                (r for r in runs if r[1] == cur[2] and r[0] == s.dir), None
            )
            if nxt is None or nxt[3] < s.min_len:
                ok = False
                break
            chain.append(nxt)
            cur = nxt
        if ok:
            matches.append((chain[0][1], tuple(c[2] for c in chain)))
    return sorted(matches)


@settings(
    max_examples=8,  # each example runs Spark jobs — keep the suite fast
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    values=st.lists(st.integers(min_value=0, max_value=3), min_size=2, max_size=14),
    pattern=st.sampled_from(
        [
            [Step("d", DOWN), Step("u", UP)],
            [Step("u", UP, min_len=2)],
            [Step("d1", DOWN), Step("u1", UP), Step("d2", DOWN)],
            [Step("p", FLAT), Step("s", UP)],
        ]
    ),
)
def test_compiler_matches_brute_force(spark, values, pattern):
    df = _series(spark, values)
    got = sorted(
        (r["anchor_day"], tuple(r[f"{s.name}_end"] for s in pattern))
        for r in match_pattern(df, "pid", "day", "v", pattern).collect()
    )
    assert got == _brute_matches([float(v) for v in values], pattern)


def test_max_len_quantifier(spark):
    # 1 2 3 4 0 1: UP island len 3, DOWN len 1, UP len 1 — {1,2} keeps
    # only runs of 1-2 transitions; maximal-run semantics means the
    # 3-long climb is NOT truncated into a shorter match.
    from walden_spark.operators.pattern import match_pattern

    df = _series(spark, [1, 2, 3, 4, 0, 1])
    m = match_pattern(df, "pid", "day", "v", [Step("u", UP, min_len=1, max_len=2)])
    assert [(r.anchor_day, r.u_end, r.u_len) for r in m.collect()] == [(4, 5, 1)]


def test_match_any_alternation(spark):
    # 4 2 5 5 6: DOWN(0..1) UP(1..2) FLAT(2..3) UP(3..4)
    # branch "v" = DOWN+ UP+ → one match (0..2)
    # branch "plateau" = FLAT+ UP+ → one match (2..4)
    from walden_spark.operators.pattern import match_any

    df = _series(spark, [4, 2, 5, 5, 6])
    out = match_any(
        df, "pid", "day", "v",
        {
            "v": [Step("d", DOWN), Step("u", UP)],
            "plateau": [Step("p", FLAT), Step("s", UP)],
        },
    )
    got = sorted(
        (r.pattern, r.anchor_day, r.step0_end, r.step1_end) for r in out.collect()
    )
    assert got == [("plateau", 2, 3, 4), ("v", 0, 1, 2)]
    # branches share the anchor columns and positional step columns
    assert set(out.columns) == {
        "pattern", "pid", "anchor_day", "anchor_val",
        "step0_end", "step0_val", "step0_len",
        "step1_end", "step1_val", "step1_len",
    }
    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least one pattern"):
        match_any(df, "pid", "day", "v", {})


def test_match_any_classifies_once(spark, monkeypatch):
    """VERDICT r10 nit #1: an N-branch alternation must run the
    classify/window shuffle ONCE, not once per branch — match_any
    builds the islands frame itself and hands it to every branch's
    chain build. Counted at the classify_islands call site (the plan
    is opaque past the localCheckpoint cut, so a plan-text assert
    can't see the stage count)."""
    import walden_spark.operators.pattern as P

    calls: list[int] = []
    orig = P.classify_islands

    def counting(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(P, "classify_islands", counting)
    df = _series(spark, [4, 2, 5, 5, 6])
    out = P.match_any(
        df, "pid", "day", "v",
        {
            "v": [Step("d", DOWN), Step("u", UP)],
            "plateau": [Step("p", FLAT), Step("s", UP)],
            "climb": [Step("u1", UP)],
        },
    )
    got = sorted((r.pattern, r.anchor_day) for r in out.collect())
    assert got == [("climb", 1), ("climb", 3), ("plateau", 2), ("v", 0)]
    assert len(calls) == 1, f"classified {len(calls)} times for 3 branches"


def test_span_measures_full_match_aggregates(spark):
    """VERDICT r10 #4: aggregates over the WHOLE matched span — anchor
    row through last step's end, inclusive — and a boundary row shared
    by two overlapping matches (SKIP TO LAST) counts in BOTH spans."""
    from pyspark.sql import functions as F

    from walden_spark.operators.pattern import span_measures

    # 4 2 5 1 6: V1 rows 0..2 (4+2+5=11), V2 rows 2..4 (5+1+6=12) —
    # row 2 (value 5) belongs to both spans
    df = _series(spark, [4, 2, 5, 1, 6])
    out = span_measures(
        df, "pid", "day", "v",
        [Step("d", DOWN), Step("u", UP)],
        {"total": F.sum("v"), "rows": F.count(F.lit(1)), "peak": F.max("v")},
        bin_width=2,  # spans straddle bin boundaries on purpose
    )
    got = sorted(
        (r.anchor_day, r.u_end, r.total, r.rows, r.peak) for r in out.collect()
    )
    assert got == [(0, 2, 11.0, 3, 5.0), (2, 4, 12.0, 3, 6.0)]
    with pytest.raises(ValueError, match="at least one aggregate"):
        span_measures(df, "pid", "day", "v", [Step("d", DOWN)], {})


def test_custom_classifier_magnitude_classes(spark):
    """DEFINE generality: a magnitude classifier (crash / drift-down /
    flat / drift-up / surge) replaces the sign classes — PATTERN
    (STRT CRASH+ SURGE+) over 9 7 1 2 3 9: crash 9→1 (two transitions
    -2,-6 both < -1 → class -2), drift 1→2→3 (class 1), surge 3→9
    (class 2). Crash island is not adjacent to the surge (drift
    intervenes) → no match; 9 4 1 8: crash(0..2) then surge(2..3) →
    one match."""
    from pyspark.sql import functions as F

    from walden_spark.operators.pattern import match_pattern

    def magnitude(cur, prev):
        d = cur - prev
        return (
            F.when(d <= -2, F.lit(-2))
            .when(d < 0, F.lit(-1))
            .when(d == 0, F.lit(0))
            .when(d >= 3, F.lit(2))
            .otherwise(F.lit(1))
        )

    steps = [Step("crash", -2), Step("surge", 2)]
    no_match = match_pattern(
        _series(spark, [9, 7, 1, 2, 3, 9]), "pid", "day", "v", steps,
        classifier=magnitude,
    )
    assert no_match.count() == 0
    m = match_pattern(
        _series(spark, [9, 4, 1, 8]), "pid", "day", "v", steps,
        classifier=magnitude,
    ).collect()
    assert len(m) == 1
    assert (m[0].anchor_day, m[0].crash_end, m[0].surge_end) == (0, 2, 3)


# ---- SKIP TO NEXT ROW: suffix-anchor expansion (this session) ----


def test_skip_next_emits_every_suffix_anchor(spark):
    """5 4 3 2 5: one DOWN island of 3 transitions then UP — a rescan
    anchors a V at offsets 0, 1, 2 into the descent, each with the
    remaining suffix as its down count, sharing bottom and end."""
    from walden_spark.operators.pattern import match_skip_next

    df = _series(spark, [5, 4, 3, 2, 5])
    m = match_skip_next(
        df, "pid", "day", "v", [Step("d", DOWN), Step("u", UP)]
    )
    got = sorted(
        (r.anchor_day, r.anchor_val, r.d_len, r.d_end, r.u_end)
        for r in m.collect()
    )
    assert got == [
        (0, 5.0, 3, 3, 4),
        (1, 4.0, 2, 3, 4),
        (2, 3.0, 1, 3, 4),
    ]


def test_skip_next_suffix_of_overlong_island(spark):
    """First step d{2,2} against a 3-long descent: the MAXIMAL match
    fails (run of 3 > bound 2) but the rescan finds the suffix anchored
    one row in — the case the maximal-run compilation cannot see, and
    the reason match_skip_next compiles the first step lower-bound
    only."""
    from walden_spark.operators.pattern import match_skip_next

    df = _series(spark, [5, 4, 3, 2, 5])
    none = match_pattern(
        df, "pid", "day", "v",
        [Step("d", DOWN, 2, 2), Step("u", UP)],
    )
    assert none.count() == 0
    m = match_skip_next(
        df, "pid", "day", "v", [Step("d", DOWN, 2, 2), Step("u", UP)]
    )
    got = [(r.anchor_day, r.d_len) for r in m.collect()]
    assert got == [(1, 2)]


def _brute_skip_next(values, steps):
    """Reference row-by-row rescan: try a greedy anchor at EVERY row
    (SKIP TO NEXT ROW advances one row after a match or a failure) —
    step bounds apply to the forward maximal run from the current
    point, per the compiler's documented greedy-run semantics."""

    def run_from(i, d):
        j = i
        while j + 1 < len(values):
            delta = (values[j + 1] > values[j]) - (values[j + 1] < values[j])
            if delta != d:
                break
            j += 1
        return j - i

    out = []
    for a in range(len(values)):
        pos, ok, ends = a, True, []
        for s in steps:
            r = run_from(pos, s.dir)
            if r < s.min_len or (s.max_len is not None and r > s.max_len):
                ok = False
                break
            pos += r
            ends.append(pos)
        if ok:
            out.append((a, tuple(ends)))
    return sorted(out)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    values=st.lists(st.integers(min_value=0, max_value=3), min_size=2, max_size=14),
    pattern=st.sampled_from(
        [
            [Step("d", DOWN), Step("u", UP)],
            [Step("d", DOWN, 1, 2), Step("u", UP)],
            [Step("u", UP, min_len=2)],
            [Step("d1", DOWN), Step("u1", UP), Step("d2", DOWN)],
        ]
    ),
)
def test_skip_next_matches_brute_rescan(spark, values, pattern):
    from walden_spark.operators.pattern import match_skip_next

    df = _series(spark, values)
    got = sorted(
        (r["anchor_day"], tuple(r[f"{s.name}_end"] for s in pattern))
        for r in match_skip_next(df, "pid", "day", "v", pattern).collect()
    )
    assert got == _brute_skip_next([float(v) for v in values], pattern)


def _brute_split_skip_next(values, steps):
    """Reference rescan for patterns holding adjacent SAME-class runs
    (r14, any length): per anchor, a run of members (each {l_t,h_t})
    consumes one maximal island of length s with Σl <= s <= Σh and
    splits it lexicographically-greedily — c_t = min(h_t, rem - Σ
    later lows), the last member taking the remainder."""

    def run_from(i, d):
        j = i
        while j + 1 < len(values):
            delta = (values[j + 1] > values[j]) - (values[j + 1] < values[j])
            if delta != d:
                break
            j += 1
        return j - i

    out = []
    for a in range(len(values)):
        pos, ok, ends = a, True, []
        i = 0
        while i < len(steps):
            g = 1
            while i + g < len(steps) and steps[i + g].dir == steps[i].dir:
                g += 1
            members = steps[i : i + g]
            r = run_from(pos, steps[i].dir)
            if g == 1:
                s = members[0]
                if r < s.min_len or (s.max_len is not None and r > s.max_len):
                    ok = False
                    break
                pos += r
                ends.append(pos)
            else:
                rem = r
                cs = []
                for t, s in enumerate(members):
                    if t == g - 1:
                        c = rem
                    else:
                        c = rem - sum(m.min_len for m in members[t + 1 :])
                        if s.max_len is not None:
                            c = min(s.max_len, c)
                    cs.append(c)
                    rem -= c
                if any(
                    c < s.min_len or (s.max_len is not None and c > s.max_len)
                    for c, s in zip(cs, members)
                ):
                    ok = False
                    break
                off = pos
                for c in cs:
                    off += c
                    ends.append(off)
                pos += r
            i += g
        if ok:
            out.append((a, tuple(ends)))
    return sorted(out)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    values=st.lists(st.integers(min_value=0, max_value=3), min_size=2, max_size=14),
    pattern=st.sampled_from(
        [
            [Step("a", UP), Step("b", UP)],                          # pair first
            [Step("a", UP, 1, 2), Step("b", UP, 1, 3)],              # bounded pair
            [Step("d", DOWN), Step("a", UP, 1, 2), Step("b", UP)],   # pair after a step
            [Step("a", UP), Step("b", UP), Step("c", DOWN)],         # pair then tail
            [Step("a", DOWN), Step("b", DOWN), Step("c", UP), Step("e", UP)],  # two pairs
            [Step("a", UP), Step("b", UP), Step("c", UP)],           # triple (r14 run)
            [Step("a", UP, 1, 2), Step("b", UP, 1, 1), Step("c", UP)],  # bounded triple
            [Step("d", DOWN), Step("a", UP), Step("b", UP), Step("c", UP)],  # triple after step
        ]
    ),
)
def test_split_pair_skip_next_matches_brute_rescan(spark, values, pattern):
    """r14 (VERDICT r13 #3): match_split_pair(skip_next=True) must
    equal the per-row rescan on anchors and every step end — including
    mid-island anchors when the pair leads the pattern."""
    from walden_spark.operators.pattern import match_split_pair

    df = _series(spark, values)
    got = sorted(
        (r["anchor_day"], tuple(r[f"{s.name}_end"] for s in pattern))
        for r in match_split_pair(
            df, "pid", "day", "v", pattern, skip_next=True
        ).collect()
    )
    assert got == _brute_split_skip_next([float(v) for v in values], pattern)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    values=st.lists(st.integers(min_value=0, max_value=3), min_size=2, max_size=14),
    pattern=st.sampled_from(
        [
            [Step("a", UP, 1, 2), Step("b", UP)],
            [Step("d", DOWN), Step("a", UP, 1, 2), Step("b", UP)],
            [Step("a", UP, 1, 2), Step("b", UP, 1, 1), Step("c", UP)],
        ]
    ),
)
def test_split_run_skip_to_mid_island_matches_brute_walk(spark, values, pattern):
    """r14 (skip resume ON a non-final run member): SKIP TO LAST <first
    run member> over the rescan-complete candidate set must equal the
    reference walk — keep candidates in anchor order whose anchor is
    at-or-after the previous kept match's resume row (the member's
    end, which lands MID-island)."""
    from walden_spark.operators.pattern import match_split_pair, select_skip_to

    vals = [float(v) for v in values]
    # resume member = the first step of the first same-class run
    ri = next(
        i for i, (x, y) in enumerate(zip(pattern, pattern[1:])) if x.dir == y.dir
    )
    cands = _brute_split_skip_next(vals, pattern)
    keep, bound = [], None
    for a, ends in cands:
        if bound is None or a >= bound:
            keep.append((a, ends))
            bound = ends[ri]
    df = _series(spark, values)
    matched = match_split_pair(df, "pid", "day", "v", pattern, skip_next=True)
    got = sorted(
        (r["anchor_day"], tuple(r[f"{s.name}_end"] for s in pattern))
        for r in select_skip_to(
            matched, "pid", "anchor_day", f"{pattern[ri].name}_end"
        ).collect()
    )
    assert got == keep


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    values=st.lists(st.integers(min_value=0, max_value=3), min_size=2, max_size=14),
    pattern=st.sampled_from(
        [
            [Step("a", UP), Step("b", UP), Step("c", UP)],           # triple
            [Step("a", UP, 1, 2), Step("b", UP, 1, 1), Step("c", UP)],
            [Step("d", DOWN), Step("a", UP), Step("b", UP), Step("c", UP)],
            [Step("a", DOWN), Step("b", DOWN), Step("c", UP), Step("e", UP)],
        ]
    ),
)
def test_split_run_skip_past_candidates_match_brute(spark, values, pattern):
    """r14 (same-class runs of any length): the skip-past candidate set
    is the rescan set restricted to maximal-island START anchors — the
    same lexicographic split, anchored only where no same-class
    transition enters the anchor row."""
    from walden_spark.operators.pattern import match_split_pair

    vals = [float(v) for v in values]
    d0 = pattern[0].dir
    exp = [
        (a, ends)
        for a, ends in _brute_split_skip_next(vals, pattern)
        if a == 0
        or ((vals[a] > vals[a - 1]) - (vals[a] < vals[a - 1])) != d0
    ]
    df = _series(spark, values)
    got = sorted(
        (r["anchor_day"], tuple(r[f"{s.name}_end"] for s in pattern))
        for r in match_split_pair(df, "pid", "day", "v", pattern).collect()
    )
    assert got == exp


# ---- reluctant quantifier on the FINAL step (this session) ----


def test_reluctant_final_truncates_to_min(spark):
    """5 3 2 4 6 5 7 with PATTERN (STRT d+ u+?): the first ascent is 2
    transitions long but reluctance stops after 1 — end re-points at
    day 3 (value 4), u_len 1; the second V (6 5 7) is untouched."""
    from walden_spark.operators.pattern import match_reluctant_final

    df = _series(spark, [5, 3, 2, 4, 6, 5, 7])
    m = match_reluctant_final(
        df, "pid", "day", "v", [Step("d", DOWN), Step("u", UP)]
    )
    got = sorted(
        (r.anchor_day, r.d_end, r.u_end, r.u_val, r.u_len) for r in m.collect()
    )
    assert got == [(0, 2, 3, 4.0, 1), (4, 5, 6, 7.0, 1)]


def test_reluctant_final_min_bound_and_same_class_rejected(spark):
    from walden_spark.operators.pattern import match_reluctant_final

    # u{2,9}? takes exactly 2 transitions of the 4-long ascent
    df = _series(spark, [5, 2, 3, 4, 5, 6])
    m = match_reluctant_final(
        df, "pid", "day", "v", [Step("d", DOWN), Step("u", UP, 2, 9)]
    ).collect()
    assert [(r.anchor_day, r.u_end, r.u_val, r.u_len) for r in m] == [
        (0, 3, 4.0, 2)
    ]
    with pytest.raises(ValueError, match="share a transition class"):
        match_reluctant_final(
            df, "pid", "day", "v",
            [Step("u1", UP), Step("d", DOWN), Step("u2", UP)],
        )
    with pytest.raises(ValueError, match="at least two steps"):
        match_reluctant_final(df, "pid", "day", "v", [Step("u", UP)])


# ---- SKIP TO NEXT ROW over repeated groups (this session) ----


def test_cycles_skip_next_boundary_and_suffix_anchors(spark):
    """6 4 2 5 1 3 = two chained (down+ up+) cycles: the rescan anchors
    at day 0 (2 cycles, 2-long first descent), day 1 (its suffix), and
    day 3 (the second cycle alone); suffix totals drop the skipped
    offset."""
    from walden_spark.operators.pattern import match_cycles_skip_next

    df = _series(spark, [6, 4, 2, 5, 1, 3])
    m = match_cycles_skip_next(
        df, "pid", "day", "v", [Step("d", DOWN), Step("u", UP)]
    )
    got = sorted(
        (r.anchor_day, r.n_cycles, r.d_total_len, r.u_total_len, r.end)
        for r in m.collect()
    )
    assert got == [
        (0, 2, 3, 2, 5),
        (1, 2, 2, 2, 5),
        (3, 1, 1, 1, 5),
    ]
    strict = match_cycles_skip_next(
        df, "pid", "day", "v", [Step("d", DOWN), Step("u", UP)],
        min_cycles=2,
    )
    assert sorted(r.anchor_day for r in strict.collect()) == [0, 1]


def test_cycles_skip_next_named_limits(spark):
    from walden_spark.operators.pattern import match_cycles_skip_next

    df = _series(spark, [4, 2, 5])
    with pytest.raises(ValueError, match="border"):
        match_cycles_skip_next(
            df, "pid", "day", "v",
            [Step("d", DOWN), Step("u", UP), Step("d2", DOWN), Step("u2", UP)],
        )


def _brute_cycles_skip_next(values, steps, min_cycles=1, max_cycles=None):
    """Reference row-by-row rescan for PATTERN (STRT (steps)<q>):
    per-anchor greedy cycle matcher with bounds-the-run per-step
    semantics (a forward run longer than a step's max fails)."""

    def run_from(i, d):
        j = i
        while j + 1 < len(values):
            delta = (values[j + 1] > values[j]) - (values[j + 1] < values[j])
            if delta != d:
                break
            j += 1
        return j - i

    out = []
    for a in range(len(values)):
        pos, count = a, 0
        while True:
            p, ok = pos, True
            for s in steps:
                r = run_from(p, s.dir)
                if r < s.min_len or (s.max_len is not None and r > s.max_len):
                    ok = False
                    break
                p += r
            if not ok:
                break
            count += 1
            pos = p
        if count >= min_cycles and (max_cycles is None or count <= max_cycles):
            out.append((a, count, pos))
    return sorted(out)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    values=st.lists(st.integers(min_value=0, max_value=3), min_size=2, max_size=14),
    pattern=st.sampled_from(
        [
            [Step("d", DOWN), Step("u", UP)],
            [Step("d", DOWN, 1, 2), Step("u", UP)],
            [Step("d", DOWN, 1, 1), Step("u", UP, 1, 2)],
            [Step("u", UP), Step("f", FLAT)],
        ]
    ),
)
def test_cycles_skip_next_matches_brute_rescan(spark, values, pattern):
    """The unit/run construction (incl. the bounded-first-step overlong
    arm) must equal a per-anchor rescan on anchors, cycle counts, and
    run ends."""
    from walden_spark.operators.pattern import match_cycles_skip_next

    df = _series(spark, values)
    got = sorted(
        (r["anchor_day"], r["n_cycles"], r["end"])
        for r in match_cycles_skip_next(
            df, "pid", "day", "v", pattern
        ).collect()
    )
    assert got == _brute_cycles_skip_next([float(v) for v in values], pattern)


def test_cycles_skip_next_bounded_first_overlong_arm(spark):
    """Bounded first step (this session, second pass): 9 8 7 6 8 5 7 =
    a 3-long descent (overlong for d{1,2}) then two chained (d u)
    cycles... anchors: offsets into the long descent with 1-2
    remaining DOWN transitions continue into the strict run."""
    from walden_spark.operators.pattern import match_cycles_skip_next

    # values: 9 8 7 6 8 5 7 → D(0..3 len3) U(3..4) D(4..5) U(5..6)
    df = _series(spark, [9, 8, 7, 6, 8, 5, 7])
    m = match_cycles_skip_next(
        df, "pid", "day", "v", [Step("d", DOWN, 1, 2), Step("u", UP)]
    )
    got = sorted(
        (r.anchor_day, r.n_cycles, r.d_total_len, r.end) for r in m.collect()
    )
    # boundary anchor at day 0 fails (descent run 3 > 2); offsets 1, 2
    # anchor with suffix 2, 1 and chain both cycles; day 4 anchors the
    # second cycle alone
    assert got == [
        (1, 2, 3, 6),
        (2, 2, 2, 6),
        (4, 1, 1, 6),
    ]
