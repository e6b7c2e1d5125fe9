"""Row-pattern matching compiler — the SQL:2016 MATCH_RECOGNIZE subset
Trino ships (reference: Trino 468 via tf/main.tf:82-114; walden itself
adds no engine code).

Spark has no MATCH_RECOGNIZE, but the pattern class that covers the
canonical analytics uses — ``PATTERN (STRT X1+ X2+ … Xk+)`` where each
``Xj`` is DEFINEd by a predicate over the current and previous row
(direction classes: value rose / fell / held) — compiles to relational
pieces Spark executes natively:

1. classify every adjacent-row transition into exactly one class
   (UP / DOWN / FLAT: the sign of the delta),
2. collapse maximal same-class runs into islands with the
   two-row-number trick (gaps in ``pos`` split runs, so an interleaved
   other-class row breaks a run exactly as strict DEFINE predicates
   would),
3. chain-join islands on adjacency — island ``j+1`` starts on the row
   where island ``j`` ended (``start_prev == end``) — one equi-join
   per pattern step beyond the first.

Because every transition belongs to exactly one class, maximal islands
of consecutive distinct-class steps reproduce greedy ``+`` quantifier
semantics with ``AFTER MATCH SKIP TO LAST`` overlap (a match's last row
may anchor the next match), matching the r09 ``win_pattern_vshape``
hand build, which this module generalizes (VERDICT r09 #4).

Scale shape: the classify/window stages are one partition-key shuffle;
islands are at most one row per input transition and usually far fewer,
so the (k−1) adjacency self-joins run on a frame that is orders of
magnitude smaller than the input, each equi on (partition, order) keys.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# direction classes: sign of (value - prev_value)
UP = 1
DOWN = -1
FLAT = 0


@dataclass(frozen=True)
class Step:
    """One ``Xj{m,n}`` pattern step: a maximal run of transitions of
    direction ``dir`` (UP / DOWN / FLAT), at least ``min_len`` and —
    when ``max_len`` is set — at most ``max_len`` transitions long.
    Because islands are MAXIMAL runs, ``max_len`` bounds the run
    itself (greedy semantics), not a prefix of it: a 5-long descent
    does not contain a 3-long match."""

    name: str
    dir: int
    min_len: int = 1
    max_len: int | None = None


def classify_islands(
    df: DataFrame,
    partition_col: str,
    order_col: str,
    value_col: str,
    classifier=None,
) -> DataFrame:
    """Stages 1+2: per-partition transition classes and maximal
    same-class islands.

    ``classifier`` generalizes the DEFINE clause beyond delta sign: a
    callable ``(cur, prev) -> Column`` mapping each transition to an
    integer class (classes must PARTITION the transitions — every
    transition gets exactly one class — or maximal-run semantics no
    longer mirror greedy quantifiers). Default: sign classes
    UP/DOWN/FLAT.

    Returns one row per island: ``(partition, dir, start_prev,
    anchor_val, end, end_val, len)`` where ``start_prev``/``anchor_val``
    are the order/value of the row the island's first transition rose
    or fell FROM (the match anchor), ``end``/``end_val`` the island's
    last row, and ``len`` the number of transitions in the run."""
    w = Window.partitionBy(partition_col).orderBy(order_col)
    seq = df.select(
        partition_col,
        order_col,
        value_col,
        F.lag(order_col).over(w).alias("_prev_ord"),
        F.lag(value_col).over(w).alias("_prev_val"),
        F.row_number().over(w).alias("_pos"),
    ).filter(F.col("_prev_val").isNotNull())
    if classifier is None:
        cls = (
            F.when(F.col(value_col) < F.col("_prev_val"), F.lit(DOWN))
            .when(F.col(value_col) > F.col("_prev_val"), F.lit(UP))
            .otherwise(F.lit(FLAT))
        )
    else:
        cls = classifier(F.col(value_col), F.col("_prev_val"))
    dirs = seq.withColumn("dir", cls)
    wd = Window.partitionBy(partition_col, "dir").orderBy("_pos")
    runs = dirs.withColumn("_grp", F.col("_pos") - F.row_number().over(wd))
    isl = runs.groupBy(partition_col, "dir", "_grp").agg(
        F.min("_prev_ord").alias("start_prev"),
        F.min_by("_prev_val", "_pos").alias("anchor_val"),
        F.max(order_col).alias("end"),
        F.max_by(value_col, "_pos").alias("end_val"),
        F.count(F.lit(1)).cast("bigint").alias("len"),
    ).drop("_grp")
    # island sequence number within the partition — consecutive islands
    # are adjacent by construction, so iseq arithmetic expresses
    # adjacency at the ISLAND level (match_cycles builds on this)
    wi = Window.partitionBy(partition_col).orderBy("start_prev")
    return isl.withColumn("iseq", F.row_number().over(wi).cast("bigint"))


def match_pattern(
    df: DataFrame,
    partition_col: str,
    order_col: str,
    value_col: str,
    steps: list[Step],
    classifier=None,
    islands: DataFrame | None = None,
) -> DataFrame:
    """Stage 3: compile ``PATTERN (STRT steps[0]+ steps[1]+ …)`` into
    an adjacency chain join over the islands.

    Output: one row per match — ``partition_col``, the match anchor
    (``anchor_<order>``, ``anchor_val``: the row the first step moved
    away from), and per step ``<name>_end``, ``<name>_val``,
    ``<name>_len`` (its last row's order/value and its run length).
    Overlap follows AFTER MATCH SKIP TO LAST: a match's final row may
    anchor the next match.

    ``islands`` lets a caller that already classified (``match_any``,
    full-span measures) pass the shared frame in — the input is then
    classified exactly once per query, not once per consumer."""
    if not steps:
        raise ValueError("pattern needs at least one step")
    names = [s.name for s in steps]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate step names: {names}")
    isl = islands
    if isl is None:
        isl = classify_islands(df, partition_col, order_col, value_col, classifier)
        if len(steps) > 1:
            # every step's frame filters the SAME islands pipeline —
            # without materialization the k-way chain join recomputes
            # the classify/window lineage k times (the standing
            # multi-consumer rule). localCheckpoint instead of persist
            # (ADVICE r10 #4): .persist() registers in the session
            # CacheManager and leaks for the session lifetime unless
            # explicitly unpersisted — impossible here, since the
            # frame must stay cached until the caller consumes the
            # lazy result. Checkpointed RDD blocks are freed by the
            # ContextCleaner as soon as the result DataFrame is
            # garbage-collected, so repeated invocations (bench loops,
            # oracle re-checks) don't accumulate. Islands are at most
            # one row per input transition — small — and the eager cut
            # also truncates the double-window lineage.
            isl = isl.localCheckpoint(eager=True)

    def step_frame(step: Step) -> DataFrame:
        out = isl.filter(
            (F.col("dir") == step.dir) & (F.col("len") >= step.min_len)
        )
        if step.max_len is not None:
            out = out.filter(F.col("len") <= step.max_len)
        return out.select(
            F.col(partition_col).alias(f"_p_{step.name}"),
            F.col("start_prev").alias(f"{step.name}_start_prev"),
            F.col("anchor_val").alias(f"{step.name}_anchor_val"),
            F.col("end").alias(f"{step.name}_end"),
            F.col("end_val").alias(f"{step.name}_val"),
            F.col("len").alias(f"{step.name}_len"),
            F.col("iseq").alias(f"{step.name}_iseq"),
        )

    chain = step_frame(steps[0])
    for prev, step in zip(steps, steps[1:]):
        nxt = step_frame(step)
        chain = chain.join(
            nxt,
            (F.col(f"_p_{prev.name}") == F.col(f"_p_{step.name}"))
            & (F.col(f"{step.name}_start_prev") == F.col(f"{prev.name}_end")),
        )
    first = steps[0].name
    keep = [
        F.col(f"_p_{first}").alias(partition_col),
        F.col(f"{first}_start_prev").alias(f"anchor_{order_col}"),
        F.col(f"{first}_anchor_val").alias("anchor_val"),
        F.col(f"{first}_iseq").alias("anchor_iseq"),
    ]
    for s in steps:
        keep += [
            F.col(f"{s.name}_end"),
            F.col(f"{s.name}_val"),
            F.col(f"{s.name}_len"),
        ]
    return chain.select(*keep)


def span_measures(
    df: DataFrame,
    partition_col: str,
    order_col: str,
    value_col: str,
    steps: list[Step],
    aggs: dict[str, Column],
    classifier=None,
    bin_width: int = 32,
) -> DataFrame:
    """MEASURES over the FULL matched span (VERDICT r10 #4 — closes the
    "aggregates over the whole match" out-of-class row in
    DEVIATIONS.md): every aggregate in ``aggs`` (out-name → aggregate
    Column over the input's row columns, e.g. ``F.sum("n")``) is
    computed across ALL rows of each match — anchor row through the
    final step's last row, inclusive — and appended to the
    ``match_pattern`` output columns.

    Mechanism: matches join back to the input rows on
    ``(partition, order BETWEEN anchor AND end)`` through the binned
    range-join technique (operators/rangejoin.py): each row lands in
    exactly one ``floor(order / bin_width)`` bin, each span is exploded
    into the bins it overlaps, and the join is EQUI on
    ``(partition, bin)`` with the BETWEEN as a residual filter — never
    a nested-loop plan, and never a cross-partition pair. A row shared
    by two overlapping matches (AFTER MATCH SKIP TO LAST) counts in
    both spans, per SQL:2016.

    Scale shape: matches are orders of magnitude fewer than rows; each
    row joins to at most the spans overlapping its bin within its own
    partition, and the aggregate shuffles one row per (match, agg).
    For pure ``value_col`` sums/counts at extreme scale a cheaper plan
    exists (carry per-island partials through classify_islands and
    combine), but the join-back is fully general over arbitrary row
    columns and aggregate functions."""
    if not aggs:
        raise ValueError("span_measures needs at least one aggregate")
    isl = classify_islands(
        df, partition_col, order_col, value_col, classifier
    ).localCheckpoint(eager=True)  # shared: chain join + (via m) span join
    m = match_pattern(
        df, partition_col, order_col, value_col, steps, islands=isl
    )
    anchor = f"anchor_{order_col}"
    last_end = f"{steps[-1].name}_end"
    spans = m.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(anchor) / bin_width),
                F.floor(F.col(last_end) / bin_width),
            )
        ),
    ).withColumnRenamed(partition_col, "__p")
    rows = df.select(
        F.col(partition_col).alias("__p"),
        F.col(order_col).alias("__o"),
        *[F.col(c) for c in df.columns if c != partition_col],
    ).withColumn("__bin", F.floor(F.col("__o") / bin_width))
    joined = spans.join(rows, ["__p", "__bin"]).filter(
        (F.col("__o") >= F.col(anchor)) & (F.col("__o") <= F.col(last_end))
    )
    match_cols = [c for c in m.columns if c != partition_col]
    out = joined.groupBy(F.col("__p").alias(partition_col), *match_cols).agg(
        *[a.alias(name) for name, a in aggs.items()]
    )
    return out.select(partition_col, *match_cols, *aggs.keys())


def _greedy_select(
    matches: DataFrame,
    partition_col: str,
    anchor_col: str,
    resume_col: str,
    inclusive: bool,
) -> DataFrame:
    """Greedy AFTER MATCH selection over the compiled match set: walk
    each partition's matches in anchor order, keep a match when its
    anchor is past the previous KEPT match's resume point
    (``resume_col``; ``inclusive`` keeps an anchor ON the resume row —
    SKIP TO semantics — while exclusive demands strictly after — SKIP
    PAST). Sequential per partition KEY by nature, so it runs as a
    pandas pass over the MATCHES frame (orders of magnitude smaller
    than the input, one row per match), never over the rows.

    Batching (late-r11 probe finding): grouping the Arrow exchange by
    the partition key itself costs one Python-worker round trip per
    KEY — a few ms each, which dominated everything at 10^4+ keys
    (tools/pattern_scale_probe.py measured the walk at 10.3 s for 7.7k
    matches, 4x the whole classify+chain pipeline, growing linearly in
    keys). The exchange is therefore grouped by a 64-bucket HASH of
    the key and the per-key walk runs INSIDE the pandas function
    (pandas groupby) — same result, bounded worker invocations, and
    still parallel across buckets at any key count."""
    import pandas as pd

    schema = matches.schema

    def pick(pdf):
        # column access throughout: itertuples/getattr would mangle
        # helper columns like __end (leading-underscore rename)
        out = []
        for _, g in pdf.groupby(partition_col, sort=False):
            g = g.sort_values(anchor_col, kind="mergesort")
            anchors = g[anchor_col].to_numpy()
            resumes = g[resume_col].to_numpy()
            keep = []
            bound = None
            for i in range(len(g)):
                if bound is None or (
                    anchors[i] >= bound if inclusive else anchors[i] > bound
                ):
                    keep.append(i)
                    bound = resumes[i]
            out.append(g.iloc[keep])
        return pd.concat(out) if out else pdf.iloc[0:0]

    bucket = F.pmod(F.hash(F.col(partition_col)), F.lit(64))
    return matches.groupBy(bucket.alias("__skip_bkt")).applyInPandas(
        pick, schema
    )


def select_skip_past(
    matches: DataFrame,
    partition_col: str,
    anchor_col: str,
    end_col: str,
) -> DataFrame:
    """``AFTER MATCH SKIP PAST LAST ROW`` over the compiled match set:
    keep, per partition in anchor order, every match whose anchor lies
    strictly after the previous KEPT match's last row — the greedy
    non-overlapping selection Trino's default skip mode performs while
    scanning. Semantics note (documented in DEVIATIONS.md): candidates
    are the compiler's maximal-run matches, so a suffix of a maximal
    run never re-anchors a match after a skip — SKIP PAST LAST ROW here
    selects among the same matches SKIP TO LAST enumerates.

    For single-step-overlap patterns (e.g. V-shapes, where a candidate
    can only anchor on the previous match's final row) an equivalent
    fully-relational plan exists — chain matches on
    ``anchor == lag(end)`` and keep odd chain positions — which is
    exactly what the DuckDB oracle of ``win_pattern_skip_past`` runs,
    hash-pinning this general implementation against it."""
    return _greedy_select(matches, partition_col, anchor_col, end_col, False)


def select_skip_to(
    matches: DataFrame,
    partition_col: str,
    anchor_col: str,
    resume_col: str,
) -> DataFrame:
    """``AFTER MATCH SKIP TO LAST <step>`` (any step) over the compiled
    match set: the scan resumes AT the named step's final row —
    ``resume_col`` is that step's ``_end`` column — so the next kept
    match may anchor ON it (inclusive greedy walk). A non-final step's
    end is an island boundary (the next island starts there), so the
    resume point always lands on a boundary and the compiled candidate
    set contains every match the rescan could find — no suffix-anchor
    gap. ``SKIP TO FIRST <step_j>`` (j ≥ 2) is served by the identity
    ``first row of step j == last row of step j−1``; TO FIRST of the
    first step would resume on the match's own anchor (the standard's
    infinite-loop error case). For the FINAL step this reproduces the
    historical overlap behavior on boundary-overlap patterns (V-shapes:
    every chained match kept) while correctly dropping inside-anchored
    matches for ≥3-step patterns (W-shapes), per Trino."""
    return _greedy_select(matches, partition_col, anchor_col, resume_col, True)


def expand_all_rows(
    df: DataFrame,
    matches: DataFrame,
    partition_col: str,
    order_col: str,
    steps: list[Step],
    bin_width: int = 32,
    match_no_col: str | None = None,
) -> DataFrame:
    """``ALL ROWS PER MATCH``: one output row per input row per match —
    every row from the match anchor through the final step's last row,
    inclusive, carrying all of ``df``'s columns plus

    * ``match_no`` — MATCH_NUMBER(): 1-based rank of the match by
      anchor within its partition,
    * every match-level column of the ``matches`` frame (the anchor
      pair plus each step's ``_end``/``_val``/``_len`` — these are the
      FINAL-semantics per-step measures, constant over the match),
    * ``classifier`` — CLASSIFIER(): ``'STRT'`` on the anchor row, else
      the name of the pattern step whose run covers the row.

    A row shared by two overlapping matches (SKIP TO LAST) is emitted
    once per match, with that match's ``match_no``/``anchor``, per
    SQL:2016. Mechanism: the same binned range-join as
    :func:`span_measures` — spans explode into ``floor(order/bin)``
    bins, the join is EQUI on (partition, bin) with the BETWEEN as a
    residual, never a nested loop. The classifier is a CASE over the
    match's per-step end boundaries (step ends are strictly increasing
    along the chain, so the first satisfied bound names the step).

    Scale shape: output is bounded by total matched-span length; the
    only new shuffle beyond ``match_pattern`` is the (partition, bin)
    equi join, keyed on the same partition column."""
    anchor = f"anchor_{order_col}"
    last_end = f"{steps[-1].name}_end"
    if match_no_col is not None:
        # caller-assigned numbering (alternation: ranks span branches,
        # so each branch's expansion must not renumber its own subset)
        m = matches.withColumnRenamed(match_no_col, "match_no")
    else:
        wm = Window.partitionBy(partition_col).orderBy(anchor)
        m = matches.withColumn(
            "match_no", F.row_number().over(wm).cast("bigint")
        )
    spans = m.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(anchor) / bin_width),
                F.floor(F.col(last_end) / bin_width),
            )
        ),
    ).withColumnRenamed(partition_col, "__p")
    row_cols = [c for c in df.columns if c != partition_col]
    rows = df.select(
        F.col(partition_col).alias("__p"),
        F.col(order_col).alias("__o"),
        *[F.col(c) for c in row_cols],
    ).withColumn("__bin", F.floor(F.col("__o") / bin_width))
    joined = spans.join(rows, ["__p", "__bin"]).filter(
        (F.col("__o") >= F.col(anchor)) & (F.col("__o") <= F.col(last_end))
    )
    cls = F.when(F.col("__o") == F.col(anchor), F.lit("STRT"))
    for s in steps:
        cls = cls.when(F.col("__o") <= F.col(f"{s.name}_end"), F.lit(s.name))
    match_cols = [
        c for c in matches.columns if c not in (partition_col, match_no_col)
    ]
    return joined.select(
        F.col("__p").alias(partition_col),
        F.col("match_no"),
        *[F.col(c) for c in match_cols],
        *[F.col(c) for c in row_cols],
        cls.alias("classifier"),
    )


def match_skip_next(
    df: DataFrame,
    partition_col: str,
    order_col: str,
    value_col: str,
    steps: list[Step],
    classifier=None,
    bin_width: int = 32,
    islands: DataFrame | None = None,
    reluctant_final: bool = False,
) -> DataFrame:
    """``AFTER MATCH SKIP TO NEXT ROW`` (this session — closes the
    first-named out-of-class row in DEVIATIONS.md): the full match set a
    row-by-row rescan finds, emitted with no greedy selection at all.

    Under SKIP TO NEXT ROW the scan attempts an anchor at EVERY row
    (each match advances the scan by exactly one row, and failed
    attempts advance it too), so the output is simply "every row where
    a greedy match succeeds". Within this linear class that set has a
    closed relational form: a match anchored at row ``p`` exists iff
    ``p`` sits inside a maximal first-step island with a remaining
    suffix of ``len1 − o`` transitions (``o`` = p's offset from the
    island's own anchor) inside the first step's ``{m,n}`` bounds, and
    the rest of the island chain completes the pattern — i.e. it is a
    SUFFIX-ANCHORED variant of a chain match. Anchors inside LATER
    islands never match (the first step's class differs from the next
    step's by the partition property, so the transition following such
    a row has the wrong class until the next island boundary — which is
    a compiled anchor already). This makes the relation Trino-EXACT for
    this skip mode — unlike SKIP PAST LAST ROW, whose greedy selection
    over maximal-run candidates keeps the documented suffix-re-anchor
    delta, TO NEXT ROW needs no selection and the candidate set here is
    complete by construction.

    Note the first step is compiled with its LOWER bound only: a
    maximal first island longer than ``max_len`` anchors no maximal
    match, but its in-bound suffixes do — exactly what the rescan
    finds (pinned by ``test_skip_next_suffix_of_overlong_island``).

    Output: the ``match_pattern`` schema, one row per successful
    anchor; ``anchor_<order>``/``anchor_val`` are the re-anchored row
    and the first step's ``_len`` is its remaining suffix length.

    Scale shape: one binned (partition, bin) equi join of the small
    match frame against the first-island spans (same technique as
    :func:`span_measures`), plus one window over (partition, anchor) on
    the joined frame — no new fact-sized shuffle, no selection pass."""
    if not steps:
        raise ValueError("pattern needs at least one step")
    s1 = steps[0]
    relaxed = [Step(s1.name, s1.dir, s1.min_len, None)] + list(steps[1:])
    if reluctant_final:
        # composition with a reluctant FINAL step (closes the "SKIP TO
        # NEXT ROW × reluctant-final" row): relax the final bound too,
        # truncate each match's end to min_len into the final island,
        # THEN suffix-expand the first island — the transformations
        # touch disjoint islands for k ≥ 2, so sequencing them is the
        # per-anchor rescan semantics exactly. Unlike the greedy
        # selection modes, the FIRST and FINAL steps may share a class
        # here: the rescan keeps every anchor, and anchors inside a
        # truncated final tail belong to OTHER matches' first islands —
        # enumerated by their own suffix expansion, not by any resume
        # bookkeeping, so candidate completeness never involves the
        # truncated ends.
        if len(steps) < 2:
            raise ValueError(
                "a reluctant FINAL step needs at least two steps — on a "
                "single-step pattern it composes with the anchor itself"
            )
        sk = steps[-1]
        relaxed[-1] = Step(sk.name, sk.dir, sk.min_len, None)
    m = match_pattern(
        df, partition_col, order_col, value_col, relaxed, classifier,
        islands=islands,
    )
    if reluctant_final:
        m = _truncate_final_join(
            df, m, partition_col, order_col, value_col, steps, bin_width
        )
    anchor = f"anchor_{order_col}"
    first_end = f"{s1.name}_end"
    spans = m.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(anchor) / bin_width),
                F.floor(F.col(first_end) / bin_width),
            )
        ),
    ).withColumnRenamed(partition_col, "__p")
    rows = df.select(
        F.col(partition_col).alias("__p"),
        F.col(order_col).alias("__o"),
        F.col(value_col).alias("__v"),
    ).withColumn("__bin", F.floor(F.col("__o") / bin_width))
    # rows of the first island's span EXCLUDING its last row (a suffix
    # needs at least one transition; the min_len filter below tightens)
    joined = spans.join(rows, ["__p", "__bin"]).filter(
        (F.col("__o") >= F.col(anchor)) & (F.col("__o") < F.col(first_end))
    )
    wo = Window.partitionBy("__p", anchor).orderBy("__o")
    joined = joined.withColumn(
        "__off", F.row_number().over(wo).cast("bigint") - 1
    )
    suffix = F.col(f"{s1.name}_len") - F.col("__off")
    joined = joined.filter(suffix >= s1.min_len)
    if s1.max_len is not None:
        joined = joined.filter(suffix <= s1.max_len)
    keep = [
        F.col("__p").alias(partition_col),
        F.col("__o").alias(anchor),
        F.col("__v").alias("anchor_val"),
        F.col("anchor_iseq"),
    ]
    for s in steps:
        keep += [
            F.col(f"{s.name}_end"),
            F.col(f"{s.name}_val"),
            (suffix if s.name == s1.name else F.col(f"{s.name}_len")).alias(
                f"{s.name}_len"
            ),
        ]
    return joined.select(*keep)


def match_reluctant_final(
    df: DataFrame,
    partition_col: str,
    order_col: str,
    value_col: str,
    steps: list[Step],
    classifier=None,
    bin_width: int = 32,
) -> DataFrame:
    """Reluctant quantifier on the FINAL step (this session — closes
    the "reluctant final step" out-of-class row): ``Xk+?`` /
    ``Xk{m,n}?`` consumes exactly ``min_len`` transitions — nothing
    follows the final step, so a reluctant quantifier never extends
    past its lower bound, per regex semantics (Trino's
    MATCH_RECOGNIZE uses the same preferment rules).

    The match is compiled with the final step bounded BELOW only (the
    upper bound is unreachable under reluctance), then each match's end
    is re-pointed at the row ``min_len`` transitions into the final
    island via the binned span join, with ``<name>_len`` set to
    ``min_len``. All earlier steps are untouched.

    Candidate-set completeness constraint (validated): the FIRST step's
    class must differ from the FINAL step's. A truncated match ends
    mid-island; rows between the truncated end and the island's end
    could re-anchor a new match only if the first step's class matched
    the final island's class — rejected here so the compiled anchors
    stay rescan-complete under the greedy skip selections.

    Scale shape: identical to :func:`match_skip_next` — one binned equi
    join of matches to the final island's span plus one window."""
    _reluctant_final_guard(steps)
    sk = steps[-1]
    relaxed = list(steps[:-1]) + [Step(sk.name, sk.dir, sk.min_len, None)]
    m = match_pattern(
        df, partition_col, order_col, value_col, relaxed, classifier
    )
    return _truncate_final_join(
        df, m, partition_col, order_col, value_col, steps, bin_width
    )


def match_split_pair(
    df: DataFrame,
    partition_col: str,
    order_col: str,
    value_col: str,
    steps: list[Step],
    classifier=None,
    bin_width: int = 32,
    skip_next: bool = False,
    islands: DataFrame | None = None,
) -> DataFrame:
    """Adjacent SAME-class step RUNS (r13 served pairs; r14 generalizes
    to runs of ANY length, closing the same-class-TRIPLE named limit):
    ``PATTERN (… A{l0,h0} B{l1,h1} C{l2,h2} …)`` where consecutive
    steps share one transition class (e.g. all ``v > PREV(v)``).

    Maximal islands cannot chain within one class, but SQL:2016 greedy
    preferment gives the split a CLOSED FORM over one island: it is
    LEXICOGRAPHIC — each member, left to right, keeps the maximum the
    rest of the run allows —

        c_t = min(h_t, rem_t − Σ_{u>t} l_u),   rem_{t+1} = rem_t − c_t

    (backtracking only ever shrinks an earlier member just enough for
    later minimums, which is exactly this formula; the g = 2 case
    reduces to the r13 pair form ``c_A = min(ha, n − lb)``, and Trino
    468 splits ``up+ up2+ up3+`` over one ascent n−2/1/1 this way).
    Each run compiles as ONE merged synthetic step with bounds
    ``{Σl, Σh}`` (unbounded if any member is), and the per-step
    columns are recovered afterwards: the run's LAST member ends on
    the merged island end; each INNER boundary row (offset
    ``Σ_{u≤t} c_u`` into the island) is fetched with the same binned
    span join :func:`match_reluctant_final` uses (equi on (partition,
    bin), never a nested loop, touching only matched-span rows) —
    ``g−1`` such joins per run of g members.

    DISJOINT runs split independently — each consumes its own maximal
    island in full. Consistent with this compiler's island convention,
    bounded upper quantifiers bound the RUN: a run matches an island
    iff ``Σl ≤ n ≤ Σh``.

    Output schema: identical to :func:`match_pattern` on the ORIGINAL
    steps, so greedy skip selection and the measure layer compose
    unchanged. Skip-resume caveat (enforced by the SQL compiler): a
    resume point ON any non-final run member's end lands mid-island,
    where the compiled candidate set has no anchors — only boundary
    steps may be skip targets.

    ``skip_next=True`` (r14 — closes the r13 named limit "same-class
    pairs under SKIP TO NEXT ROW"): the merged pattern routes through
    :func:`match_skip_next` instead of :func:`match_pattern`. The
    rescan's per-row anchors compose with the split for free: for a
    pattern-FIRST run the suffix-anchor expansion enumerates every
    in-bound suffix of the shared island — exactly the mid-island
    anchors the rescan attempts — and each anchor's suffix ``s``
    re-splits independently, which the recovery below already computes
    per anchor row because the merged ``_len`` column IS the suffix
    length under skip-next. For non-first runs, anchors live only in
    the first step's islands (match_skip_next's completeness argument
    applies verbatim to the merged pattern), and the recovery join is
    per-match as before. No greedy selection runs in this mode.
    """
    # maximal runs of consecutive same-class steps, length >= 2
    groups: list[tuple[int, int]] = []  # (start index, member count)
    i = 0
    while i < len(steps):
        j = i
        while j + 1 < len(steps) and steps[j + 1].dir == steps[i].dir:
            j += 1
        if j > i:
            groups.append((i, j - i + 1))
        i = j + 1
    if not groups:
        raise ValueError("match_split_pair needs an adjacent same-class run")
    group_start = {g[0]: g[1] for g in groups}
    msteps: list[Step] = []
    merged_name: dict[int, str] = {}   # group start index -> synthetic name
    merged_pos: dict[int, int] = {}    # group start index -> msteps position
    i = 0
    while i < len(steps):
        if i in group_start:
            members = steps[i : i + group_start[i]]
            merged_max = (
                sum(s.max_len for s in members)
                if all(s.max_len is not None for s in members)
                else None
            )
            name = f"__run{len(merged_name)}"
            merged_name[i] = name
            merged_pos[i] = len(msteps)
            msteps.append(
                Step(name, members[0].dir, sum(s.min_len for s in members), merged_max)
            )
            i += len(members)
        else:
            msteps.append(steps[i])
            i += 1
    if skip_next:
        m = match_skip_next(
            df, partition_col, order_col, value_col, msteps, classifier,
            bin_width=bin_width, islands=islands,
        )
    else:
        m = match_pattern(
            df, partition_col, order_col, value_col, msteps, classifier,
            islands=islands,
        )
    anchor = f"anchor_{order_col}"
    rows = df.select(
        F.col(partition_col).alias("__p"),
        F.col(order_col).alias("__o"),
        F.col(value_col).alias("__v"),
    ).withColumn("__bin", F.floor(F.col("__o") / bin_width))
    for k, (gi, g) in enumerate(groups):
        members = steps[gi : gi + g]
        gname = merged_name[gi]
        n = F.col(f"{gname}_len")
        # lexicographic greedy over the shared island: each member
        # keeps the maximum the REST of the run allows —
        # c_t = min(hi_t, rem_t − Σ lo_{u>t}), rem_{t+1} = rem_t − c_t
        # (the g = 2 case reduces to the r13 pair closed form)
        suffix_lo = [sum(s.min_len for s in members[t + 1 :]) for t in range(g)]
        rem = n.cast("bigint")
        cum = F.lit(0).cast("bigint")
        for t, s in enumerate(members):
            if t == g - 1:
                c_t = rem
            else:
                c_t = (rem - F.lit(suffix_lo[t])).cast("bigint")
                if s.max_len is not None:
                    c_t = F.least(F.lit(s.max_len).cast("bigint"), c_t)
            m = m.withColumn(f"__c{k}_{t}", c_t)
            cum = (cum + F.col(f"__c{k}_{t}")).cast("bigint")
            m = m.withColumn(f"__cum{k}_{t}", cum)
            rem = (n - cum).cast("bigint")
            cum = F.col(f"__cum{k}_{t}")
        j = merged_pos[gi]
        start = anchor if j == 0 else f"{msteps[j - 1].name}_end"
        run_end = f"{gname}_end"
        # one binned span join per INNER boundary (g−1 of them; the
        # run's last member ends on the merged island end) — equi on
        # (partition, bin), touching only matched-span rows
        for t in range(g - 1):
            keep_cols = list(m.columns)
            spans = m.withColumn(
                "__bin",
                F.explode(
                    F.sequence(
                        F.floor(F.col(start) / bin_width),
                        F.floor(F.col(run_end) / bin_width),
                    )
                ),
            ).withColumnRenamed(partition_col, "__p")
            joined = spans.join(rows, ["__p", "__bin"]).filter(
                (F.col("__o") > F.col(start)) & (F.col("__o") <= F.col(run_end))
            )
            wo = Window.partitionBy("__p", anchor).orderBy("__o")
            joined = joined.withColumn(
                "__off", F.row_number().over(wo).cast("bigint")
            ).filter(F.col("__off") == F.col(f"__cum{k}_{t}"))
            m = joined.select(
                F.col("__p").alias(partition_col),
                *[F.col(c) for c in keep_cols if c != partition_col],
                F.col("__o").alias(f"__bo{k}_{t}"),
                F.col("__v").alias(f"__bv{k}_{t}"),
            )
    keep = [
        F.col(partition_col),
        F.col(anchor),
        F.col("anchor_val"),
        F.col("anchor_iseq"),
    ]
    by_index = {gi: k for k, (gi, _) in enumerate(groups)}
    i = 0
    while i < len(steps):
        if i in group_start:
            g = group_start[i]
            k = by_index[i]
            gname = merged_name[i]
            for t, s in enumerate(steps[i : i + g]):
                if t == g - 1:
                    end_c, val_c = F.col(f"{gname}_end"), F.col(f"{gname}_val")
                else:
                    end_c, val_c = F.col(f"__bo{k}_{t}"), F.col(f"__bv{k}_{t}")
                keep += [
                    end_c.alias(f"{s.name}_end"),
                    val_c.alias(f"{s.name}_val"),
                    F.col(f"__c{k}_{t}").alias(f"{s.name}_len"),
                ]
            i += g
        else:
            s = steps[i]
            keep += [
                F.col(f"{s.name}_end"),
                F.col(f"{s.name}_val"),
                F.col(f"{s.name}_len"),
            ]
            i += 1
    return m.select(*keep)


def _reluctant_final_guard(steps: list[Step]) -> None:
    if len(steps) < 2:
        raise ValueError(
            "a reluctant FINAL step needs at least two steps — on a "
            "single-step pattern it composes with the anchor itself"
        )
    if steps[-1].dir == steps[0].dir:
        raise ValueError(
            "reluctant final step: the first and final steps share a "
            "transition class, so a truncated match's tail could "
            "re-anchor a rescan match outside the compiled candidate "
            "set — out of class"
        )


def _truncate_final_join(
    df: DataFrame,
    m: DataFrame,
    partition_col: str,
    order_col: str,
    value_col: str,
    steps: list[Step],
    bin_width: int,
) -> DataFrame:
    """Re-point each match's end at the row ``min_len`` transitions
    into the FINAL island (the reluctant-final truncation) — shared by
    :func:`match_reluctant_final` and the SKIP TO NEXT ROW composition
    in :func:`match_skip_next` (the two transformations touch disjoint
    islands for k ≥ 2, so they compose by sequencing)."""
    sk = steps[-1]
    anchor = f"anchor_{order_col}"
    prev_end = f"{steps[-2].name}_end"
    last_end = f"{sk.name}_end"
    spans = m.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(prev_end) / bin_width),
                F.floor(F.col(last_end) / bin_width),
            )
        ),
    ).withColumnRenamed(partition_col, "__p")
    rows = df.select(
        F.col(partition_col).alias("__p"),
        F.col(order_col).alias("__o"),
        F.col(value_col).alias("__v"),
    ).withColumn("__bin", F.floor(F.col("__o") / bin_width))
    joined = spans.join(rows, ["__p", "__bin"]).filter(
        (F.col("__o") > F.col(prev_end)) & (F.col("__o") <= F.col(last_end))
    )
    wo = Window.partitionBy("__p", anchor).orderBy("__o")
    joined = joined.withColumn("__off", F.row_number().over(wo).cast("bigint"))
    joined = joined.filter(F.col("__off") == sk.min_len)
    keep = [
        F.col("__p").alias(partition_col),
        F.col(anchor),
        F.col("anchor_val"),
        F.col("anchor_iseq"),
    ]
    for s in steps[:-1]:
        keep += [
            F.col(f"{s.name}_end"),
            F.col(f"{s.name}_val"),
            F.col(f"{s.name}_len"),
        ]
    keep += [
        F.col("__o").alias(f"{sk.name}_end"),
        F.col("__v").alias(f"{sk.name}_val"),
        F.lit(sk.min_len).cast("bigint").alias(f"{sk.name}_len"),
    ]
    return joined.select(*keep)


def match_cycles(
    df: DataFrame,
    partition_col: str,
    order_col: str,
    value_col: str,
    cycle_steps: list[Step],
    min_cycles: int = 1,
    max_cycles: int | None = None,
    classifier=None,
    islands: DataFrame | None = None,
) -> DataFrame:
    """Repeated-group patterns — ``PATTERN (STRT (X1+ X2+ … Xk+)+)``
    (late r11): one row per MAXIMAL run of consecutive cycle matches.

    Mechanism: compile one cycle with :func:`match_pattern` (each unit
    match carries ``anchor_iseq``, its first island's sequence number),
    then group CONSECUTIVE units with the islands trick one level up —
    two chainable units sit exactly ``k`` islands apart (the next
    cycle's first island starts on the previous cycle's last row), so
    ``anchor_iseq − k·row_number()`` is constant along a run and jumps
    at every break. Runs never overlap, even on boundary rows: the
    island after a maximal run's end cannot start a unit (the run would
    have continued), so every AFTER MATCH skip mode yields this same
    relation.

    Output per run: ``partition``, ``anchor_<order>``/``anchor_val``
    (first cycle's anchor), ``n_cycles``, ``end``/``end_val`` (last
    cycle's final row), and per step ``<name>_total_len`` (transitions
    summed across cycles) and ``<name>_last_end``/``<name>_last_val``
    (the step's final row in the LAST cycle — SQL:2016 LAST semantics).

    Constraint (validated): the cycle's class sequence must be
    UNBORDERED — no proper prefix of the classes equals a suffix
    (e.g. ``(DOWN, UP, DOWN, UP)`` has border length 2). A border lets
    two unit matches overlap at an offset smaller than ``k``, which
    would make "maximal consecutive run" ill-defined; every bordered
    cycle is a repetition of its shorter primitive cycle anyway, so the
    error tells the caller to write that instead. (The border check
    subsumes first-class == last-class, the length-1 border.)

    Scale shape: everything after :func:`classify_islands` operates on
    islands and unit matches (≪ rows); the run grouping is one window +
    groupBy on the partition key already in hand."""
    if not cycle_steps:
        raise ValueError("cycle needs at least one step")
    classes = [s.dir for s in cycle_steps]
    k0 = len(classes)
    for d in range(1, k0):
        if classes[:k0 - d] == classes[d:]:
            raise ValueError(
                f"cycle class sequence {classes} has a border at offset "
                f"{d} — unit matches could overlap and the maximal run "
                "would be ill-defined; rewrite with the primitive "
                "(unbordered) cycle"
            )
    if min_cycles < 1:
        raise ValueError("min_cycles must be >= 1")
    k = len(cycle_steps)
    units = match_pattern(
        df, partition_col, order_col, value_col, cycle_steps, classifier,
        islands=islands,
    )
    wu = Window.partitionBy(partition_col).orderBy("anchor_iseq")
    runs = units.withColumn(
        "_grp", F.col("anchor_iseq") - k * F.row_number().over(wu)
    )
    last = cycle_steps[-1].name
    aggs = [
        F.min(f"anchor_{order_col}").alias(f"anchor_{order_col}"),
        F.min_by("anchor_val", "anchor_iseq").alias("anchor_val"),
        F.count(F.lit(1)).cast("bigint").alias("n_cycles"),
        F.max(f"{last}_end").alias("end"),
        F.max_by(f"{last}_val", "anchor_iseq").alias("end_val"),
    ]
    for s in cycle_steps:
        aggs += [
            F.sum(f"{s.name}_len").cast("bigint").alias(f"{s.name}_total_len"),
            F.max_by(f"{s.name}_end", "anchor_iseq").alias(f"{s.name}_last_end"),
            F.max_by(f"{s.name}_val", "anchor_iseq").alias(f"{s.name}_last_val"),
        ]
    out = runs.groupBy(partition_col, "_grp").agg(*aggs).drop("_grp")
    out = out.filter(F.col("n_cycles") >= min_cycles)
    if max_cycles is not None:
        out = out.filter(F.col("n_cycles") <= max_cycles)
    return out


def expand_all_rows_cycles(
    df: DataFrame,
    matches: DataFrame,
    partition_col: str,
    order_col: str,
    value_col: str,
    cycle_steps: list[Step],
    classifier=None,
    bin_width: int = 32,
    prefix_steps: tuple = (),
    suffix_steps: tuple = (),
) -> DataFrame:
    """``ALL ROWS PER MATCH`` over a repeated group (r13 — closes the
    named limit for the tail form): one output row per input row per
    maximal cycle run, with

    * ``match_no`` — MATCH_NUMBER(): 1-based rank of the run by anchor
      within its partition,
    * every match-level column of the :func:`match_cycles` frame (the
      FINAL-semantics measures: per-step totals and last-cycle rows),
    * ``classifier`` — ``'STRT'`` on the anchor row, else the cycle
      step whose TRANSITION CLASS the row carries. A run's body is
      n_cycles repetitions of the class sequence, so the row's own
      class names its step — which requires the cycle's classes to be
      pairwise DISTINCT (validated; an unbordered cycle may still
      repeat a class, e.g. (1,2,1,3), and there the row→step map is
      ambiguous — out of class).

    Mechanism: the same binned span join as :func:`expand_all_rows`,
    with the row-side frame carrying its transition class (one lag
    window — the classify stage's first half, no island grouping
    needed).

    MID-pattern form (``prefix_steps`` / ``suffix_steps`` non-empty,
    over a :func:`match_cycles_mid` frame): the plain regions classify
    by their per-step ``_end`` boundaries exactly like
    :func:`expand_all_rows`, the run region by transition class, in
    CASE order prefix → run → suffix — so a plain step may legally
    share a class with a cycle step (the region bound disambiguates,
    only the RUN region resolves by class)."""
    dirs = {s.dir: s.name for s in cycle_steps}
    if len(dirs) != len(cycle_steps):
        raise ValueError(
            "ALL ROWS over a repeated group needs pairwise-distinct "
            "step classes — a repeated class makes the row→step map "
            "ambiguous — out of class"
        )
    anchor = f"anchor_{order_col}"
    last_end = f"{suffix_steps[-1].name}_end" if suffix_steps else "end"
    wm = Window.partitionBy(partition_col).orderBy(anchor)
    m = matches.withColumn("match_no", F.row_number().over(wm).cast("bigint"))
    spans = m.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(anchor) / bin_width),
                F.floor(F.col(last_end) / bin_width),
            )
        ),
    ).withColumnRenamed(partition_col, "__p")
    row_cols = [c for c in df.columns if c != partition_col]
    rows = (
        df.select(
            F.col(partition_col).alias("__p"),
            F.col(order_col).alias("__o"),
            *[F.col(c) for c in row_cols],
        )
        .withColumn("__bin", F.floor(F.col("__o") / bin_width))
        .withColumn(
            "__pv",
            F.lag(value_col).over(
                Window.partitionBy("__p").orderBy("__o")
            ),
        )
    )
    if classifier is None:
        cls_code = (
            F.when(F.col(value_col) < F.col("__pv"), F.lit(DOWN))
            .when(F.col(value_col) > F.col("__pv"), F.lit(UP))
            .otherwise(F.lit(FLAT))
        )
    else:
        cls_code = classifier(F.col(value_col), F.col("__pv"))
    rows = rows.withColumn("__cls", cls_code).drop("__pv")
    joined = spans.join(rows, ["__p", "__bin"]).filter(
        (F.col("__o") >= F.col(anchor)) & (F.col("__o") <= F.col(last_end))
    )
    # 'STRT' on the anchor row; prefix region by step-end bounds; the
    # run region by the row's transition class (classes validated
    # distinct above); suffix region by step-end bounds
    name_case = F.when(F.col("__o") == F.col(anchor), F.lit("STRT"))
    for s in prefix_steps:
        name_case = name_case.when(
            F.col("__o") <= F.col(f"{s.name}_end"), F.lit(s.name)
        )
    for d, name in dirs.items():
        name_case = name_case.when(
            (F.col("__o") <= F.col("end")) & (F.col("__cls") == d), F.lit(name)
        )
    for s in suffix_steps:
        name_case = name_case.when(
            F.col("__o") <= F.col(f"{s.name}_end"), F.lit(s.name)
        )
    match_cols = [c for c in m.columns if c != partition_col]
    return joined.select(
        F.col("__p").alias(partition_col),
        *[F.col(c) for c in match_cols if c != "match_no"],
        F.col("match_no"),
        *[F.col(c) for c in row_cols],
        name_case.alias("classifier"),
    )


def match_cycles_mid(
    df: DataFrame,
    partition_col: str,
    order_col: str,
    value_col: str,
    prefix_steps: list[Step],
    cycle_steps: list[Step],
    suffix_steps: list[Step],
    min_cycles: int = 1,
    max_cycles: int | None = None,
    classifier=None,
) -> DataFrame:
    """Unbounded repeated group MID-pattern (r13 — closes the
    ``{m,}``-mid-pattern named limit): ``PATTERN (STRT P1+ … (X+ Y+
    …){m,} S1+ …)`` — plain steps, then a maximal run of ≥ m cycles,
    then plain steps. Pure composition over ONE shared islands frame:

    * the prefix chain compiles with :func:`match_pattern`,
    * cycle runs with :func:`match_cycles` (maximal consecutive units
      via the islands trick one level up),
    * the suffix chain with :func:`match_pattern`,

    joined on row-adjacency — the run anchors ON the prefix's last row
    (``run.anchor == prefix_last_end``) and the suffix anchors ON the
    run's final row (``suffix.anchor == run.end``) — two equi joins on
    (partition, order) over match-sized frames.

    Validated constraints (each a ValueError naming the limit):

    * the cycle's class sequence is UNBORDERED (match_cycles' rule);
    * junction classes differ — prefix-last vs cycle-first and
      cycle-last vs suffix-first are ordinary same-class adjacencies
      (checked by the caller's linear pass) — AND the suffix's first
      class must differ from the cycle's FIRST class: if they matched,
      SQL:2016 backtracking would release the run's last cycle(s) to
      the suffix, which the maximal-run construction cannot see.

    Output: ``partition``, the full-match anchor (the prefix's — or
    the run's when the prefix is empty), per prefix/suffix step
    ``_end``/``_val``/``_len``, and the run columns ``n_cycles``,
    ``end``/``end_val``, per cycle step ``_total_len`` /
    ``_last_end`` / ``_last_val``. Matches may share boundary rows
    with neighbors exactly like plain chains, so the usual greedy
    skip selections apply downstream."""
    if not cycle_steps:
        raise ValueError("cycle needs at least one step")
    if not prefix_steps and not suffix_steps:
        raise ValueError(
            "match_cycles_mid needs a prefix or suffix — use "
            "match_cycles for the bare repeated tail"
        )
    if suffix_steps and suffix_steps[0].dir == cycle_steps[0].dir:
        raise ValueError(
            "the suffix's first class equals the repeated group's first "
            "class — backtracking would release trailing cycles to the "
            "suffix, which maximal-run compilation cannot express — out "
            "of class"
        )
    isl = classify_islands(
        df, partition_col, order_col, value_col, classifier
    ).localCheckpoint(eager=True)
    runs = match_cycles(
        df, partition_col, order_col, value_col, cycle_steps,
        min_cycles=min_cycles, max_cycles=max_cycles,
        classifier=classifier, islands=isl,
    )
    anchor = f"anchor_{order_col}"
    out = runs
    if prefix_steps:
        pre = match_pattern(
            df, partition_col, order_col, value_col, prefix_steps,
            classifier, islands=isl,
        )
        run_side = runs.select(
            F.col(partition_col).alias("__rp"),
            F.col(anchor).alias("__run_anchor"),
            F.col("anchor_val").alias("__run_anchor_val"),
            *[
                F.col(c)
                for c in runs.columns
                if c not in (partition_col, anchor, "anchor_val", "anchor_iseq")
            ],
        )
        out = pre.join(
            run_side,
            (F.col(partition_col) == F.col("__rp"))
            & (F.col("__run_anchor") == F.col(f"{prefix_steps[-1].name}_end")),
        ).drop("__rp", "__run_anchor", "__run_anchor_val")
    if suffix_steps:
        suf = match_pattern(
            df, partition_col, order_col, value_col, suffix_steps,
            classifier, islands=isl,
        )
        suf_side = suf.select(
            F.col(partition_col).alias("__sp"),
            F.col(anchor).alias("__suf_anchor"),
            *[
                F.col(c)
                for c in suf.columns
                if c not in (partition_col, anchor, "anchor_val", "anchor_iseq")
            ],
        )
        out = out.join(
            suf_side,
            (F.col(partition_col) == F.col("__sp"))
            & (F.col("__suf_anchor") == F.col("end")),
        ).drop("__sp", "__suf_anchor")
    return out


def match_cycles_skip_next(
    df: DataFrame,
    partition_col: str,
    order_col: str,
    value_col: str,
    cycle_steps: list[Step],
    min_cycles: int = 1,
    max_cycles: int | None = None,
    classifier=None,
    bin_width: int = 32,
) -> DataFrame:
    """``AFTER MATCH SKIP TO NEXT ROW`` over a repeated group —
    ``PATTERN (STRT (X+ Y+ …)<q>)`` under the rescan mode (this
    session — the last skip-mode composition): one row per successful
    anchor, where an anchor is (a) any CYCLE BOUNDARY inside a maximal
    run with enough remaining cycles, or (b) any suffix offset into a
    boundary unit's FIRST island with the remaining X-suffix in bounds.
    Anchors anywhere else provably fail: a mid-cycle island whose class
    equals X's would need the following islands to realize a proper
    rotation of the cycle's class sequence, and an unbordered (i.e.
    primitive) cycle has no self-equal proper rotation — so the
    unit/run construction enumerates the complete rescan candidate
    set, and (as for every TO NEXT ROW form) NO greedy selection runs.

    BOUNDED first steps (``X{m,n}``) are served too (this session,
    second pass): a unit whose first island exceeds ``n`` anchors no
    boundary match — per the bounds-the-run doctrine the forward run
    from the boundary is too long — but its in-bound SUFFIXES do
    anchor, continuing into the strict run that starts exactly one
    cycle later; that run is necessarily a RUN HEAD (no strict unit
    exists at the overlong position), so one left join of the overlong
    units onto the per-unit aggregates closes the case. Mid-run cycles
    always need their full first island inside the bounds, exactly as
    :func:`match_cycles` compiles them.

    Output: the :func:`match_cycles` schema plus ``n_cycles`` — per
    anchor: the anchor row, remaining cycle count, run end fields, and
    per step the SUFFIX totals (``<name>_total_len`` counts cycles
    from the anchor onward; the anchored unit's first-step total drops
    the skipped offset) and the run-final ``_last_end`` / ``_last_val``.

    Scale shape: everything beyond :func:`classify_islands` operates on
    units (≪ rows); suffix aggregates are one window over (partition,
    run) with a current-row→end frame; the suffix expansion is the
    same binned span join as :func:`match_skip_next`."""
    if not cycle_steps:
        raise ValueError("cycle needs at least one step")
    s1 = cycle_steps[0]
    classes = [s.dir for s in cycle_steps]
    k = len(classes)
    for d in range(1, k):
        if classes[: k - d] == classes[d:]:
            raise ValueError(
                f"cycle class sequence {classes} has a border at offset "
                f"{d} — unit matches could overlap and the maximal run "
                "would be ill-defined; rewrite with the primitive "
                "(unbordered) cycle"
            )
    if min_cycles < 1:
        raise ValueError("min_cycles must be >= 1")
    # units compiled with the FIRST step lower-bound-only: a unit whose
    # first island exceeds max_len anchors no boundary match — but its
    # in-bound SUFFIXES do, continuing into the strict run (if any)
    # that starts exactly one cycle later (the overlong arm below)
    relaxed = [Step(s1.name, s1.dir, s1.min_len, None)] + list(
        cycle_steps[1:]
    )
    units = match_pattern(
        df, partition_col, order_col, value_col, relaxed, classifier
    )
    if s1.max_len is not None:
        units = units.localCheckpoint(eager=True)  # strict + overlong arms
        strict = units.filter(F.col(f"{s1.name}_len") <= s1.max_len)
    else:
        strict = units
    anchor = f"anchor_{order_col}"
    wu = Window.partitionBy(partition_col).orderBy("anchor_iseq")
    runs = strict.withColumn(
        "_grp", F.col("anchor_iseq") - k * F.row_number().over(wu)
    )
    wrun = (
        Window.partitionBy(partition_col, "_grp")
        .orderBy("anchor_iseq")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    last = cycle_steps[-1].name
    cols = [
        F.col(partition_col),
        F.col(anchor),
        F.col("anchor_val"),
        F.col("anchor_iseq"),
        F.col(f"{s1.name}_end").alias("__first_end"),
        F.col(f"{s1.name}_len").alias("__first_len"),
        F.count(F.lit(1)).over(wrun).cast("bigint").alias("n_cycles"),
        F.max(f"{last}_end").over(wrun).alias("end"),
        F.last(f"{last}_val").over(wrun).alias("end_val"),
    ]
    for s in cycle_steps:
        cols += [
            F.sum(f"{s.name}_len").over(wrun).cast("bigint").alias(
                f"{s.name}_total_len"
            ),
            F.last(f"{s.name}_end").over(wrun).alias(f"{s.name}_last_end"),
            F.last(f"{s.name}_val").over(wrun).alias(f"{s.name}_last_val"),
        ]
    per_unit = runs.select(*cols)
    enriched = per_unit
    if s1.max_len is not None:
        # overlong arm: a unit whose first island exceeds max_len can
        # only anchor via suffixes; its continuation is the strict run
        # starting exactly k islands later — necessarily a RUN HEAD,
        # since no strict unit exists at the overlong position itself.
        per_unit = per_unit.localCheckpoint(eager=True)  # heads + arm 1
        enriched = per_unit
        head_cols = [
            F.col(partition_col).alias("__hp"),
            F.col("anchor_iseq").alias("__hseq"),
            F.col("n_cycles").alias("__h_n"),
            F.col("end").alias("__h_end"),
            F.col("end_val").alias("__h_end_val"),
        ]
        for s in cycle_steps:
            head_cols += [
                F.col(f"{s.name}_total_len").alias(f"__h_{s.name}_tot"),
                F.col(f"{s.name}_last_end").alias(f"__h_{s.name}_le"),
                F.col(f"{s.name}_last_val").alias(f"__h_{s.name}_lv"),
            ]
        heads = per_unit.select(*head_cols)
        over = units.filter(F.col(f"{s1.name}_len") > s1.max_len)
        over = over.join(
            heads,
            (F.col(partition_col) == F.col("__hp"))
            & (F.col("anchor_iseq") + k == F.col("__hseq")),
            "left",
        )
        ocols = [
            F.col(partition_col),
            F.col(anchor),
            F.col("anchor_val"),
            F.col("anchor_iseq"),
            F.col(f"{s1.name}_end").alias("__first_end"),
            F.col(f"{s1.name}_len").alias("__first_len"),
            (F.lit(1) + F.coalesce(F.col("__h_n"), F.lit(0)))
            .cast("bigint")
            .alias("n_cycles"),
            F.coalesce(F.col("__h_end"), F.col(f"{last}_end")).alias("end"),
            F.coalesce(F.col("__h_end_val"), F.col(f"{last}_val")).alias(
                "end_val"
            ),
        ]
        for s in cycle_steps:
            ocols += [
                (
                    F.col(f"{s.name}_len")
                    + F.coalesce(F.col(f"__h_{s.name}_tot"), F.lit(0))
                )
                .cast("bigint")
                .alias(f"{s.name}_total_len"),
                F.coalesce(
                    F.col(f"__h_{s.name}_le"), F.col(f"{s.name}_end")
                ).alias(f"{s.name}_last_end"),
                F.coalesce(
                    F.col(f"__h_{s.name}_lv"), F.col(f"{s.name}_val")
                ).alias(f"{s.name}_last_val"),
            ]
        enriched = per_unit.unionByName(over.select(*ocols))
    enriched = enriched.filter(F.col("n_cycles") >= min_cycles)
    if max_cycles is not None:
        enriched = enriched.filter(F.col("n_cycles") <= max_cycles)
    # suffix-anchor expansion over the anchored unit's FIRST island —
    # offset 0 is the boundary anchor itself
    spans = enriched.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(anchor) / bin_width),
                F.floor(F.col("__first_end") / bin_width),
            )
        ),
    ).withColumnRenamed(partition_col, "__p")
    rows = df.select(
        F.col(partition_col).alias("__p"),
        F.col(order_col).alias("__o"),
        F.col(value_col).alias("__v"),
    ).withColumn("__bin", F.floor(F.col("__o") / bin_width))
    joined = spans.join(rows, ["__p", "__bin"]).filter(
        (F.col("__o") >= F.col(anchor)) & (F.col("__o") < F.col("__first_end"))
    )
    wo = Window.partitionBy("__p", anchor).orderBy("__o")
    joined = joined.withColumn(
        "__off", F.row_number().over(wo).cast("bigint") - 1
    )
    joined = joined.filter(
        F.col("__first_len") - F.col("__off") >= s1.min_len
    )
    if s1.max_len is not None:
        joined = joined.filter(
            F.col("__first_len") - F.col("__off") <= s1.max_len
        )
    keep = [
        F.col("__p").alias(partition_col),
        F.col("__o").alias(anchor),
        F.col("__v").alias("anchor_val"),
        F.col("n_cycles"),
        F.col("end"),
        F.col("end_val"),
    ]
    for s in cycle_steps:
        total = F.col(f"{s.name}_total_len")
        if s.name == s1.name:
            total = total - F.col("__off")
        keep += [
            total.alias(f"{s.name}_total_len"),
            F.col(f"{s.name}_last_end"),
            F.col(f"{s.name}_last_val"),
        ]
    return joined.select(*keep)


def match_any(
    df: DataFrame,
    partition_col: str,
    order_col: str,
    value_col: str,
    patterns: dict[str, list[Step]],
    classifier=None,
) -> DataFrame:
    """Top-level pattern ALTERNATION — ``PATTERN ((P1) | (P2) | …)``
    reported per branch: each named pattern matches independently and
    the outputs union with a ``pattern`` label column. Branches may
    have different lengths, so the per-step measure columns are
    normalized positionally to ``step<i>_end`` / ``step<i>_val`` /
    ``step<i>_len`` (NULL-padded to the longest branch) — the anchor
    columns stay shared. This is the alternation subset that stays
    relational: the islands frame is built HERE, once, and passed to
    every branch's chain build (VERDICT r10 nit #1 — previously each
    branch re-ran the classify/window shuffle), so an N-branch
    alternation costs one classification plus N small island joins."""
    if not patterns:
        raise ValueError("alternation needs at least one pattern")
    width = max(len(steps) for steps in patterns.values())
    ord_t = df.schema[order_col].dataType
    val_t = df.schema[value_col].dataType
    isl = classify_islands(
        df, partition_col, order_col, value_col, classifier
    ).localCheckpoint(eager=True)  # shared by every branch; see match_pattern
    parts = []
    for label, steps in patterns.items():
        m = match_pattern(
            df, partition_col, order_col, value_col, steps, islands=isl
        )
        cols = [
            F.lit(label).alias("pattern"),
            F.col(partition_col),
            F.col(f"anchor_{order_col}"),
            F.col("anchor_val"),
        ]
        for i in range(width):
            if i < len(steps):
                s = steps[i].name
                cols += [
                    F.col(f"{s}_end").alias(f"step{i}_end"),
                    F.col(f"{s}_val").alias(f"step{i}_val"),
                    F.col(f"{s}_len").alias(f"step{i}_len"),
                ]
            else:
                cols += [
                    F.lit(None).cast(ord_t).alias(f"step{i}_end"),
                    F.lit(None).cast(val_t).alias(f"step{i}_val"),
                    F.lit(None).cast("bigint").alias(f"step{i}_len"),
                ]
        parts.append(m.select(*cols))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
