"""SQL surface for row-pattern matching (VERDICT r10 #2).

Trino's MATCH_RECOGNIZE is a SQL clause, not a library call — the
reference serves it as plain Trino SQL (Trino 468 via
/root/reference/tf/main.tf:82-114; walden ships no engine code). Spark
has no MATCH_RECOGNIZE grammar at all, so ``WaldenSession.sql`` routes
the clause here: the ``FROM <table> MATCH_RECOGNIZE (...)`` fragment is
parsed, compiled through :mod:`walden_spark.operators.pattern` (the
same classify → islands → adjacency-chain pipeline the Python API
uses), registered as a temp view, and spliced back into the statement
— so the surrounding SELECT list, WHERE, ORDER BY, CTEs, and joins all
remain ordinary Spark SQL and go through Catalyst untouched.

Supported class (exactly what the compiler serves; everything else
raises :class:`MatchRecognizeError` naming the limit — the documented
out-of-class surface lives in DEVIATIONS.md):

* ``PARTITION BY <col>`` and ``ORDER BY <col>`` — single columns.
* ``MEASURES`` (ONE ROW PER MATCH): ``STRT.<col>`` (the anchor row),
  ``LAST(X.<col>)`` (a step's final row), ``COUNT(X.*)`` (a step's
  run length), with X a pattern variable or a SUBSET union variable;
  each ``AS`` an alias; ``<col>`` is the ORDER BY or the DEFINE value
  column. Arithmetic over measures belongs in the outer SELECT (the
  clause compiles to a relation, so any Spark SQL expression works
  there).
* ``ONE ROW PER MATCH`` (the default) or ``ALL ROWS PER MATCH``:
  all-rows mode emits every covered input row per match via
  :func:`walden_spark.operators.pattern.expand_all_rows`; measures
  there are CLASSIFIER() / MATCH_NUMBER() / STRT.<col>, plus per-step
  ``FINAL LAST/COUNT`` (match constants) and bare ``LAST``/``COUNT``
  with the standard's RUNNING semantics (per-row prefix aggregates).
* ``AFTER MATCH``: ``SKIP PAST LAST ROW`` (the SQL-standard default,
  also what an omitted clause means — the greedy non-overlap walk,
  :func:`walden_spark.operators.pattern.select_skip_past`), ``SKIP TO
  LAST <any step>`` (inclusive walk resuming at that step's final row,
  :func:`walden_spark.operators.pattern.select_skip_to`), ``SKIP TO
  FIRST <non-first step>`` (≡ TO LAST of the previous step), or —
  since this session — ``SKIP TO NEXT ROW``: the full rescan match set
  via suffix-anchor expansion
  (:func:`walden_spark.operators.pattern.match_skip_next`; every
  successful anchor is a match, no greedy selection — Trino-exact for
  this mode, single-branch patterns).
* ``PATTERN``: ``(STRT X1<q> X2<q> …)`` with quantifiers ``+`` /
  ``{m}`` / ``{m,}`` / ``{m,n}`` (greedy maximal-run; a bare name means
  exactly one) and reluctant spellings — on NON-final steps provably ≡
  greedy in this class; on the FINAL step (since this session) the
  match truncates to the lower bound
  (:func:`walden_spark.operators.pattern.match_reluctant_final`;
  requires the final step's class to differ from the first step's, and
  composes with every skip mode except TO NEXT ROW); top-level
  alternation ``((STRT …) | (STRT …))`` with leftmost preference;
  ``(STRT PERMUTE(e1, …, ek))`` for k ≤ 4 (alternation of all
  orderings); and the repeated group tail ``(STRT (X+ Y+ …)<q>)``
  (maximal consecutive-cycle runs,
  :func:`walden_spark.operators.pattern.match_cycles`). Zero-width
  quantifiers, anchors, and mid-pattern/nested groups are out of
  class.
* ``SUBSET U = (A, B, …)`` — union variables, resolved statically
  (single-branch patterns).
* ``DEFINE``: either ALL items ``Xj AS Xj.<v> <op> PREV(Xj.<v>)`` with
  ``<op>`` of ``<``/``>``/``=`` (the direction classes DOWN/UP/FLAT),
  or ALL items ``Xj AS Xj.<v> <op> <number>`` with ``<op>`` of
  ``<``/``<=``/``>``/``>=``/``=`` whose intervals are pairwise DISJOINT
  (threshold classes — spikes/outages/bands; validated, since classes
  must partition the rows) — over one shared value column either way.
  Every step must be DEFINEd (an undefined variable matches any row —
  out of class); STRT must stay undefined (it is the anchor). DEFINEs
  over full-match aggregates are served by
  :func:`walden_spark.operators.pattern.span_measures`, not this
  clause.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from walden_spark.operators.pattern import (
    DOWN,
    FLAT,
    UP,
    Step,
    classify_islands,
    expand_all_rows,
    expand_all_rows_cycles,
    match_any,
    match_cycles,
    match_cycles_skip_next,
    match_pattern,
    match_cycles_mid,
    match_reluctant_final,
    match_skip_next,
    match_split_pair,
    select_skip_past,
    select_skip_to,
)

_LIMITS = (
    " — supported class: PARTITION BY <col> ORDER BY <col>; MEASURES "
    "STRT.<col> / LAST(X.<col>) / COUNT(X.*) (one-row; X may be a SUBSET "
    "union) or CLASSIFIER() / MATCH_NUMBER() / STRT.<col> / FINAL or "
    "RUNNING LAST/COUNT (all-rows); ONE ROW or ALL ROWS PER MATCH; AFTER "
    "MATCH SKIP PAST LAST ROW (default) / SKIP TO NEXT ROW / SKIP TO LAST "
    "<step> / SKIP TO FIRST <non-first step>; PATTERN (STRT X1+ X2{m,n} …) "
    "with reluctant spellings (a reluctant FINAL step truncates to its "
    "lower bound; its class must differ from the first step's), "
    "((STRT …) | (STRT …)) alternation, "
    "PERMUTE(≤4), the repeated tail (STRT (X+ Y+ …)<q>), the "
    "mid-pattern unbounded group (STRT P+ (X+ Y+){m,} S+), and "
    "adjacent same-class RUNS of any length in plain or alternation/"
    "PERMUTE-branch patterns (lexicographic greedy closed-form split, "
    "one-row or all-rows, boundary or mid-island skips, rescan); SUBSET "
    "U = (A, B); DEFINE X AS X.<v> <|>|= PREV(X.<v>); see DEVIATIONS.md "
    "(row-pattern class) for the documented out-of-class surface"
)


class MatchRecognizeError(ValueError):
    """An out-of-class MATCH_RECOGNIZE clause; the message names both
    the offending construct and the supported class."""

    def __init__(self, msg: str):
        super().__init__(msg + _LIMITS)


_MR_FROM = re.compile(
    r"\bFROM\s+([A-Za-z_][\w.]*)\s+MATCH_RECOGNIZE\s*\(", re.IGNORECASE
)
_ALIAS = re.compile(r"^\s*(?:AS\s+)?([A-Za-z_]\w*)", re.IGNORECASE)
# clause heads inside the body, in Trino's fixed order
_CLAUSES = re.compile(
    r"\bPARTITION\s+BY\b|\bORDER\s+BY\b|\bMEASURES\b|\bONE\s+ROW\s+PER\s+MATCH\b"
    r"|\bALL\s+ROWS\s+PER\s+MATCH\b|\bAFTER\s+MATCH\b|\bPATTERN\b|\bSUBSET\b"
    r"|\bDEFINE\b",
    re.IGNORECASE,
)
_STEP_TOKEN = re.compile(
    r"([A-Za-z_]\w*)\s*(\+\??|\{\s*(\d+)\s*(,\s*(\d*))?\s*\}\??)?\s*"
)
_DEFINE_ITEM = re.compile(
    r"^([A-Za-z_]\w*)\s+AS\s+\1\s*\.\s*([A-Za-z_]\w*)\s*(<=|>=|<>|!=|<|>|=)\s*"
    r"PREV\s*\(\s*\1\s*\.\s*([A-Za-z_]\w*)\s*\)$",
    re.IGNORECASE,
)
_DEFINE_CONST = re.compile(
    r"^([A-Za-z_]\w*)\s+AS\s+\1\s*\.\s*([A-Za-z_]\w*)\s*(<=|>=|<|>|=)\s*"
    r"(-?\d+(?:\.\d+)?)$",
    re.IGNORECASE,
)


def _const_interval(op: str, k: float):
    """(lo, lo_closed, hi, hi_closed) with None = unbounded."""
    return {
        "<": (None, False, k, False),
        "<=": (None, False, k, True),
        ">": (k, False, None, False),
        ">=": (k, True, None, False),
        "=": (k, True, k, True),
    }[op]


def _strictly_before(x, y) -> bool:
    """Interval x ends before y begins (no shared point)."""
    xhi, xhic = x[2], x[3]
    ylo, yloc = y[0], y[1]
    if xhi is None or ylo is None:
        return False
    if xhi < ylo:
        return True
    return xhi == ylo and not (xhic and yloc)


def _intervals_overlap(a, b) -> bool:
    return not (_strictly_before(a, b) or _strictly_before(b, a))


_MEASURE_ANCHOR = re.compile(r"^STRT\s*\.\s*([A-Za-z_]\w*)$", re.IGNORECASE)
_MEASURE_LAST = re.compile(
    r"^LAST\s*\(\s*([A-Za-z_]\w*)\s*\.\s*([A-Za-z_]\w*)\s*\)$", re.IGNORECASE
)
_MEASURE_COUNT = re.compile(
    r"^COUNT\s*\(\s*([A-Za-z_]\w*)\s*\.\s*\*\s*\)$", re.IGNORECASE
)

_DIR_BY_OP = {"<": DOWN, ">": UP, "=": FLAT}
_VIEW_SEQ = [0]


def _balanced_span(text: str, open_idx: int) -> int:
    """Index just past the ')' matching the '(' at ``open_idx``."""
    depth = 0
    for i in range(open_idx, len(text)):
        if text[i] == "(":
            depth += 1
        elif text[i] == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    raise MatchRecognizeError("unbalanced parentheses in MATCH_RECOGNIZE")


def _split_clauses(body: str) -> list[tuple[str, str]]:
    """(clause-head, clause-text) pairs — heads only at paren depth 0,
    so a column named ``pattern`` inside MEASURES can't split a clause."""
    heads = []
    depth = 0
    i = 0
    while i < len(body):
        ch = body[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if depth == 0:
            m = _CLAUSES.match(body, i)
            if m:
                heads.append((m.group(0).upper(), m.start(), m.end()))
                i = m.end()
                continue
        i += 1
    out = []
    for j, (head, _, body_start) in enumerate(heads):
        body_end = heads[j + 1][1] if j + 1 < len(heads) else len(body)
        out.append((re.sub(r"\s+", " ", head), body[body_start:body_end].strip()))
    return out


def _split_top_commas(text: str) -> list[str]:
    parts, depth, cur = [], 0, []
    for ch in text:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


def _split_quantified(text: str) -> list[str]:
    """Split PERMUTE's element list on commas outside braces/parens —
    ``d+, u{2,3}`` must not split inside the bound."""
    parts, depth, cur = [], 0, []
    for ch in text:
        if ch in "({":
            depth += 1
        elif ch in ")}":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


def _split_top_pipes(text: str) -> list[str]:
    parts, depth, cur = [], 0, []
    for ch in text:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "|" and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur).strip())
    return parts


def _parse_pattern(text: str) -> list[list[tuple[str, int, int | None]]]:
    """``(STRT X1<q> …)`` → one branch; ``((STRT …) | (STRT …) …)`` →
    one branch per top-level alternative (r11 — each tried in order,
    leftmost preferred, per SQL:2016 alternation preference). Each
    branch is [(name, min_len, max_len), …] with the STRT anchor
    stripped. Rejects everything outside the compiled class."""
    text = text.strip()
    if not (text.startswith("(") and text.endswith(")")):
        raise MatchRecognizeError("PATTERN must be parenthesized")
    inner = text[1:-1].strip()
    alts = _split_top_pipes(inner)
    if len(alts) > 1:
        branches = []
        for alt in alts:
            if not (alt.startswith("(") and alt.endswith(")")):
                raise MatchRecognizeError(
                    "each alternation branch must be parenthesized — "
                    "PATTERN ((STRT …) | (STRT …))"
                )
            branches.append(_parse_steps(alt[1:-1].strip()))
        return branches
    if re.search(r"\bPERMUTE\s*\(", inner, re.IGNORECASE):
        variants = _expand_permutes(inner)
        if inner.strip().upper().startswith("PERMUTE"):
            raise MatchRecognizeError(
                "PATTERN must begin with the bare STRT anchor"
            )
        return [_parse_steps(v) for v in variants]
    return [_parse_steps(inner)]


def _expand_permutes(inner: str) -> list[str]:
    """PERMUTE(e1, e2, …) ≡ the alternation of every ordering, tried
    lexicographically by listed position (SQL:2016 / Trino preference)
    — expanded into match_any branches. PERMUTE may sit ANYWHERE in
    the pattern (the surrounding prefix/suffix steps are shared
    verbatim across every expanded branch), and — since this session —
    a pattern may hold SEVERAL PERMUTE groups: each expands
    independently and the branch set is their cartesian product,
    ordered first-group-first (the rescan tries orderings left to
    right). The total expansion is capped at 24 branches (= one
    PERMUTE(4)); anything larger is out of class."""
    from itertools import permutations

    pm = re.search(r"\bPERMUTE\s*\(", inner, re.IGNORECASE)
    if not pm:
        return [inner]
    end = _balanced_span(inner, pm.end() - 1)
    prefix = inner[: pm.start()].strip()
    suffix = inner[end:].strip()
    if suffix[:1] in ("{", "+", "*", "?"):
        raise MatchRecognizeError(
            "a quantifier on the PERMUTE group itself is out of class "
            "(quantify the elements inside it)"
        )
    elems = _split_quantified(inner[pm.end(): end - 1])
    if len(elems) < 2:
        raise MatchRecognizeError("PERMUTE needs at least two elements")
    if len(elems) > 4:
        raise MatchRecognizeError(
            f"PERMUTE over {len(elems)} elements expands to "
            f"{len(elems)}! > 24 alternation branches — out of class"
        )
    tails = _expand_permutes(suffix)  # later PERMUTE groups, recursively
    out = []
    for perm in permutations(elems):
        for tail in tails:
            out.append(" ".join(filter(None, [prefix, *perm, tail])))
            if len(out) > 24:
                raise MatchRecognizeError(
                    "combined PERMUTE expansion exceeds 24 alternation "
                    "branches — out of class"
                )
    return out


def _parse_tokens(inner: str) -> list[tuple[str, int, int | None, bool]]:
    """Quantified step tokens ``X<q> Y<q> …`` →
    [(name, min, max, reluctant), …] — shared by plain patterns (which
    prepend the STRT anchor) and group-cycle bodies (which don't)."""
    for bad, why in (
        ("|", "nested alternation is out of class (top-level "
              "(…) | (…) branches are the supported alternation form)"),
        ("(", "grouped sub-patterns are out of class (the served group "
              "form is the repeated tail PATTERN (STRT (X+ Y+ …)<q>))"),
        ("*", "'*' allows an empty step — islands are maximal non-empty runs"),
        ("^", "partition anchors are out of class"),
        ("$", "partition anchors are out of class"),
    ):
        if bad in inner:
            raise MatchRecognizeError(f"PATTERN fragment {inner!r}: {why}")
    pos = 0
    toks: list[tuple[str, int, int | None]] = []
    while pos < len(inner):
        m = _STEP_TOKEN.match(inner, pos)
        if not m or not m.group(1):
            raise MatchRecognizeError(f"cannot parse PATTERN at {inner[pos:]!r}")
        name, quant, lo, _, hi = m.groups()
        if quant is None and m.end() < len(inner) and inner[m.end()] == "?":
            raise MatchRecognizeError(
                f"step {name}?: optional (zero-width) quantifiers are out of "
                "class — islands are maximal non-empty runs"
            )
        # Reluctant suffix (+? / {m,n}?): within this compiler's class —
        # adjacent steps carry DISTINCT transition classes, and classes
        # PARTITION the transitions — a non-final step's continuation can
        # never match mid-run, so backtracking has no freedom and
        # reluctant ≡ greedy (proved by test_reluctant_equals_greedy).
        # On the FINAL step the equivalence breaks (nothing follows, so
        # reluctance would select a strict prefix of the maximal run) —
        # rejected below once branch position is known.
        reluctant = quant is not None and quant.endswith("?")
        if quant is None:
            toks.append((name, 1, 1, False))
        elif quant.startswith("+"):
            toks.append((name, 1, None, reluctant))
        else:
            lo_i = int(lo)
            if lo_i < 1:
                raise MatchRecognizeError(
                    f"step {name}{{{lo},…}}: zero-width steps are out of class"
                )
            hi_i = None if hi == "" else (int(hi) if hi is not None else lo_i)
            if hi_i is not None and hi_i < lo_i:
                raise MatchRecognizeError(f"step {name}: empty bound {{{lo},{hi}}}")
            toks.append((name, lo_i, hi_i, reluctant))
        pos = m.end()
    return toks


_INLINE_GROUP = re.compile(r"\(\s*([^()]*?)\s*\)\s*\{\s*(\d+)\s*\}")


def _quant_text(lo: int, hi: int | None) -> str:
    if (lo, hi) == (1, 1):
        return ""
    if (lo, hi) == (1, None):
        return "+"
    return f"{{{lo},{'' if hi is None else hi}}}"


def _clone_base(name: str) -> str:
    """User-facing base of a (possibly clone-renamed) variable: strips
    one trailing ``__<digits>`` clone suffix, leaving names that merely
    CONTAIN double underscores untouched."""
    return re.sub(r"__\d+$", "", name)


_GROUP_QUANT = re.compile(r"\{\s*(\d+)\s*(?:,\s*(\d*))?\s*\}")
_VAR_TOKEN = re.compile(r"[A-Za-z_]\w*")


def _find_top_group(inner: str):
    """First TOP-LEVEL quantified group of the pattern text: a
    depth-0 ``( … )`` (body may itself contain nested groups) followed
    by ``{m}`` / ``{m,n}`` / ``{m,}``. Returns
    ``(start, end, body, lo, hi)`` — ``end`` one past the quantifier,
    ``hi`` None for unbounded — or None when no such group exists."""
    depth = 0
    start = None
    for i, ch in enumerate(inner):
        if ch == "(":
            if depth == 0:
                start = i
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                m = _GROUP_QUANT.match(inner, pos=_skip_ws(inner, i + 1))
                if m:
                    lo = int(m.group(1))
                    hi_raw = m.group(2)  # None exact; '' unbounded
                    hi = (
                        lo
                        if hi_raw is None
                        else (None if hi_raw == "" else int(hi_raw))
                    )
                    return start, m.end(), inner[start + 1: i], lo, hi
                start = None
    return None


def _skip_ws(s: str, i: int) -> int:
    while i < len(s) and s[i].isspace():
        i += 1
    return i


def _next_clone(base: str, cm: dict[str, list[str]]) -> str:
    lst = cm.setdefault(base, [base])
    cname = f"{base}__{len(lst) + 1}"
    lst.append(cname)
    return cname


def _clone_body(body: str, cnt: int, cm: dict[str, list[str]]) -> str:
    """Inline ``cnt`` copies of a group body (which may contain nested
    groups). Copy 1 keeps every name; copies ``i ≥ 2`` rename each
    variable token to the next free clone of its BASE — hierarchical
    nesting therefore yields flat clone names (``b__3``, never
    ``b__2__2``), and the clone map stays ``base → [base, clones…]``.
    A ``{1}`` repetition registers nothing (ADVICE r11 #3)."""
    if re.search(r"\+\?|\}\s*\?", body):
        raise MatchRecognizeError(
            "reluctant quantifiers inside an inline group are out of class"
        )
    if not _VAR_TOKEN.search(body):
        raise MatchRecognizeError("empty inline group")
    copies = [body]
    for _ in range(2, cnt + 1):
        if cnt > 1:
            # register every copy-1 base up front so later copies
            # allocate clone indices against it
            for t in _VAR_TOKEN.findall(body):
                cm.setdefault(_clone_base(t.lower()), [_clone_base(t.lower())])
        copies.append(
            _VAR_TOKEN.sub(
                lambda m: _next_clone(_clone_base(m.group(0).lower()), cm),
                body,
            )
        )
    return " ".join(copies)


def _expand_groups(
    inner: str, cm: dict[str, list[str]]
) -> list[tuple[str, dict[str, list[str]]]]:
    """Quantified groups — exact ``{m}``, RANGED ``{m,n}``, and NESTED
    compositions of both (r12) — expand into plain-pattern variant
    texts with per-variant clone maps. Top-level groups expand first,
    left to right; a ranged quantifier forks one variant per exact
    count, MOST repetitions first, so under the alternation compiler's
    leftmost-branch preference the ordering realizes SQL:2016 greedy
    quantifier preference with earlier/outer constructs dominating.
    Unbounded ``{m,}`` mid-pattern stays a named limit (the repeated
    TAIL form serves unbounded cycles); expansion is capped at 24
    variants like PERMUTE. Single-step groups never reach here — the
    quantifier-arithmetic rewrite runs first."""
    g = _find_top_group(inner)
    if g is None:
        return [(inner, cm)]
    start, end, body, lo, hi = g
    if lo < 1:
        raise MatchRecognizeError(
            "group repetition {0,…} allows an empty match — out of class"
        )
    if hi is None:
        raise MatchRecognizeError(
            "inline group with an unbounded {m,} quantifier is out of "
            "class mid-pattern — bound the range, or use the repeated "
            "tail form PATTERN (STRT (X+ Y+ …){m,}) for unbounded cycles"
        )
    if hi < lo:
        raise MatchRecognizeError(f"empty group bound {{{lo},{hi}}}")
    out: list[tuple[str, dict[str, list[str]]]] = []
    for cnt in range(hi, lo - 1, -1):
        cm2 = {k: list(v) for k, v in cm.items()}
        text = inner[:start] + _clone_body(body, cnt, cm2) + inner[end:]
        for variant in _expand_groups(text, cm2):
            out.append(variant)
            if len(out) > 24:
                raise MatchRecognizeError(
                    "group expansion exceeds 24 alternation branches — "
                    "out of class (narrow the {m,n} ranges)"
                )
    return out


_INLINE_GROUP_RANGED = re.compile(
    r"\(\s*([^()]*?)\s*\)\s*\{\s*(\d+)\s*,\s*(\d+)\s*\}"
)
_INLINE_GROUP_UNBOUNDED = re.compile(r"\)\s*\{\s*\d+\s*,\s*\}")

_SINGLE_STEP_GROUP = re.compile(
    r"\(\s*([A-Za-z_]\w*\s*(?:\+\??|\{\s*\d+\s*(?:,\s*\d*)?\s*\}\??)?)\s*\)"
    r"\s*\{\s*(\d+)\s*(?:,\s*(\d*))?\s*\}"
)


def _rewrite_single_step_groups(inner: str) -> str:
    """Quantified groups over a SINGLE step rewrite to quantifier
    arithmetic instead of clone expansion (r12): runs of one class
    merge, so ``(b{p,q}){m,n}`` matches exactly the run lengths
    ``∪_{k=m..n} [k·p, k·q]`` — when that union is one contiguous
    interval the group IS the plain step ``b{m·p, n·q}`` (unbounded
    whenever ``q`` or ``n`` is), which the compiler already serves
    Trino-exactly (a maximal island within bounds ≡ greedy row
    semantics, since leftover same-class transitions can never be
    consumed by the differing next step). ``(b+){2}`` ≡ ``b{2,}``. A
    non-contiguous union — e.g. ``(b{3}){1,2}`` = lengths {3, 6} — has
    no single-step equivalent and raises the named limit; measures and
    skip targets need no clone map (LAST/COUNT read the one step)."""
    while m := _SINGLE_STEP_GROUP.search(inner):
        toks = _parse_tokens(m.group(1))
        (name, p, q, reluctant) = toks[0]
        if reluctant:
            raise MatchRecognizeError(
                "reluctant quantifiers inside an inline group are out of "
                "class"
            )
        gm_lo = int(m.group(2))
        gm_hi = m.group(3)  # None → exact; '' → unbounded; digits → n
        if gm_lo < 1:
            raise MatchRecognizeError(
                "group repetition {0,…} allows an empty match — out of class"
            )
        n = gm_lo if gm_hi is None else (None if gm_hi == "" else int(gm_hi))
        if n is not None and n < gm_lo:
            raise MatchRecognizeError(f"empty group bound {{{gm_lo},{n}}}")
        if q is not None and n is not None:
            # contiguity of ∪_k [k·p, k·q]: each count's interval must
            # touch the next (k·q + 1 ≥ (k+1)·p)
            for k in range(gm_lo, n):
                if k * q + 1 < (k + 1) * p:
                    raise MatchRecognizeError(
                        f"({m.group(1)}){{{gm_lo},{n}}}: the achievable "
                        f"run lengths are non-contiguous (gap after "
                        f"{k}×[{p},{q}]) — no single-step equivalent "
                        "exists; out of class"
                    )
        lo2 = gm_lo * p
        hi2 = None if (q is None or n is None) else n * q
        inner = inner[: m.start()] + name + _quant_text(lo2, hi2) + inner[m.end():]
    return inner


def _expand_ranged_groups(inner: str) -> list[str]:
    """Mid-pattern groups with a RANGED repetition — ``(X<q> …){m,n}``
    (r12; generalizes the exact-count inline clones of
    :func:`_expand_inline_groups`, closing the VERDICT r11 #3 named
    limit): expand to the alternation of the exact counts
    ``{n} … {m}``, MOST repetitions first — under the alternation
    compiler's leftmost-branch preference that ordering IS the
    SQL:2016 greedy quantifier preference (prefer the longest
    repetition that matches at the anchor). Several ranged groups
    expand to the cartesian product in first-group-major order
    (leftmost-longest), capped at 24 branches like PERMUTE. Exact
    ``{m}`` groups pass through untouched (each returned variant later
    exact-expands via :func:`_expand_inline_groups`). Unbounded
    ``{m,}`` mid-pattern stays a named limit — the repeated TAIL form
    ``PATTERN (STRT (X+ Y+ …){m,})`` serves unbounded cycles."""
    if _INLINE_GROUP_UNBOUNDED.search(inner):
        raise MatchRecognizeError(
            "inline group with an unbounded {m,} quantifier is out of "
            "class mid-pattern — bound the range, or use the repeated "
            "tail form PATTERN (STRT (X+ Y+ …){m,}) for unbounded cycles"
        )
    m = _INLINE_GROUP_RANGED.search(inner)
    if not m:
        return [inner]
    body, lo, hi = m.group(1), int(m.group(2)), int(m.group(3))
    if lo < 1:
        raise MatchRecognizeError(
            "group repetition {0,…} allows an empty match — out of class"
        )
    if hi < lo:
        raise MatchRecognizeError(f"empty group bound {{{lo},{hi}}}")
    tails = _expand_ranged_groups(inner[m.end():])
    out: list[str] = []
    for cnt in range(hi, lo - 1, -1):
        head = f"{inner[: m.start()]}({body}){{{cnt}}}"
        for tail in tails:
            out.append(head + tail)
            if len(out) > 24:
                raise MatchRecognizeError(
                    "ranged-group expansion exceeds 24 alternation "
                    "branches — out of class (narrow the {m,n} ranges)"
                )
    return out


def _parse_steps(inner: str) -> list[tuple[str, int, int | None, bool]]:
    """Steps as (name, min, max, final_reluctant) — the reluctant flag
    is only meaningful on the LAST tuple: non-final reluctant spellings
    are provably ≡ greedy in this class (see _parse_tokens) and are
    normalized away; a reluctant FINAL step truncates the match to its
    lower bound (served since this session by
    :func:`walden_spark.operators.pattern.match_reluctant_final`)."""
    toks = _parse_tokens(inner)
    if not toks or toks[0][0].upper() != "STRT" or toks[0][1:] != (1, 1, False):
        raise MatchRecognizeError("PATTERN must begin with the bare STRT anchor")
    if len(toks) < 2:
        raise MatchRecognizeError("PATTERN needs at least one step after STRT")
    steps = [(n, lo, hi, False) for n, lo, hi, _ in toks[1:]]
    if toks[-1][3]:
        n, lo, hi, _ = steps[-1]
        steps[-1] = (n, lo, hi, True)
    return steps


_MEASURE_CLASSIFIER = re.compile(r"^CLASSIFIER\s*\(\s*\)$", re.IGNORECASE)
_MEASURE_MATCHNO = re.compile(r"^MATCH_NUMBER\s*\(\s*\)$", re.IGNORECASE)
_MEASURE_FINAL_LAST = re.compile(
    r"^FINAL\s+LAST\s*\(\s*([A-Za-z_]\w*)\s*\.\s*([A-Za-z_]\w*)\s*\)$",
    re.IGNORECASE,
)
_MEASURE_FINAL_COUNT = re.compile(
    r"^FINAL\s+COUNT\s*\(\s*([A-Za-z_]\w*)\s*\.\s*\*\s*\)$", re.IGNORECASE
)


def _project_all_rows(
    source: DataFrame,
    matched: DataFrame,
    part: str,
    order: str,
    value: str,
    steps: list[Step],
    measures_text: str,
    subsets: dict[str, list[str]] | None = None,
    clone_map: dict[str, list[str]] | None = None,
) -> DataFrame:
    """ALL ROWS PER MATCH projection: expand the (possibly
    skip-selected) matches back to every covered input row via
    :func:`walden_spark.operators.pattern.expand_all_rows`, then project
    ``partition, <measures>, <input row columns>``. The all-rows measure
    class is CLASSIFIER() (the step name covering the row, ``'STRT'``
    on the anchor), MATCH_NUMBER() (1-based per-partition match rank by
    anchor), STRT.<col> (anchor-row order/value — constant over the
    match), FINAL-semantics per-step measures ``FINAL LAST(X.<col>)``
    / ``FINAL COUNT(X.*)`` (constant over the match — the per-step
    columns ``expand_all_rows`` carries through the span join), and
    bare ``LAST(X.<col>)`` / ``COUNT(X.*)`` with the standard's RUNNING
    semantics (late r11): per-row prefix aggregates over the match —
    a window over (partition, match_no) ordered by the row order,
    filtered to rows CLASSIFIER()-mapped to X ('STRT' never maps, so
    the anchor row reads NULL / 0, per SQL:2016)."""
    from pyspark.sql import Window

    expanded = expand_all_rows(source, matched, part, order, steps)
    row_cols = [c for c in source.columns if c != part]
    step_names = {s.name for s in steps}
    subs = subsets or {}
    cmap = clone_map or {}
    step_order = [s.name for s in steps]
    if any(len(v) > 1 for v in cmap.values()):
        # inline repeated groups (r12): CLASSIFIER() must name the
        # USER's variable, never an internal clone — remap each clone
        # row back to its base. RUNNING measures then aggregate over
        # every clone's rows automatically (the base name is what the
        # classifier column carries), which is exactly SQL:2016: the
        # repeated group's variable maps all of its repetitions' rows.
        remap = None
        for base, names in cmap.items():
            for cname in names[1:]:
                cond = F.col("classifier") == cname
                lit = F.lit(base)
                remap = (
                    F.when(cond, lit) if remap is None else remap.when(cond, lit)
                )
        expanded = expanded.withColumn(
            "classifier", remap.otherwise(F.col("classifier"))
        )
    w_run = (
        Window.partitionBy(part, "match_no")
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def running_col(var_raw: str, col: str | None):
        var = var_raw.lower()
        if var in subs:
            is_var = F.col("classifier").isin(subs[var])
        elif var in step_names:
            is_var = F.col("classifier") == var
        else:
            raise MatchRecognizeError(
                f"RUNNING measure: unknown step {var_raw}"
            )
        if col is None:
            return (
                F.sum(F.when(is_var, F.lit(1)).otherwise(0))
                .over(w_run)
                .cast("bigint")
            )
        if col == order.lower():
            src = F.col(order)
        elif col == value.lower():
            src = F.col(value)
        else:
            raise MatchRecognizeError(
                f"LAST({var_raw}.{col}): only the ORDER BY or DEFINE value "
                "column is carried per step"
            )
        return F.last(F.when(is_var, src), ignorenulls=True).over(w_run)

    def final_col(var_raw: str, col: str | None):
        var = var_raw.lower()
        if var in subs:
            # union members expand through the clone map (r12) so a
            # grouped member contributes every clone's run
            members = [
                c for mname in subs[var] for c in cmap.get(mname, [mname])
            ]
            if col is None:
                out = None
                for mname in members:
                    c = F.col(f"{mname}_len")
                    out = c if out is None else out + c
                return out.cast("bigint")
            var = max(members, key=step_order.index)
        elif var in cmap:
            # grouped variable: FINAL COUNT sums every clone's run
            # length; FINAL LAST reads the final clone (SQL:2016
            # last-mapped-row)
            if col is None:
                out = None
                for cname in cmap[var]:
                    c = F.col(f"{cname}_len")
                    out = c if out is None else out + c
                return out.cast("bigint")
            # pattern-order last, not allocation-order last: nested
            # expansion allocates outer-copy clones before inner-copy
            # ones, so the list order can differ from pattern order
            var = max(cmap[var], key=step_order.index)
        if var not in step_names:
            raise MatchRecognizeError(f"FINAL measure: unknown step {var_raw}")
        if col is None:
            return F.col(f"{var}_len")
        if col == order.lower():
            return F.col(f"{var}_end")
        if col == value.lower():
            return F.col(f"{var}_val")
        raise MatchRecognizeError(
            f"FINAL LAST({var_raw}.{col}): only the ORDER BY or DEFINE "
            "value column is carried per step"
        )

    def measure_col(expr: str):
        if _MEASURE_CLASSIFIER.match(expr):
            return F.col("classifier")
        if _MEASURE_MATCHNO.match(expr):
            return F.col("match_no")
        if fl := _MEASURE_FINAL_LAST.match(expr):
            return final_col(fl.group(1), fl.group(2).lower())
        if fc := _MEASURE_FINAL_COUNT.match(expr):
            return final_col(fc.group(1), None)
        if rl := _MEASURE_LAST.match(expr):
            return running_col(rl.group(1), rl.group(2).lower())
        if rc := _MEASURE_COUNT.match(expr):
            return running_col(rc.group(1), None)
        if am := _MEASURE_ANCHOR.match(expr):
            col = am.group(1).lower()
            if col == order.lower():
                return F.col(f"anchor_{order}")
            if col == value.lower():
                return F.col("anchor_val")
            raise MatchRecognizeError(
                f"STRT.{am.group(1)}: only the ORDER BY ({order}) or DEFINE "
                f"value ({value}) column is available on the anchor"
            )
        raise MatchRecognizeError(
            f"measure {expr!r} is out of class under ALL ROWS PER MATCH "
            "(CLASSIFIER() / MATCH_NUMBER() / STRT.<col> / FINAL or bare "
            "RUNNING LAST(X.<col>) / COUNT(X.*))"
        )

    out_cols = [F.col(part)]
    for item in _split_top_commas(measures_text):
        mm = re.fullmatch(
            r"(.+?)\s+AS\s+([A-Za-z_]\w*)", item.strip(), re.IGNORECASE | re.DOTALL
        )
        if not mm:
            raise MatchRecognizeError(f"measure {item!r} needs an AS alias")
        out_cols.append(measure_col(mm.group(1).strip()).alias(mm.group(2)))
    out_cols += [F.col(c) for c in row_cols]
    return expanded.select(*out_cols)


_GROUP_CYCLE = re.compile(
    r"^STRT\s+\((.+)\)\s*(\+|\{\s*(\d+)\s*(,\s*(\d*))?\s*\})$", re.DOTALL
)
# unbounded repeated group MID-pattern: prefix steps, (cycle body) with
# a {m,} or + quantifier, suffix steps (r13). The cycle body excludes
# parens/pipes; the caller additionally rejects parens in prefix/suffix
# (nested or multiple groups stay with their own routes/limits).
_MID_CYCLE = re.compile(
    r"^STRT\s+(.*?)\(\s*([^()|]+?)\s*\)\s*"
    r"(\+(?!\?)|\{\s*(\d+)\s*,\s*\})\s*(.*)$",
    re.DOTALL,
)
_MEASURE_COUNT_STAR = re.compile(r"^COUNT\s*\(\s*\*\s*\)$", re.IGNORECASE)


def _project_all_rows_cycles(
    source: DataFrame,
    matched: DataFrame,
    part: str,
    order: str,
    value: str,
    steps: list[Step],
    measures_text: str,
    classifier=None,
    prefix_steps: tuple = (),
    suffix_steps: tuple = (),
) -> DataFrame:
    """ALL ROWS PER MATCH projection over a repeated group (r13):
    expand each maximal cycle run back to its covered rows via
    :func:`walden_spark.operators.pattern.expand_all_rows_cycles`
    (each row's transition class names its cycle step — distinct
    classes validated there), then project ``partition, <measures>,
    <input row columns>``. Measure class: CLASSIFIER(),
    MATCH_NUMBER(), STRT.<col>, FINAL LAST(X.<col>) / FINAL
    COUNT(X.*) (match constants from the run frame), COUNT(*), and —
    since late r13 — bare RUNNING LAST(X.<col>) / COUNT(X.*): the
    SQL:2016 per-row prefix aggregate is order-based ("the last
    X-mapped row at or before this row"), so the plain path's
    classifier-filtered window transfers verbatim even though a cycle
    step's rows interleave across repetitions."""
    try:
        expanded = expand_all_rows_cycles(
            source, matched, part, order, value, steps, classifier,
            prefix_steps=prefix_steps, suffix_steps=suffix_steps,
        )
    except ValueError as ex:
        raise MatchRecognizeError(str(ex)) from ex
    row_cols = [c for c in source.columns if c != part]
    step_names = {s.name for s in steps}
    plain_names = {s.name for s in prefix_steps} | {s.name for s in suffix_steps}
    total_rows = F.lit(1)
    for s in steps:
        total_rows = total_rows + F.col(f"{s.name}_total_len")
    for s in tuple(prefix_steps) + tuple(suffix_steps):
        total_rows = total_rows + F.col(f"{s.name}_len")

    from pyspark.sql import Window

    w_run = (
        Window.partitionBy(part, "match_no")
        .orderBy(order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def running_col(var_raw: str, col: str | None):
        var = var_raw.lower()
        if var not in step_names and var not in plain_names:
            raise MatchRecognizeError(
                f"RUNNING measure: unknown step {var_raw}"
            )
        is_var = F.col("classifier") == var
        if col is None:
            return (
                F.sum(F.when(is_var, F.lit(1)).otherwise(0))
                .over(w_run)
                .cast("bigint")
            )
        if col == order.lower():
            src_c = F.col(order)
        elif col == value.lower():
            src_c = F.col(value)
        else:
            raise MatchRecognizeError(
                f"LAST({var_raw}.{col}): only the ORDER BY or DEFINE value "
                "column is carried per step"
            )
        return F.last(F.when(is_var, src_c), ignorenulls=True).over(w_run)

    def measure_col(expr: str):
        if _MEASURE_CLASSIFIER.match(expr):
            return F.col("classifier")
        if _MEASURE_MATCHNO.match(expr):
            return F.col("match_no")
        if _MEASURE_COUNT_STAR.match(expr):
            return total_rows.cast("bigint")
        if rl := _MEASURE_LAST.match(expr):
            return running_col(rl.group(1), rl.group(2).lower())
        if rc := _MEASURE_COUNT.match(expr):
            return running_col(rc.group(1), None)
        if am := _MEASURE_ANCHOR.match(expr):
            col = am.group(1).lower()
            if col == order.lower():
                return F.col(f"anchor_{order}")
            if col == value.lower():
                return F.col("anchor_val")
            raise MatchRecognizeError(
                f"STRT.{am.group(1)}: only the ORDER BY ({order}) or DEFINE "
                f"value ({value}) column is available on the anchor"
            )
        if fl := _MEASURE_FINAL_LAST.match(expr):
            var, col = fl.group(1).lower(), fl.group(2).lower()
            if var in step_names:
                end_c, val_c = f"{var}_last_end", f"{var}_last_val"
            elif var in plain_names:
                end_c, val_c = f"{var}_end", f"{var}_val"
            else:
                raise MatchRecognizeError(
                    f"FINAL LAST({fl.group(1)}.…): unknown step"
                )
            if col == order.lower():
                return F.col(end_c)
            if col == value.lower():
                return F.col(val_c)
            raise MatchRecognizeError(
                f"FINAL LAST({fl.group(1)}.{fl.group(2)}): only the ORDER "
                "BY or DEFINE value column is carried per step"
            )
        if fc := _MEASURE_FINAL_COUNT.match(expr):
            var = fc.group(1).lower()
            if var in step_names:
                return F.col(f"{var}_total_len")
            if var in plain_names:
                return F.col(f"{var}_len")
            raise MatchRecognizeError(
                f"FINAL COUNT({fc.group(1)}.*): unknown step"
            )
        raise MatchRecognizeError(
            f"measure {expr!r} is out of class under ALL ROWS with a "
            "repeated group (CLASSIFIER() / MATCH_NUMBER() / STRT.<col> "
            "/ FINAL LAST(X.<col>) / FINAL COUNT(X.*) / COUNT(*))"
        )

    out_cols = [F.col(part)]
    for item in _split_top_commas(measures_text):
        mm = re.fullmatch(
            r"(.+?)\s+AS\s+([A-Za-z_]\w*)", item.strip(),
            re.IGNORECASE | re.DOTALL
        )
        if not mm:
            raise MatchRecognizeError(f"measure {item!r} needs an AS alias")
        out_cols.append(measure_col(mm.group(1).strip()).alias(mm.group(2)))
    out_cols += [F.col(c) for c in row_cols]
    return expanded.select(*out_cols)


def _compile_cycles(
    source: DataFrame,
    part: str,
    order: str,
    value: str,
    steps: list[Step],
    bounds: tuple[int, int | None],
    clauses: dict[str, str],
    all_rows: bool,
    subsets: dict[str, list[str]],
    classifier=None,
) -> DataFrame:
    """Repeated group tail ``PATTERN (STRT (X+ Y+ …)<q>)`` (late r11):
    one row per MAXIMAL run of consecutive cycle matches, compiled by
    :func:`walden_spark.operators.pattern.match_cycles` (cycle matches
    grouped with the islands trick one level up; the group quantifier
    bounds the cycle count). Maximal runs never overlap — even on
    boundary rows — so AFTER MATCH is restricted to SKIP PAST LAST ROW
    / omitted (every mode would yield the same relation). Measures:
    STRT.<col>, LAST(X.<col>) (the step's final row in the LAST
    cycle), COUNT(X.*) (the step's transitions summed across cycles),
    and COUNT(*) (all rows of the match: 1 + total transitions).

    ALL ROWS PER MATCH (r13): served for the default skip mode via
    :func:`walden_spark.operators.pattern.expand_all_rows_cycles` —
    each covered row's TRANSITION CLASS names its cycle step (the
    cycle's classes must be pairwise distinct), with CLASSIFIER() /
    MATCH_NUMBER() / STRT.<col> / FINAL LAST/COUNT / COUNT(*) measures;
    RUNNING measures and the rescan mode stay out of class."""
    after = clauses.get("AFTER MATCH")
    skip_next = after is not None and re.fullmatch(
        r"SKIP\s+TO\s+NEXT\s+ROW", after.strip(), re.IGNORECASE
    )
    if after is not None and not skip_next and not re.fullmatch(
        r"SKIP\s+PAST\s+LAST\s+ROW", after.strip(), re.IGNORECASE
    ):
        raise MatchRecognizeError(
            f"AFTER MATCH {after!r} with a repeated group: maximal cycle "
            "runs never overlap, so SKIP PAST LAST ROW (or omitting the "
            "clause) and the rescan mode SKIP TO NEXT ROW are the in-class "
            "forms"
        )
    try:
        if skip_next:
            # the rescan over cycle runs (this session): boundary +
            # first-island suffix anchors, no greedy selection
            matched = match_cycles_skip_next(
                source, part, order, value, steps,
                min_cycles=bounds[0], max_cycles=bounds[1],
                classifier=classifier,
            )
        else:
            matched = match_cycles(
                source, part, order, value, steps,
                min_cycles=bounds[0], max_cycles=bounds[1],
                classifier=classifier,
            )
    except ValueError as ex:
        raise MatchRecognizeError(str(ex)) from ex
    if all_rows:
        # rescan-mode ALL ROWS (r14 — closes the r13 named limit): the
        # rescan's anchors are distinct per partition, so the same
        # anchor-ordered MATCH_NUMBER applies; each (possibly
        # overlapping) match expands over its own anchor..end span,
        # and match_cycles_skip_next's per-anchor SUFFIX totals ARE
        # that match's FINAL measures — the projection composes
        # without a rescan-specific arm.
        if subsets:
            raise MatchRecognizeError(
                "SUBSET under ALL ROWS with a repeated group is out of "
                "class"
            )
        return _project_all_rows_cycles(
            source, matched, part, order, value, steps,
            clauses["MEASURES"], classifier=classifier,
        )
    step_names = {s.name for s in steps}
    step_order = [s.name for s in steps]
    subs = subsets or {}
    total_rows = F.lit(1)
    for s in steps:
        total_rows = total_rows + F.col(f"{s.name}_total_len")

    def measure_col(expr: str):
        if _MEASURE_COUNT_STAR.match(expr):
            return total_rows.cast("bigint")
        if am := _MEASURE_ANCHOR.match(expr):
            col = am.group(1).lower()
            if col == order.lower():
                return F.col(f"anchor_{order}")
            if col == value.lower():
                return F.col("anchor_val")
            raise MatchRecognizeError(
                f"STRT.{am.group(1)}: only the ORDER BY ({order}) or DEFINE "
                f"value ({value}) column is available on the anchor"
            )
        if lm := _MEASURE_LAST.match(expr):
            var, col = lm.group(1).lower(), lm.group(2).lower()
            if var in subs:
                # SUBSET over a repeated group (this session): LAST(U.c)
                # = the member latest in CYCLE step order, in the LAST
                # cycle — the run's latest U-mapped row, since cycles
                # repeat the step sequence in order
                var = max(subs[var], key=step_order.index)
            if var not in step_names:
                raise MatchRecognizeError(f"LAST({lm.group(1)}.…): unknown step")
            if col == order.lower():
                return F.col(f"{var}_last_end")
            if col == value.lower():
                return F.col(f"{var}_last_val")
            raise MatchRecognizeError(
                f"LAST({lm.group(1)}.{lm.group(2)}): only the ORDER BY or "
                "DEFINE value column is carried per step"
            )
        if cm := _MEASURE_COUNT.match(expr):
            var = cm.group(1).lower()
            if var in subs:
                out = None
                for mname in subs[var]:
                    c = F.col(f"{mname}_total_len")
                    out = c if out is None else out + c
                return out.cast("bigint")
            if var not in step_names:
                raise MatchRecognizeError(f"COUNT({cm.group(1)}.*): unknown step")
            return F.col(f"{var}_total_len")
        raise MatchRecognizeError(
            f"measure {expr!r} is out of class under a repeated group "
            "(STRT.<col> / LAST(X.<col>) / COUNT(X.*) / COUNT(*))"
        )

    out_cols = [F.col(part)]
    for item in _split_top_commas(clauses["MEASURES"]):
        mm = re.fullmatch(
            r"(.+?)\s+AS\s+([A-Za-z_]\w*)", item.strip(), re.IGNORECASE | re.DOTALL
        )
        if not mm:
            raise MatchRecognizeError(f"measure {item!r} needs an AS alias")
        out_cols.append(measure_col(mm.group(1).strip()).alias(mm.group(2)))
    return matched.select(*out_cols)


def _compile_cycles_mid(
    source: DataFrame,
    part: str,
    order: str,
    value: str,
    prefix_steps: list[Step],
    cycle_steps: list[Step],
    suffix_steps: list[Step],
    min_cycles: int,
    clauses: dict[str, str],
    all_rows: bool,
    subsets: dict[str, list[str]],
    classifier=None,
) -> DataFrame:
    """Unbounded repeated group MID-pattern ``PATTERN (STRT P1+ …
    (X+ Y+ …){m,} S1+ …)`` (r13 — closes the named limit; the bounded
    ``{m,n}`` mid-pattern keeps the clone-expansion route): compiled by
    :func:`walden_spark.operators.pattern.match_cycles_mid` — prefix
    chain + maximal cycle run + suffix chain joined on row adjacency
    over one shared islands frame. Unlike the bare repeated tail,
    these matches CAN share boundary rows with neighbors (the prefix
    anchors on an island boundary), so the default greedy skip-past
    selection runs. Measures: STRT.<col>, COUNT(*), and per step
    LAST(X.<col>) / COUNT(X.*) — cycle steps resolve to their
    last-cycle row / cross-cycle transition sum per SQL:2016."""
    names = [s.name for s in prefix_steps + cycle_steps + suffix_steps]
    if len(set(names)) != len(names):
        raise MatchRecognizeError(
            "a pattern variable appears both inside and outside the "
            "repeated group — out of class (give the occurrences "
            "distinct names and duplicate the DEFINE)"
        )
    after = clauses.get("AFTER MATCH")
    if after is not None and not re.fullmatch(
        r"SKIP\s+PAST\s+LAST\s+ROW", after.strip(), re.IGNORECASE
    ):
        raise MatchRecognizeError(
            f"AFTER MATCH {after!r} with a mid-pattern repeated group: "
            "SKIP PAST LAST ROW (or omitting the clause) is the in-class "
            "form"
        )
    try:
        matched = match_cycles_mid(
            source, part, order, value, prefix_steps, cycle_steps,
            suffix_steps, min_cycles=min_cycles, classifier=classifier,
        )
    except ValueError as ex:
        raise MatchRecognizeError(str(ex)) from ex
    last_end = f"{suffix_steps[-1].name}_end" if suffix_steps else "end"
    matched = select_skip_past(matched, part, f"anchor_{order}", last_end)
    if all_rows:
        if subsets:
            raise MatchRecognizeError(
                "SUBSET under ALL ROWS with a repeated group is out of "
                "class"
            )
        # ALL ROWS over the mid-pattern form (r13): prefix/suffix
        # regions classify by their step-end bounds, the run region by
        # transition class — expand_all_rows_cycles' mid form
        return _project_all_rows_cycles(
            source, matched, part, order, value, cycle_steps,
            clauses["MEASURES"], classifier=classifier,
            prefix_steps=tuple(prefix_steps),
            suffix_steps=tuple(suffix_steps),
        )
    plain = {s.name for s in prefix_steps} | {s.name for s in suffix_steps}
    cyc = {s.name for s in cycle_steps}
    # SUBSET over the mid form (late r13): members resolve statically
    # over the LINEAR pattern order prefix → cycle steps → suffix —
    # LAST(U.col) reads the member latest in that order (a cycle
    # member's last row lies in the LAST cycle, where cycle order
    # applies), COUNT(U.*) sums plain run lengths and cycle totals.
    linear_order = [s.name for s in prefix_steps]
    linear_order += [s.name for s in cycle_steps]
    linear_order += [s.name for s in suffix_steps]
    subs = subsets or {}
    total_rows = F.lit(1)
    for s in prefix_steps + suffix_steps:
        total_rows = total_rows + F.col(f"{s.name}_len")
    for s in cycle_steps:
        total_rows = total_rows + F.col(f"{s.name}_total_len")

    def measure_col(expr: str):
        if _MEASURE_COUNT_STAR.match(expr):
            return total_rows.cast("bigint")
        if am := _MEASURE_ANCHOR.match(expr):
            col = am.group(1).lower()
            if col == order.lower():
                return F.col(f"anchor_{order}")
            if col == value.lower():
                return F.col("anchor_val")
            raise MatchRecognizeError(
                f"STRT.{am.group(1)}: only the ORDER BY ({order}) or DEFINE "
                f"value ({value}) column is available on the anchor"
            )
        if lm := _MEASURE_LAST.match(expr):
            var, col = lm.group(1).lower(), lm.group(2).lower()
            if var in subs:
                var = max(subs[var], key=linear_order.index)
            if var in cyc:
                end_c, val_c = f"{var}_last_end", f"{var}_last_val"
            elif var in plain:
                end_c, val_c = f"{var}_end", f"{var}_val"
            else:
                raise MatchRecognizeError(f"LAST({lm.group(1)}.…): unknown step")
            if col == order.lower():
                return F.col(end_c)
            if col == value.lower():
                return F.col(val_c)
            raise MatchRecognizeError(
                f"LAST({lm.group(1)}.{lm.group(2)}): only the ORDER BY or "
                "DEFINE value column is carried per step"
            )
        if cm := _MEASURE_COUNT.match(expr):
            var = cm.group(1).lower()
            if var in subs:
                out = None
                for mname in subs[var]:
                    c = (
                        F.col(f"{mname}_total_len")
                        if mname in cyc
                        else F.col(f"{mname}_len")
                    )
                    out = c if out is None else out + c
                return out.cast("bigint")
            if var in cyc:
                return F.col(f"{var}_total_len")
            if var in plain:
                return F.col(f"{var}_len")
            raise MatchRecognizeError(f"COUNT({cm.group(1)}.*): unknown step")
        raise MatchRecognizeError(
            f"measure {expr!r} is out of class under a repeated group "
            "(STRT.<col> / LAST(X.<col>) / COUNT(X.*) / COUNT(*))"
        )

    out_cols = [F.col(part)]
    for item in _split_top_commas(clauses["MEASURES"]):
        mm = re.fullmatch(r"(.+?)\s+AS\s+([A-Za-z_]\w*)", item.strip(),
                          re.IGNORECASE | re.DOTALL)
        if not mm:
            raise MatchRecognizeError(f"measure {item!r} needs an AS alias")
        out_cols.append(measure_col(mm.group(1).strip()).alias(mm.group(2)))
    return matched.select(*out_cols)


def _compile_alternation(
    source: DataFrame,
    part: str,
    order: str,
    value: str,
    branches: list[list[Step]],
    clauses: dict[str, str],
    all_rows: bool,
    classifier=None,
    subsets: dict[str, list[str]] | None = None,
    clone_maps: list[dict[str, list[str]]] | None = None,
) -> DataFrame:
    """Top-level PATTERN alternation at the SQL surface (r11):
    ``PATTERN ((STRT …) | (STRT …) …)`` compiles every branch through
    :func:`walden_spark.operators.pattern.match_any` (ONE shared
    classification shuffle), then applies SQL:2016 alternation
    preference — where two branches match at the same anchor, the
    LEFTMOST listed branch wins — and the AFTER MATCH skip selection.

    Supported class under alternation: AFTER MATCH SKIP PAST LAST ROW
    (or omitted — the default); overlapping (SKIP TO LAST) alternation
    output is the Python API's ``match_any`` (which reports every
    branch's matches, a different relation than the scan semantics).
    ONE ROW PER MATCH measures: STRT.<col>, CLASSIFIER() (the winning
    branch's final step name — branch final steps must be distinct),
    and LAST(X.<col>) / COUNT(X.*) for any variable X (NULL on rows won
    by a branch not containing X). ALL ROWS PER MATCH (late r11):
    matches are numbered across branches, each branch's matches expand
    with its own steps, and the expansions union — measures there are
    CLASSIFIER() (per-row step name) / MATCH_NUMBER() / STRT.<col>."""
    from pyspark.sql import Window

    after = clauses.get("AFTER MATCH")
    skip_next = after is not None and re.fullmatch(
        r"SKIP\s+TO\s+NEXT\s+ROW", after.strip(), re.IGNORECASE
    )
    if after is not None and not skip_next and not re.fullmatch(
        r"SKIP\s+PAST\s+LAST\s+ROW", after.strip(), re.IGNORECASE
    ):
        raise MatchRecognizeError(
            f"AFTER MATCH {after!r} with alternation: SKIP PAST LAST ROW "
            "(or omitting the clause) and SKIP TO NEXT ROW are the in-class "
            "modes — overlapping alternation matches are the Python API's "
            "operators.pattern.match_any"
        )
    # branch labels are synthetic (PERMUTE expansions routinely share
    # final variables); CLASSIFIER() maps the winning label back to the
    # branch's final step name, per ONE ROW PER MATCH semantics.
    # clone_maps (r12 — ranged inline groups expand to one branch per
    # exact count) parallels `branches`; measure variables and
    # CLASSIFIER() always name the USER's variable, so clone names map
    # back to their base everywhere below.
    labels = [f"__b{i}" for i in range(len(branches))]
    cmaps = clone_maps or [{} for _ in branches]
    cmap_by_label = dict(zip(labels, cmaps))

    def _base_of(name: str, cmap: dict[str, list[str]]) -> str:
        for base, names in cmap.items():
            if name in names:
                return base
        return name

    final_by_label = {
        lab: _base_of(b[-1].name, cm)
        for lab, b, cm in zip(labels, branches, cmaps)
    }
    patterns = dict(zip(labels, branches))
    anchor = f"anchor_{order}"

    def _has_run(steps_b: list[Step]) -> bool:
        return any(x.dir == y.dir for x, y in zip(steps_b, steps_b[1:]))

    width = max(len(b) for b in branches)
    ord_t = source.schema[order].dataType
    val_t = source.schema[value].dataType

    def _wrap(mb: DataFrame, lab: str, steps_b: list[Step]) -> DataFrame:
        """Positional step{j}_* columns + branch label, padding short
        branches with typed NULLs (the match_any wrapping, shared by
        both skip arms)."""
        cols = [
            F.lit(lab).alias("pattern"),
            F.col(part),
            F.col(anchor),
            F.col("anchor_val"),
        ]
        for j in range(width):
            if j < len(steps_b):
                s = steps_b[j].name
                cols += [
                    F.col(f"{s}_end").alias(f"step{j}_end"),
                    F.col(f"{s}_val").alias(f"step{j}_val"),
                    F.col(f"{s}_len").alias(f"step{j}_len"),
                ]
            else:
                cols += [
                    F.lit(None).cast(ord_t).alias(f"step{j}_end"),
                    F.lit(None).cast(val_t).alias(f"step{j}_val"),
                    F.lit(None).cast("bigint").alias(f"step{j}_len"),
                ]
        return mb.select(*cols)

    if skip_next:
        # SKIP TO NEXT ROW × alternation (this session): each branch's
        # rescan match set is its suffix-anchor expansion on ONE shared
        # classification; where two branches match at the same anchor
        # the leftmost wins (the rescan attempts branches in listed
        # order at every row) — and that per-anchor preference is the
        # ONLY selection, since every successful anchor is kept.
        # ALL ROWS composes: the expansion block below numbers the
        # post-preference matches by anchor (distinct per partition)
        # and expands each branch's matches with its own steps.
        isl = classify_islands(
            source, part, order, value, classifier
        ).localCheckpoint(eager=True)
        parts_sn = []
        for lab, steps_b in patterns.items():
            if _has_run(steps_b):
                # r14: same-class runs inside a branch — the merged-run
                # rescan on the shared islands frame
                mb = match_split_pair(
                    source, part, order, value, steps_b,
                    classifier=classifier, skip_next=True, islands=isl,
                )
            else:
                mb = match_skip_next(
                    source, part, order, value, steps_b,
                    classifier=classifier, islands=isl,
                )
            parts_sn.append(_wrap(mb, lab, steps_b))
        m = parts_sn[0]
        for p in parts_sn[1:]:
            m = m.unionByName(p)
    elif any(_has_run(b) for b in branches):
        # r14: at least one branch holds a same-class run — compile
        # each branch on ONE shared classification (split branches via
        # the merged-run route, plain branches via match_pattern) and
        # union the wrapped frames; leftmost preference + the greedy
        # skip walk below are branch-agnostic
        isl = classify_islands(
            source, part, order, value, classifier
        ).localCheckpoint(eager=True)
        parts_mx = []
        for lab, steps_b in patterns.items():
            if _has_run(steps_b):
                mb = match_split_pair(
                    source, part, order, value, steps_b,
                    classifier=classifier, islands=isl,
                )
            else:
                mb = match_pattern(
                    source, part, order, value, steps_b,
                    classifier=classifier, islands=isl,
                )
            parts_mx.append(_wrap(mb, lab, steps_b))
        m = parts_mx[0]
        for p in parts_mx[1:]:
            m = m.unionByName(p)
    else:
        m = match_any(
            source, part, order, value, patterns, classifier=classifier
        )
    bidx = None
    endc = None
    for i, (lab, steps) in enumerate(patterns.items()):
        cond = F.col("pattern") == lab
        last = F.col(f"step{len(steps) - 1}_end")
        bidx = F.when(cond, F.lit(i)) if bidx is None else bidx.when(cond, F.lit(i))
        endc = F.when(cond, last) if endc is None else endc.when(cond, last)
    m = m.withColumn("__bidx", bidx).withColumn("__end", endc)
    # leftmost-branch preference at a shared anchor, then (for the
    # skip-past modes only) the greedy skip walk
    wp = Window.partitionBy(part, anchor).orderBy("__bidx")
    m = (
        m.withColumn("__rn", F.row_number().over(wp))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if not skip_next:
        m = select_skip_past(m, part, anchor, "__end")
    if all_rows:
        # number ACROSS branches (post-selection anchors are unique per
        # partition), then expand each branch's matches with its own
        # steps — the positional step{i} columns rename back to that
        # branch's named columns so the classifier CASE and the span
        # bounds resolve — and union the expansions.
        wn = Window.partitionBy(part).orderBy(anchor)
        m = m.withColumn("match_no", F.row_number().over(wn).cast("bigint"))
        parts_out = []
        for lab, steps in patterns.items():
            sel = [
                F.col(part),
                F.col("match_no"),
                F.col(anchor),
                F.col("anchor_val"),
            ]
            for i, st in enumerate(steps):
                sel += [
                    F.col(f"step{i}_end").alias(f"{st.name}_end"),
                    F.col(f"step{i}_val").alias(f"{st.name}_val"),
                    F.col(f"step{i}_len").alias(f"{st.name}_len"),
                ]
            mb = m.filter(F.col("pattern") == lab).select(*sel)
            eb = expand_all_rows(
                source, mb, part, order, steps, match_no_col="match_no"
            )
            cmap = cmap_by_label[lab]
            if any(len(v) > 1 for v in cmap.values()):
                # CLASSIFIER() names the user's variable, not an
                # internal ranged-group clone (r12)
                remap = None
                for base, cnames in cmap.items():
                    for cname in cnames[1:]:
                        cond = F.col("classifier") == cname
                        lit = F.lit(base)
                        remap = (
                            F.when(cond, lit)
                            if remap is None
                            else remap.when(cond, lit)
                        )
                eb = eb.withColumn(
                    "classifier", remap.otherwise(F.col("classifier"))
                )
            parts_out.append(eb)
        expanded = parts_out[0]
        for p in parts_out[1:]:
            expanded = expanded.unionByName(p, allowMissingColumns=True)

        def ar_measure(expr: str):
            if _MEASURE_CLASSIFIER.match(expr):
                return F.col("classifier")
            if _MEASURE_MATCHNO.match(expr):
                return F.col("match_no")
            if am := _MEASURE_ANCHOR.match(expr):
                col = am.group(1).lower()
                if col == order.lower():
                    return F.col(anchor)
                if col == value.lower():
                    return F.col("anchor_val")
            raise MatchRecognizeError(
                f"measure {expr!r} is out of class under ALL ROWS with "
                "alternation (CLASSIFIER() / MATCH_NUMBER() / STRT.<col>)"
            )

        out_cols = [F.col(part)]
        for item in _split_top_commas(clauses["MEASURES"]):
            mm = re.fullmatch(
                r"(.+?)\s+AS\s+([A-Za-z_]\w*)",
                item.strip(),
                re.IGNORECASE | re.DOTALL,
            )
            if not mm:
                raise MatchRecognizeError(f"measure {item!r} needs an AS alias")
            out_cols.append(ar_measure(mm.group(1).strip()).alias(mm.group(2)))
        row_cols = [c for c in source.columns if c != part]
        return expanded.select(*out_cols, *[F.col(c) for c in row_cols])

    def measure_col(expr: str):
        if _MEASURE_CLASSIFIER.match(expr):
            out = None
            for lab, fname in final_by_label.items():
                cond = F.col("pattern") == lab
                lit = F.lit(fname)
                out = F.when(cond, lit) if out is None else out.when(cond, lit)
            return out
        if am := _MEASURE_ANCHOR.match(expr):
            col = am.group(1).lower()
            if col == order.lower():
                return F.col(anchor)
            if col == value.lower():
                return F.col("anchor_val")
            raise MatchRecognizeError(
                f"STRT.{am.group(1)}: only the ORDER BY ({order}) or DEFINE "
                f"value ({value}) column is available on the anchor"
            )

        def over_branches(var: str, kind: str):
            # a SUBSET union variable resolves PER BRANCH (this session
            # — closes the SUBSET×alternation named limit): in the
            # winning branch, LAST(U.col) is the member latest in THAT
            # branch's step order, COUNT(U.*) the sum of its members'
            # run lengths there — 0 when the branch contains no member
            # (per SQL:2016 COUNT over an empty mapping), while
            # LAST(U.col) reads NULL, like any per-branch measure.
            subs = subsets or {}
            is_subset = var in subs
            out = None
            for lab, steps in patterns.items():
                names = [s.name for s in steps]
                cmap = cmap_by_label[lab]
                if is_subset:
                    # members expand through THIS branch's clone map
                    # (r12): a grouped member contributes every clone
                    # present in the branch
                    members = [
                        c
                        for mn in subs[var]
                        for c in cmap.get(mn, [mn])
                        if c in names
                    ]
                    if not members:
                        continue
                    if kind == "len":
                        c = None
                        for mname in members:
                            cc = F.col(f"step{names.index(mname)}_len")
                            c = cc if c is None else c + cc
                        c = c.cast("bigint")
                    else:
                        mname = max(members, key=names.index)
                        c = F.col(f"step{names.index(mname)}_{kind}")
                elif var in cmap and len(cmap[var]) > 1:
                    # grouped variable in a ranged-expansion branch:
                    # COUNT sums every clone's run, LAST reads the
                    # branch's final clone
                    members = [c for c in cmap[var] if c in names]
                    if not members:
                        continue
                    if kind == "len":
                        c = None
                        for mname in members:
                            cc = F.col(f"step{names.index(mname)}_len")
                            c = cc if c is None else c + cc
                        c = c.cast("bigint")
                    else:
                        mname = max(members, key=names.index)
                        c = F.col(f"step{names.index(mname)}_{kind}")
                elif var in names:
                    c = F.col(f"step{names.index(var)}_{kind}")
                else:
                    continue
                cond = F.col("pattern") == lab
                out = F.when(cond, c) if out is None else out.when(cond, c)
            if out is None:
                raise MatchRecognizeError(
                    f"measure variable {var!r} appears in no branch"
                )
            if is_subset and kind == "len":
                out = out.otherwise(F.lit(0).cast("bigint"))
            return out

        if lm := _MEASURE_LAST.match(expr):
            var, col = lm.group(1).lower(), lm.group(2).lower()
            if col == order.lower():
                return over_branches(var, "end")
            if col == value.lower():
                return over_branches(var, "val")
            raise MatchRecognizeError(
                f"LAST({lm.group(1)}.{lm.group(2)}): only the ORDER BY or "
                "DEFINE value column is carried per step"
            )
        if cm := _MEASURE_COUNT.match(expr):
            return over_branches(cm.group(1).lower(), "len")
        raise MatchRecognizeError(
            f"measure {expr!r} is out of class under alternation "
            "(STRT.<col> / CLASSIFIER() / LAST(X.<col>) / COUNT(X.*))"
        )

    out_cols = [F.col(part)]
    for item in _split_top_commas(clauses["MEASURES"]):
        mm = re.fullmatch(
            r"(.+?)\s+AS\s+([A-Za-z_]\w*)", item.strip(), re.IGNORECASE | re.DOTALL
        )
        if not mm:
            raise MatchRecognizeError(f"measure {item!r} needs an AS alias")
        out_cols.append(measure_col(mm.group(1).strip()).alias(mm.group(2)))
    return m.select(*out_cols)


def compile_match_recognize(
    spark: SparkSession, source: DataFrame, body: str
) -> DataFrame:
    """Compile one MATCH_RECOGNIZE body over ``source`` into the
    measures-projected one-row-per-match DataFrame."""
    clauses = dict(_split_clauses(body))
    all_rows = "ALL ROWS PER MATCH" in clauses
    if all_rows and "ONE ROW PER MATCH" in clauses:
        raise MatchRecognizeError("both ONE ROW and ALL ROWS PER MATCH given")
    for need in ("PARTITION BY", "ORDER BY", "MEASURES", "PATTERN", "DEFINE"):
        if need not in clauses:
            raise MatchRecognizeError(f"missing {need} clause")
    part = clauses["PARTITION BY"].strip()
    order = clauses["ORDER BY"].strip()
    for label, col in (("PARTITION BY", part), ("ORDER BY", order)):
        if not re.fullmatch(r"[A-Za-z_]\w*", col):
            raise MatchRecognizeError(
                f"{label} {col!r}: a single plain column is required"
            )
    # pattern + defines → compiler steps. A repeated group tail —
    # PATTERN (STRT (X+ Y+ …)<q>) — routes to the cycle compiler.
    cycle_bounds = None
    ptext = clauses["PATTERN"].strip()
    if ptext.startswith("(") and ptext.endswith(")"):
        # quantified SINGLE-step groups rewrite to plain quantifier
        # arithmetic up front (r12) — (b+){2} ≡ b{2,} — so they serve
        # through every downstream form (plain, tail-cycle, ranged,
        # alternation) instead of tripping group machinery
        ptext = "(" + _rewrite_single_step_groups(ptext[1:-1].strip()) + ")"
    gm = None
    if ptext.startswith("(") and ptext.endswith(")"):
        gm = _GROUP_CYCLE.match(ptext[1:-1].strip())
    if gm:
        gtoks = _parse_tokens(gm.group(1).strip())
        if not gtoks:
            raise MatchRecognizeError("empty repeated group")
        if any(t[3] for t in gtoks):
            raise MatchRecognizeError(
                "reluctant quantifiers inside a repeated group are out of "
                "class"
            )
        if gm.group(2) == "+":
            cycle_bounds = (1, None)
        else:
            lo_i = int(gm.group(3))
            if lo_i < 1:
                raise MatchRecognizeError(
                    "group quantifier {0,…} allows an empty match — out of "
                    "class"
                )
            hi = gm.group(5)
            hi_i = None if hi == "" else (int(hi) if hi is not None else lo_i)
            if hi_i is not None and hi_i < lo_i:
                raise MatchRecognizeError("empty group bound")
            cycle_bounds = (lo_i, hi_i)
        toks = [[(n, lo, hi2, False) for n, lo, hi2, _ in gtoks]]
    clone_map: dict[str, list[str]] = {}
    clone_maps: list[dict[str, list[str]]] | None = None
    mid_cycle: tuple[int, int, int, int] | None = None
    if gm:
        pass
    else:
        inner0 = (
            ptext[1:-1].strip()
            if ptext.startswith("(") and ptext.endswith(")")
            else None
        )
        mcm = _MID_CYCLE.match(inner0) if inner0 is not None else None
        if (
            mcm
            and "(" not in mcm.group(1) + mcm.group(5)
            and ")" not in mcm.group(1) + mcm.group(5)
            and "|" not in inner0
            and not re.search(r"\bPERMUTE\s*\(", inner0, re.IGNORECASE)
        ):
            # UNBOUNDED {m,} (or +) repeated group MID-pattern (r13 —
            # closes the named limit; bounded {m,n} groups keep the
            # clone-expansion route below): prefix chain + maximal
            # cycle run + suffix chain, composed relationally by
            # operators/pattern.match_cycles_mid over one shared
            # islands frame. The linear token pass below checks the
            # junction adjacencies (prefix-last vs cycle-first,
            # cycle-last vs suffix-first) exactly like plain steps.
            pre_txt, body, quant = mcm.group(1), mcm.group(2), mcm.group(3)
            suf_txt = mcm.group(5)
            mc_lo = int(mcm.group(4)) if mcm.group(4) is not None else 1
            if mc_lo < 1:
                raise MatchRecognizeError(
                    "group repetition {0,…} allows an empty match — out "
                    "of class"
                )
            pre_toks = _parse_tokens(pre_txt) if pre_txt.strip() else []
            cyc_toks = _parse_tokens(body)
            suf_toks = _parse_tokens(suf_txt) if suf_txt.strip() else []
            if not cyc_toks:
                raise MatchRecognizeError("empty repeated group")
            if any(t[3] for t in pre_toks + cyc_toks + suf_toks):
                raise MatchRecognizeError(
                    "reluctant quantifiers around an unbounded repeated "
                    "group are out of class"
                )
            if not pre_toks and not suf_toks:
                raise MatchRecognizeError(
                    "internal: bare repeated tail should take the cycle "
                    "route"
                )
            mid_cycle = (len(pre_toks), len(cyc_toks), mc_lo, len(suf_toks))
            toks = [pre_toks + cyc_toks + suf_toks]
        elif (
            inner0 is not None
            and (
                _INLINE_GROUP.search(inner0)
                or _INLINE_GROUP_RANGED.search(inner0)
                or _INLINE_GROUP_UNBOUNDED.search(inner0)
            )
            and not re.search(r"\bPERMUTE\s*\(", inner0, re.IGNORECASE)
            and len(_split_top_pipes(inner0)) == 1
        ):
            # mid-pattern groups with EXACT or RANGED repetition
            # counts, arbitrarily NESTED (r12): _expand_groups expands
            # top-level-first into plain variant texts — ranged
            # quantifiers fork one variant per exact count, longest
            # first (= greedy preference under leftmost-branch
            # selection) — with per-variant clone maps steering the
            # measure layer (LAST → pattern-last clone, COUNT → clone
            # sum); globally for the single-variant path, per-branch
            # under the alternation compiler
            expansions = _expand_groups(inner0, {})
            if len(expansions) == 1:
                expanded, clone_map = expansions[0]
                toks = [_parse_steps(expanded)]
            else:
                toks, clone_maps = [], []
                for expanded, cmap in expansions:
                    toks.append(_parse_steps(expanded))
                    clone_maps.append(cmap)
                # merged map for DEFINE resolution (clones share the
                # base's class) and skip-target rewriting
                for cmap in clone_maps:
                    for base, names in cmap.items():
                        cur = clone_map.setdefault(base, [base])
                        for n in names[1:]:
                            if n not in cur:
                                cur.append(n)
        else:
            toks = _parse_pattern(ptext)
    defines: dict[str, tuple[int, str]] = {}
    const_defs: dict[str, tuple[str, float, str]] = {}
    for item in _split_top_commas(clauses["DEFINE"]):
        it = item.strip()
        if m := _DEFINE_ITEM.match(it):
            name, vcol, op, vcol2 = m.group(1), m.group(2), m.group(3), m.group(4)
            if vcol.lower() != vcol2.lower():
                raise MatchRecognizeError(
                    f"DEFINE {name}: value columns differ ({vcol} vs {vcol2})"
                )
            if op not in _DIR_BY_OP:
                raise MatchRecognizeError(
                    f"DEFINE {name}: operator {op!r} is out of class"
                )
            kind = "prev"
        elif m := _DEFINE_CONST.match(it):
            name, vcol, op = m.group(1), m.group(2), m.group(3)
            kind = "const"
        else:
            raise MatchRecognizeError(
                f"DEFINE {it!r}: only X AS X.<v> <|>|= PREV(X.<v>) "
                "(direction classes) or X AS X.<v> <op> <number> "
                "(threshold classes) are in class (full-match aggregates "
                "are served by operators.pattern.span_measures)"
            )
        if name.upper() == "STRT":
            raise MatchRecognizeError("STRT is the anchor and must stay undefined")
        if name.lower() in defines or name.lower() in const_defs:
            raise MatchRecognizeError(f"duplicate DEFINE for {name}")
        if kind == "prev":
            defines[name.lower()] = (_DIR_BY_OP[op], vcol)
        else:
            const_defs[name.lower()] = (op, float(m.group(4)), vcol)
    clf = None  # None → the default delta-sign classifier
    if defines and const_defs:
        # MIXED direction + threshold classes (r13, VERDICT r12 #6 —
        # e.g. ``DOWN AS v < PREV(v), SPIKE AS v = 0``): each unique
        # predicate becomes one transition class on the shared value
        # column. Disjointness, which maximal-run semantics require:
        # * direction-vs-direction — statically disjoint (<, >, = of
        #   cur vs prev partition by construction);
        # * threshold-vs-threshold — statically validated (pairwise
        #   disjoint intervals, as in the all-constant path);
        # * direction-vs-threshold — NOT statically decidable (v <
        #   PREV(v) says nothing about v vs a constant), so the
        #   classifier carries a RUNTIME guard: a transition
        #   satisfying two predicates fails the query with a named
        #   error instead of silently mis-classifying (the "clean
        #   error, not wrong answer" contract, enforced on the data
        #   actually scanned). Duplicate predicates across names (two
        #   steps sharing a class) collapse to one class, mirroring
        #   the all-PREV path.
        value_cols = {v for _, v in defines.values()}
        value_cols |= {v for _, _, v in const_defs.values()}
        if len(value_cols) != 1:
            raise MatchRecognizeError(
                f"DEFINEs must share one value column, got {sorted(value_cols)}"
            )
        value = value_cols.pop()
        keys: list[tuple] = []
        name_key: dict[str, tuple] = {}
        for n, (d, _v) in defines.items():
            k = ("prev", d)
            if k not in keys:
                keys.append(k)
            name_key[n] = k
        for n, (op, kv, _v) in const_defs.items():
            k = ("const", op, kv)
            if k not in keys:
                keys.append(k)
            name_key[n] = k
        const_keys = [k for k in keys if k[0] == "const"]
        for i in range(len(const_keys)):
            for j in range(i + 1, len(const_keys)):
                if _intervals_overlap(
                    _const_interval(const_keys[i][1], const_keys[i][2]),
                    _const_interval(const_keys[j][1], const_keys[j][2]),
                ):
                    raise MatchRecognizeError(
                        "mixed DEFINE: threshold predicates "
                        f"{const_keys[i][1]} {const_keys[i][2]} and "
                        f"{const_keys[j][1]} {const_keys[j][2]} overlap — "
                        "classes must PARTITION the rows"
                    )

        def clf(cur, prev, _keys=tuple(keys)):
            conds = []
            for k in _keys:
                if k[0] == "prev":
                    d = k[1]
                    conds.append(
                        cur < prev
                        if d == DOWN
                        else (cur > prev if d == UP else cur == prev)
                    )
                else:
                    op, kv = k[1], k[2]
                    conds.append(
                        {
                            "<": cur < kv, "<=": cur <= kv,
                            ">": cur > kv, ">=": cur >= kv, "=": cur == kv,
                        }[op]
                    )
            cnt = None
            for c in conds:
                t = c.cast("int")
                cnt = t if cnt is None else cnt + t
            chain = None
            for i, c in enumerate(conds):
                lit = F.lit(i)
                chain = F.when(c, lit) if chain is None else chain.when(c, lit)
            overlap_err = F.raise_error(
                F.concat(
                    F.lit(
                        "MATCH_RECOGNIZE mixed DEFINE classes overlap on "
                        "this input: the transition to value "
                    ),
                    cur.cast("string"),
                    F.lit(" from "),
                    prev.cast("string"),
                    F.lit(
                        " satisfies two DEFINE predicates — classes must "
                        "PARTITION the transitions, so this clause is out "
                        "of class on this data (make the direction and "
                        "threshold predicates mutually exclusive)"
                    ),
                )
            ).cast("int")
            return F.when(cnt >= 2, overlap_err).otherwise(
                chain.otherwise(F.lit(-1))
            )

        defines = {
            n: (keys.index(k), value) for n, k in name_key.items()
        }
        const_defs = {}
    if const_defs:
        # threshold classes (late r11): classes are disjoint intervals of
        # the value column, routed through the compiler's pluggable
        # classifier — class i = "the CURRENT row's value lies in
        # interval i", matching DEFINE X AS X.<v> <op> <k> row semantics
        # (the anchor row stays unconstrained, STRT being undefined)
        value_cols = {v for _, _, v in const_defs.values()}
        if len(value_cols) != 1:
            raise MatchRecognizeError(
                f"DEFINEs must share one value column, got {sorted(value_cols)}"
            )
        value = value_cols.pop()
        items = list(const_defs.items())
        ivs = [(n, _const_interval(op, k)) for n, (op, k, _) in items]
        for i in range(len(ivs)):
            for j in range(i + 1, len(ivs)):
                if _intervals_overlap(ivs[i][1], ivs[j][1]):
                    raise MatchRecognizeError(
                        f"DEFINE {ivs[i][0]} and {ivs[j][0]}: threshold "
                        "predicates overlap — classes must PARTITION the "
                        "rows (make the intervals disjoint)"
                    )

        def clf(cur, prev, _items=tuple(items)):
            out = None
            for i, (_n, (op, k, _v)) in enumerate(_items):
                cond = {
                    "<": cur < k, "<=": cur <= k,
                    ">": cur > k, ">=": cur >= k, "=": cur == k,
                }[op]
                lit = F.lit(i)
                out = F.when(cond, lit) if out is None else out.when(cond, lit)
            return out.otherwise(F.lit(-1))

        defines = {n: (i, value) for i, (n, _spec) in enumerate(items)}
    else:
        value_cols = {v for _, v in defines.values()}
        if len(value_cols) != 1:
            raise MatchRecognizeError(
                f"DEFINEs must share one value column, got {sorted(value_cols)}"
            )
        value = value_cols.pop()
    branches: list[list[Step]] = []
    final_reluctant = False
    for branch_toks in toks:
        steps = []
        for name, lo, hi, _rel in branch_toks:
            lname = name.lower()
            key = lname
            if key not in defines and clone_map:
                base = _clone_base(lname)
                if base in clone_map and base in defines:
                    key = base  # clones share the base's DEFINE class
            if key not in defines:
                raise MatchRecognizeError(
                    f"pattern variable {name} has no DEFINE — an undefined "
                    "variable matches any row, which is out of class"
                )
            steps.append(Step(lname, defines[key][0], lo, hi))
        if branch_toks[-1][3]:
            final_reluctant = True
        branches.append(steps)
    # Adjacent steps with the SAME transition class: maximal islands
    # cannot chain within one class, but SQL:2016 greedy preferment
    # splits ONE island between the two steps with a closed form (r13 —
    # operators/pattern.match_split_pair; Trino matches `up+ up2+` by
    # splitting one ascent n−1 / 1). Served class: a SINGLE adjacent
    # pair in a plain single-branch pattern, one-row or all-rows,
    # boundary skip modes or SKIP TO NEXT ROW (r14 — the rescan routes
    # the merged pattern through match_skip_next; skip-resume targets
    # validated at the skip parse below).
    # Everything deeper — a same-class TRIPLE, two separate pairs,
    # pairs inside alternation branches / PERMUTE orderings / expanded
    # group clones / cycle bodies — keeps the r12
    # named limit: returning [] there would be silently wrong (the
    # repo-wide "clean error, not wrong answer" contract), and the
    # splits interact with no single-island closed form. Clone pairs
    # report their user-facing base names.
    split_pairs: list[int] | None = None
    for steps_b in branches:
        pair_idx = [
            i
            for i, (sa, sb) in enumerate(zip(steps_b, steps_b[1:]))
            if sa.dir == sb.dir
        ]
        if not pair_idx:
            continue
        # late r13 served several DISJOINT pairs; r14 serves runs of
        # ANY length (triples+): the single-island greedy split is
        # LEXICOGRAPHIC — c_t = min(h_t, rem − Σ later lows) — so
        # overlapping pairs (one shared island, several members) have
        # a closed form after all (match_split_pair's run merge).
        servable = (
            cycle_bounds is None
            and mid_cycle is None
            and not clone_map
            and not final_reluctant
        )
        # ALL ROWS composes with the split for free (r13): the
        # expansion and the FINAL/RUNNING measure layers read only the
        # per-step _end/_val/_len columns, which the split emits with
        # exact values — the classifier CASE then maps each row of the
        # shared island to its member by the split boundaries.
        if servable:
            if len(branches) == 1:
                split_pairs = pair_idx
            # multi-branch (r14): _compile_alternation routes branches
            # holding same-class runs through match_split_pair on the
            # shared islands frame — branches match independently, so
            # the per-branch split composes with leftmost preference
            # and the skip selection unchanged
            continue
        sa = steps_b[pair_idx[0]]
        sb = steps_b[pair_idx[0] + 1]
        na = _clone_base(sa.name)
        nb = _clone_base(sb.name)
        raise MatchRecognizeError(
            f"steps {na} and {nb} are adjacent with the same "
            "transition class — served for same-class runs of any "
            "length in a plain single-branch pattern (lexicographic "
            "greedy closed-form split, one-row or all-rows, boundary "
            "skips or SKIP TO NEXT ROW); inside alternation / PERMUTE "
            "/ groups / cycles the splits interact with the branch or "
            "repetition structure and have no single-island closed "
            "form — merge the steps into one quantified step (or give "
            "them distinct classes) — out of class"
        )
    if final_reluctant and len(branches) > 1:
        raise MatchRecognizeError(
            "a reluctant FINAL step combined with alternation is out of "
            "class (serve each branch separately)"
        )
    used = {s.name for b in branches for s in b}
    if extra := set(defines) - used:
        raise MatchRecognizeError(f"DEFINEd but not in PATTERN: {sorted(extra)}")
    # SUBSET union variables (late r11): ``SUBSET U = (A, B), …`` — in
    # this linear class every pattern variable is present in every
    # match, so a union variable resolves STATICALLY: LAST(U.col) is
    # the member latest in pattern order, COUNT(U.*) the sum of member
    # run lengths, and under ALL ROWS a row maps to U iff its
    # classifier is a member.
    subsets: dict[str, list[str]] = {}
    if "SUBSET" in clauses:
        # members validate against the UNION of branch step sets (this
        # session — SUBSET×alternation is in class: a union variable
        # resolves per winning branch in _compile_alternation)
        step_set = {s.name for b in branches for s in b}
        for item in _split_top_commas(clauses["SUBSET"]):
            m = re.fullmatch(
                r"([A-Za-z_]\w*)\s*=\s*\(\s*([A-Za-z_]\w*"
                r"(?:\s*,\s*[A-Za-z_]\w*)*)\s*\)",
                item.strip(),
            )
            if not m:
                raise MatchRecognizeError(
                    f"SUBSET {item!r}: expected U = (A, B, …)"
                )
            uname = m.group(1).lower()
            members = [x.strip().lower() for x in m.group(2).split(",")]
            if uname in step_set or uname == "strt":
                raise MatchRecognizeError(
                    f"SUBSET {m.group(1)}: union name collides with a "
                    "pattern variable"
                )
            if uname in subsets:
                raise MatchRecognizeError(f"duplicate SUBSET {m.group(1)}")
            if bad := [x for x in members if x not in step_set]:
                raise MatchRecognizeError(
                    f"SUBSET {m.group(1)}: unknown members {bad}"
                )
            subsets[uname] = members
    if len(branches) > 1:
        return _compile_alternation(
            source, part, order, value, branches, clauses, all_rows,
            classifier=clf, subsets=subsets, clone_maps=clone_maps,
        )
    if cycle_bounds is not None:
        return _compile_cycles(
            source, part, order, value, branches[0], cycle_bounds,
            clauses, all_rows, subsets, classifier=clf,
        )
    if mid_cycle is not None:
        n_pre, n_cyc, mc_lo, n_suf = mid_cycle
        lin = branches[0]
        return _compile_cycles_mid(
            source, part, order, value,
            lin[:n_pre], lin[n_pre:n_pre + n_cyc], lin[n_pre + n_cyc:],
            mc_lo, clauses, all_rows, subsets, classifier=clf,
        )
    steps = branches[0]
    # AFTER MATCH: SKIP PAST LAST ROW (Trino's default, also what an
    # omitted clause means — greedy exclusive selection,
    # operators/pattern.select_skip_past), SKIP TO LAST <any step>
    # (inclusive greedy selection resuming AT that step's final row —
    # an island boundary, so the compiled candidate set is complete),
    # SKIP TO FIRST <step_j> for j ≥ 2 (first row of step j == last
    # row of step j−1), or SKIP TO NEXT ROW (this session — the full
    # rescan match set via suffix-anchor expansion,
    # operators/pattern.match_skip_next; no greedy selection at all,
    # Trino-exact for this mode).
    after = clauses.get("AFTER MATCH")
    resume_step = None  # None → SKIP PAST LAST ROW
    skip_next = False
    if after is not None:
        s = after.strip()
        if re.fullmatch(r"SKIP\s+TO\s+NEXT\s+ROW", s, re.IGNORECASE):
            skip_next = True
        elif not re.fullmatch(r"SKIP\s+PAST\s+LAST\s+ROW", s, re.IGNORECASE):
            m = re.fullmatch(
                r"SKIP\s+TO\s+(LAST|FIRST)\s+([A-Za-z_]\w*)", s, re.IGNORECASE
            )
            names = [st.name for st in steps]
            if not m or m.group(2).lower() not in names:
                raise MatchRecognizeError(
                    f"AFTER MATCH {after!r}: SKIP PAST LAST ROW, SKIP TO "
                    "NEXT ROW, SKIP TO LAST <step>, or SKIP TO FIRST "
                    "<non-first step> over the pattern's variables are the "
                    "supported modes"
                )
            tgt = m.group(2).lower()
            if m.group(1).upper() == "LAST" and tgt in clone_map:
                # TO LAST of a grouped var = its PATTERN-last clone
                # (allocation order differs under nesting); TO FIRST
                # keeps the first clone (the base name)
                tgt = max(clone_map[tgt], key=names.index)
            j = names.index(tgt)
            if m.group(1).upper() == "FIRST":
                if j == 0:
                    raise MatchRecognizeError(
                        f"AFTER MATCH SKIP TO FIRST {m.group(2)}: the first "
                        "step begins on the match anchor — resuming there "
                        "never advances (the standard's error case)"
                    )
                resume_step = steps[j - 1].name
            else:
                resume_step = steps[j].name
    # measures → columns of the match_pattern output
    resume_mid_island = False
    if split_pairs is not None:
        # same-class pair constraints on the skip mode (r13): the
        # split places each pair's first-step end MID-island, where
        # the compiled candidate set has no anchors — only boundary
        # resume points compose. SKIP TO NEXT ROW's suffix-anchor
        # expansion would likewise need mid-island anchors.
        a_names = {steps[i].name for i in split_pairs}
        # SKIP TO NEXT ROW composes (r14 — closes the r13 named limit):
        # the merged-pair pattern routes through match_skip_next, whose
        # suffix-anchor expansion enumerates exactly the mid-island
        # anchors the rescan attempts for a pattern-first pair, and
        # each anchor's suffix re-splits independently
        # (match_split_pair(skip_next=True)).
        # skip resume ON a non-final run member (r14 — closes the
        # "skip resume ON a pair's first step" named limit): the
        # resume row lands MID-island, where the maximal candidate
        # set has no anchors — so the selection walks the
        # RESCAN-complete candidate set instead (every per-row anchor
        # from the skip_next route). The inclusive greedy walk over
        # that set IS the rescan-with-resume: the first successful
        # anchor at-or-after each resume point is kept, whether it
        # sits on an island boundary or mid-island.
        resume_mid_island = resume_step in a_names
    if skip_next:
        # the rescan-complete match set needs no selection: every
        # successful anchor IS a kept match under this mode; a
        # reluctant FINAL step composes (truncate then suffix-expand —
        # disjoint islands); same-class pairs compose through the
        # merged-step route (r14)
        try:
            if split_pairs is not None:
                matched = match_split_pair(
                    source, part, order, value, steps, classifier=clf,
                    skip_next=True,
                )
            else:
                matched = match_skip_next(
                    source, part, order, value, steps, classifier=clf,
                    reluctant_final=final_reluctant,
                )
        except ValueError as ex:
            raise MatchRecognizeError(str(ex)) from ex
    else:
        if final_reluctant:
            try:
                matched = match_reluctant_final(
                    source, part, order, value, steps, classifier=clf
                )
            except ValueError as ex:
                raise MatchRecognizeError(str(ex)) from ex
        elif split_pairs is not None:
            try:
                # mid-island resume needs the rescan-complete
                # candidate set; boundary resumes keep the (smaller)
                # maximal set — same walk either way
                matched = match_split_pair(
                    source, part, order, value, steps, classifier=clf,
                    skip_next=resume_mid_island,
                )
            except ValueError as ex:
                raise MatchRecognizeError(str(ex)) from ex
        else:
            matched = match_pattern(
                source, part, order, value, steps, classifier=clf
            )
        if resume_step is None:
            matched = select_skip_past(
                matched, part, f"anchor_{order}", f"{steps[-1].name}_end"
            )
        else:
            matched = select_skip_to(
                matched, part, f"anchor_{order}", f"{resume_step}_end"
            )
    if all_rows:
        return _project_all_rows(
            source, matched, part, order, value, steps,
            clauses["MEASURES"], subsets, clone_map=clone_map,
        )
    step_order = [s.name for s in steps]

    def measure_col(expr: str):
        if am := _MEASURE_ANCHOR.match(expr):
            col = am.group(1).lower()
            if col == order.lower():
                return F.col(f"anchor_{order}")
            if col == value.lower():
                return F.col("anchor_val")
            raise MatchRecognizeError(
                f"STRT.{am.group(1)}: only the ORDER BY ({order}) or DEFINE "
                f"value ({value}) column is available on the anchor"
            )
        if lm := _MEASURE_LAST.match(expr):
            step_name, col = lm.group(1).lower(), lm.group(2).lower()
            if step_name in subsets:
                # union variable: in this linear class every member is
                # present, so LAST is the member latest in pattern
                # order — members expand through the clone map first
                # (r12: SUBSET over inline repeated groups), so a
                # grouped member's final CLONE can win the ordering
                members = [
                    c
                    for mname in subsets[step_name]
                    for c in clone_map.get(mname, [mname])
                ]
                step_name = max(members, key=step_order.index)
            if step_name in clone_map:
                # grouped variable: LAST reads its PATTERN-last clone
                # (the final repetition), per SQL:2016 last-mapped-row
                # semantics; pattern order, since nested expansion
                # allocates clones out of positional order
                step_name = max(clone_map[step_name], key=step_order.index)
            if step_name not in step_order:
                raise MatchRecognizeError(f"LAST({lm.group(1)}.…): unknown step")
            if col == order.lower():
                return F.col(f"{step_name}_end")
            if col == value.lower():
                return F.col(f"{step_name}_val")
            raise MatchRecognizeError(
                f"LAST({lm.group(1)}.{lm.group(2)}): only the ORDER BY or "
                "DEFINE value column is carried per step"
            )
        if cm := _MEASURE_COUNT.match(expr):
            step_name = cm.group(1).lower()
            if step_name in subsets:
                out = None
                # members expand through the clone map (r12): COUNT of
                # a union containing a grouped member sums EVERY
                # clone's run length
                for mname in subsets[step_name]:
                    for cname in clone_map.get(mname, [mname]):
                        c = F.col(f"{cname}_len")
                        out = c if out is None else out + c
                return out.cast("bigint")
            if step_name in clone_map:
                # grouped variable: COUNT sums every clone's run length
                out = None
                for cname in clone_map[step_name]:
                    c = F.col(f"{cname}_len")
                    out = c if out is None else out + c
                return out.cast("bigint")
            if step_name not in step_order:
                raise MatchRecognizeError(f"COUNT({cm.group(1)}.*): unknown step")
            return F.col(f"{step_name}_len")
        raise MatchRecognizeError(
            f"measure {expr!r} is out of class (compose arithmetic over "
            "aliased measures in the outer SELECT instead)"
        )

    out_cols = [F.col(part)]
    for item in _split_top_commas(clauses["MEASURES"]):
        mm = re.fullmatch(r"(.+?)\s+AS\s+([A-Za-z_]\w*)", item.strip(),
                          re.IGNORECASE | re.DOTALL)
        if not mm:
            raise MatchRecognizeError(f"measure {item!r} needs an AS alias")
        out_cols.append(measure_col(mm.group(1).strip()).alias(mm.group(2)))
    return matched.select(*out_cols)


def rewrite_match_recognize(spark: SparkSession, query: str) -> str:
    """Replace every ``FROM <table> MATCH_RECOGNIZE (…) [AS alias]``
    fragment with a temp view holding the compiled relation; the rest
    of the statement is untouched Spark SQL. Returns the rewritten
    query (identity when no clause is present)."""
    while True:
        m = _MR_FROM.search(query)
        if m is None:
            return query
        table = m.group(1)
        end = _balanced_span(query, m.end() - 1)
        body = query[m.end(): end - 1]
        df = compile_match_recognize(spark, spark.table(table), body)
        _VIEW_SEQ[0] += 1
        view = f"walden_mr_{_VIEW_SEQ[0]}"
        df.createOrReplaceTempView(view)
        rest = query[end:]
        alias = _ALIAS.match(rest)
        keep_alias = ""
        if alias and alias.group(1).upper() not in (
            "WHERE", "GROUP", "ORDER", "LIMIT", "HAVING", "UNION", "JOIN",
            "LEFT", "RIGHT", "FULL", "CROSS", "INNER", "ON", "QUALIFY",
        ):
            keep_alias = f" AS {alias.group(1)}"
            rest = rest[alias.end():]
        query = f"{query[:m.start()]}FROM {view}{keep_alias}{rest}"
