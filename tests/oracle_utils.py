"""DuckDB-differential comparison mirroring the driver's correctness gate:
row count + (loose) schema + order-insensitive value compare, with
columns sorted by name before comparison."""

from __future__ import annotations

import datetime
import decimal
import math


def canonicalize(cell):
    if isinstance(cell, decimal.Decimal):
        return float(cell)
    if isinstance(cell, float):
        return cell
    if isinstance(cell, datetime.datetime):
        return cell.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(cell, datetime.date):
        return cell.isoformat()
    if isinstance(cell, (list, tuple)):
        return tuple(canonicalize(x) for x in cell)
    if isinstance(cell, dict):
        return tuple(sorted((k, canonicalize(v)) for k, v in cell.items()))
    if hasattr(cell, "asDict"):  # pyspark Row (struct)
        return tuple(sorted((k, canonicalize(v)) for k, v in cell.asDict().items()))
    if isinstance(cell, bytes):
        return cell.hex()
    return cell


def _sort_key(row):
    return tuple((x is None, str(x)) for x in row)


def frame_to_rows(cols, rows):
    """Sort columns by name, canonicalize cells, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canonicalize(r[i]) for i in order) for r in rows]
    out.sort(key=_sort_key)
    return [cols[i] for i in order], out


def cells_equal(a, b, rel=1e-9):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, bool) or isinstance(b, bool):
        return bool(a) == bool(b)
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        if fa == fb:
            return True
        return abs(fa - fb) <= rel * max(abs(fa), abs(fb))
    if isinstance(a, (int,)) and isinstance(b, (int,)):
        return a == b
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(cells_equal(x, y, rel) for x, y in zip(a, b))
    return a == b


def compare_results(spark_df, duck_rel, strict_float=True):
    """Returns (ok, message). strict_float=True demands bit-identical
    floats (what the driver's value-hash effectively requires)."""
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols = [d[0] for d in duck_rel.description]
    d_rows = duck_rel.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count: spark={len(s_rows)} duck={len(d_rows)}"

    _, s_canon = frame_to_rows(s_cols, s_rows)
    _, d_canon = frame_to_rows(d_cols, d_rows)
    rel = 0.0 if strict_float else 1e-9
    for i, (sr, dr) in enumerate(zip(s_canon, d_canon)):
        for j, (sc, dc) in enumerate(zip(sr, dr)):
            if not cells_equal(sc, dc, rel):
                return False, (
                    f"value mismatch at sorted-row {i} col {sorted(s_cols)[j]}: "
                    f"spark={sc!r} duck={dc!r}"
                )
    return True, "ok"
