"""Row-set comparison helpers (mirror of the driver's order-insensitive
value comparison; see tools/parity.py)."""

from __future__ import annotations

import math


def norm_cell(v):
    if v is None:
        return "\0NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "\0NaN"
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("\x01".join(norm_cell(r[i]) for i in order) for r in rows)


def assert_df_equal(df_a, df_b):
    """Order-insensitive exact equality of two DataFrames."""
    assert sorted(df_a.columns) == sorted(df_b.columns)
    ra = [tuple(r) for r in df_a.collect()]
    rb = [tuple(r) for r in df_b.collect()]
    assert canon(ra, df_a.columns) == canon(rb, df_b.columns)
