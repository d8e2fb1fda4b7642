"""Cogrouped-pandas operators: ``groupBy().cogroup().applyInPandas``.

The JVM union-window as-of join (operators.joins.asof_join) is the
default path; this module carries the same semantics through Spark's
cogroup API - the escape hatch for per-key merge logic the built-in
operators can't express (custom interpolation, per-key model scoring,
bounded-memory merges of two sorted sides). The as-of twin exists so the
cogroup path is pinned by the SAME DuckDB oracle as the JVM one
(queries/llm2.py::asof_cogroup_pandas).

Scale shape: cogroup shuffles BOTH sides once on the key - identical
exchange count to the JVM asof - then streams each key's two Arrow
batches into pandas. Memory per task is bounded by the largest single
key (same bound as any window over the key); skewed keys want salting
upstream, exactly like the window path.

Two sharp edges this module defends against (both found by the oracle
gate, both silent-wrong-answer territory):

* SELF-cogroup column pruning: when both sides derive from the same
  source DataFrame, their columns share expression IDs; Catalyst's
  column pruning under a downstream Project/Filter then drops
  right-side columns the UDF references through the left's IDs, and the
  pandas function receives a right frame MISSING columns (observed:
  right ``ts`` pruned away => every group looked right-empty). Fix:
  re-alias every column of both sides to unique temp names (fresh
  exprIds) before the cogroup, and map back inside the pandas function.
* Arrow schema consistency: every batch the pandas function returns
  must carry identically-TYPED columns. An all-``None`` object column
  infers as Arrow null-type and poisons the stream for the whole task,
  nondeterministically (whichever group serializes first wins). Null
  columns are materialized with explicit dtypes instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join_cogroup(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    suffix: str = "_r",
) -> DataFrame:
    """Backward as-of join via cogrouped ``applyInPandas``: for each left
    row, the latest right row with the same key and ``right_ts <=
    left_ts``. Output schema = left columns + right payload columns
    (key excluded; names colliding with left columns get ``suffix``),
    matching operators.joins.asof_join.
    """
    import numpy as np
    import pandas as pd

    lcols = list(left.columns)
    rcols = list(right.columns)
    rpayload = [c for c in rcols if c != on]
    out_names = lcols + [(f"{c}{suffix}" if c in lcols else c) for c in rpayload]
    final_r = {c: (f"{c}{suffix}" if c in lcols else c) for c in rpayload}

    l_schema = {f.name: f.dataType.simpleString() for f in left.schema.fields}
    r_schema = {f.name: f.dataType.simpleString() for f in right.schema.fields}
    ddl = ", ".join(
        [f"`{c}` {l_schema[c]}" for c in lcols]
        + [f"`{final_r[c]}` {r_schema[c]}" for c in rpayload]
    )

    # Unique temp names = fresh expression IDs on both sides, so a
    # self-cogroup can't alias across sides (see module docstring).
    l2 = left.select([F.col(c).alias(f"__l_{c}") for c in lcols])
    r2 = right.select([F.col(c).alias(f"__r_{c}") for c in rcols])

    def _null_series(simple_type: str, n: int) -> "pd.Series":
        # decimal payloads are NOT covered (object dtype would re-open
        # the null-type hazard); cast decimals to double/long before an
        # as-of cogroup, as every catalog caller does.
        if simple_type.startswith("timestamp"):
            return pd.Series([pd.NaT] * n, dtype="datetime64[ns]")
        if simple_type in ("double", "float"):
            return pd.Series([np.nan] * n, dtype="float64")
        if simple_type in ("bigint", "int", "smallint", "tinyint"):
            return pd.Series([None] * n, dtype="Int64")
        if simple_type == "boolean":
            return pd.Series([None] * n, dtype="boolean")
        if simple_type == "string":
            return pd.Series([None] * n, dtype="string")
        return pd.Series([None] * n, dtype="object")

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if len(lpdf) == 0:
            # right-only key: as-of LEFT join emits nothing (typed).
            empty = {c: _null_series(l_schema[c], 0) for c in lcols}
            for c in rpayload:
                empty[final_r[c]] = _null_series(r_schema[c], 0)
            return pd.DataFrame(empty)
        lpdf = lpdf.rename(columns={f"__l_{c}": c for c in lcols}).sort_values(
            left_ts, kind="mergesort"
        )
        if len(rpdf) == 0 or f"__r_{right_ts}" not in rpdf.columns:
            # genuinely left-only key: typed null payload columns.
            merged = lpdf.copy()
            for c in rpayload:
                merged[final_r[c]] = _null_series(r_schema[c], len(merged)).values
            return merged[out_names]
        # Right columns go straight to their FINAL names: merge_asof
        # would silently drop a right key column that collides with a
        # left column instead of suffixing it.
        rpdf = (
            rpdf[[f"__r_{c}" for c in rpayload]]
            .rename(columns={f"__r_{c}": final_r[c] for c in rpayload})
            .sort_values(final_r[right_ts], kind="mergesort")
        )
        merged = pd.merge_asof(
            lpdf,
            rpdf,
            left_on=left_ts,
            right_on=final_r[right_ts],
            direction="backward",
        )
        return merged[out_names]

    return (
        l2.groupBy(f"__l_{on}")
        .cogroup(r2.groupBy(f"__r_{on}"))
        .applyInPandas(merge, schema=ddl)
    )
