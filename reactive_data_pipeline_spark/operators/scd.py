"""Slowly-changing-dimension (type 2) interval construction.

Shared by the batch catalog query (`queries/etl.py::scd2_user_tier_dim`)
and the streaming incremental maintainer (`streaming/scd2.py`), so the
two paths are the same code - the stream==batch hash contract then
checks the MERGE machinery, not a reimplementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Observation schema: (key, seq, ts_us, attr) - integer-exact so the
#: lag/lead/row_number pipeline is bit-identical in any engine.
OBS_COLS = ("user_id", "event_id", "ts_us", "tier")


def scd2_intervals(obs: DataFrame, keep_event_id: bool = False) -> DataFrame:
    """Change-point compression of an observation stream into type-2
    validity intervals.

    Input: (user_id, event_id, ts_us, tier). Output: one row per change
    with (user_id, version, tier, valid_from_us, valid_to_us,
    is_current) - ``valid_to_us`` NULL on each user's open interval.
    Total order within a user is (ts_us, event_id), so ties are
    deterministic.

    Scale: one hash exchange on user_id feeds the change-detect lag,
    the closure lead, and the version row_number (Catalyst reuses the
    sort). Idempotent by construction: the output rows, fed back in AS
    observations (change points are a subsequence of the input with no
    consecutive equal tiers), reproduce themselves - the property the
    streaming merge relies on.
    """
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = obs.withColumn(
        "__chg",
        F.when(~F.lag("tier").over(w).eqNullSafe(F.col("tier")), 1).otherwise(0),
    )
    changes = flagged.filter(F.col("__chg") == 1)
    wc = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    cols = [
        F.col("user_id"),
        F.row_number().over(wc).cast("long").alias("version"),
        F.col("tier"),
        F.col("ts_us").alias("valid_from_us"),
        F.lead("ts_us").over(wc).alias("valid_to_us"),
    ]
    if keep_event_id:
        cols.append(F.col("event_id"))
    return changes.select(*cols).withColumn(
        "is_current", F.col("valid_to_us").isNull()
    )
