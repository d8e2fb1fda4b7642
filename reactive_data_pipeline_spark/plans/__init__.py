"""Physical-plan inspection helpers.

The engine relies on Catalyst for every optimization the reference
delegated to SQLite (SURVEY.md section 4). These helpers let tests and
benchmarks *assert* that the expected physical properties actually hold -
pushed filters, broadcast joins, top-k as TakeOrderedAndProject, no
cartesian products - instead of hoping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def plan_has(df: DataFrame, fragment: str) -> bool:
    return fragment in physical_plan(df)


def assert_plan(df: DataFrame, *, contains: tuple[str, ...] = (), absent: tuple[str, ...] = ()) -> None:
    plan = physical_plan(df)
    for frag in contains:
        assert frag in plan, f"expected {frag!r} in physical plan:\n{plan}"
    for frag in absent:
        assert frag not in plan, f"unwanted {frag!r} in physical plan:\n{plan}"
