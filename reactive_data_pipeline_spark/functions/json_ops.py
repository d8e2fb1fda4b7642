"""JSON functions over the ``events.props`` JSON-string column.

The reference has no JSON surface (its REST payload is projected in
Python, ``ops.py:18-28``); the driver testdata's ``props`` column
motivates ``get_json_object``/``from_json`` coverage (SURVEY.md
section 2.8).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def props_int(props: Column | str, key: str) -> Column:
    """Extract an integer field from a JSON-string column (JVM-side)."""
    props = F.col(props) if isinstance(props, str) else props
    return F.get_json_object(props, f"$.{key}").cast("long")
