"""Scalar / higher-order function layer (SURVEY.md section 2.8).

Everything here is built from ``pyspark.sql.functions`` - JVM-side,
codegen-friendly. No row-at-a-time Python UDFs exist in this package; the
only Arrow/pandas UDFs in the engine live in :mod:`..multimodal` and the
rolling-hash fingerprint, where no built-in composition exists.
"""

from .datetime_ops import bangkok_day, partition_key
from .json_ops import props_int
from .vectors import dot, l2_norm, cosine
from . import text

__all__ = [
    "bangkok_day",
    "partition_key",
    "props_int",
    "dot",
    "l2_norm",
    "cosine",
    "text",
]
