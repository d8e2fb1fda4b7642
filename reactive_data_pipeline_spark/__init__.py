"""reactive_data_pipeline_spark: a PySpark-native analytics engine with
the capabilities of yothinix/reactive_data_pipeline (reference studied at
/root/reference; see SURVEY.md for the operator-by-operator mapping).

Layers:

* :mod:`.session`   - configured SparkSession factory (S7)
* :mod:`.schemas`   - explicit StructType registry (section 1)
* :mod:`.sources`   - parquet batch/stream readers + append sinks (S3-S6)
* :mod:`.operators` - relational core: project/filter/agg/sort/join/asof
* :mod:`.functions` - scalar & higher-order functions (datetime/json/text/vectors)
* :mod:`.queries`   - the named, oracle-checked query catalog
* :mod:`.streaming` - the reactive layer (R1-R7) on Structured Streaming
* :mod:`.dedup` / :mod:`.similarity` / :mod:`.multimodal` - LLM-pipeline operators
"""

from .session import get_spark
from . import jobs

__all__ = ["get_spark", "jobs"]
__version__ = "0.1.0"
