"""Custom operators built as compositions of Spark primitives.

The reference implements physical operators by hand (PostgresExec,
DatabaseExec — SURVEY §2A); in the Spark-first rebuild, operators the
platform lacks are expressed as compositions of DataFrame primitives
(temporal.py: as-of join, range join) so Catalyst/Tungsten still own
execution.
"""

from .bucketing import bucketed_join, write_bucketed  # noqa: F401
from .skew import salted_agg, salted_join  # noqa: F401
from .temporal import asof_join, range_count  # noqa: F401
