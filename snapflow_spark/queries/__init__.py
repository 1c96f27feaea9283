"""Import all query modules so the registry is fully populated."""

from snapflow_spark.queries import (  # noqa: F401
    aggregates,
    framework,
    northstar,
    relational,
    scalars,
    setops,
    streaming_q,
    udfs,
    windows,
)
