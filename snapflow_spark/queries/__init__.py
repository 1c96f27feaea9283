"""Import all query modules so the registry is fully populated."""

from snapflow_spark.queries import (  # noqa: F401
    aggregates,
    framework,
    relational,
    scalars,
    setops,
    udfs,
    windows,
)
