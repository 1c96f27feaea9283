"""Import all query modules so the registry is fully populated."""

from snapflow_spark.queries import aggregates, relational, setops  # noqa: F401
