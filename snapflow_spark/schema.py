"""Declarative Schema specs — snapflow's commonmodel parity layer
(SURVEY.md §1.1/§1.2 [P kvh/common-model schema.py]).

A commonmodel Schema declares fields (name+type), ``unique_on`` (the
natural key), and ``implementations`` (how another schema's fields map
onto this one). On Spark those become, respectively: a StructType /
DDL string, the key config for dedupe_keep_latest, and a
schema_translate projection. This module keeps the *declaration*
(portable, data-free) separate from execution (plain DataFrame ops).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from snapflow_spark.operators.dedupe import dedupe_keep_latest
from snapflow_spark.operators.schema_translate import schema_translate


@dataclass(frozen=True)
class Relation:
    """FK-style relation declaration (commonmodel `relations` parity):
    this schema's rows point at one/many rows of ``schema`` via the
    ``on`` field mapping (local field -> remote field)."""

    schema: str
    on: dict[str, str]
    cardinality: str = "many_to_one"  # or "one_to_many"


@dataclass(frozen=True)
class SchemaSpec:
    """fields: name -> Spark type DDL ("bigint", "string", ...).
    unique_on: natural-key columns (drives conform-time dedupe).
    latest_by: ordering column for keep-latest (required if unique_on).
    implementations: other-schema name -> (target field -> source expr).
    relations: relation name -> Relation (FK declarations compiled to
    join builders by ``join_relation``)."""

    name: str
    fields: dict[str, str]
    unique_on: list[str] = field(default_factory=list)
    latest_by: str | None = None
    implementations: dict[str, dict[str, str]] = field(default_factory=dict)
    relations: dict[str, Relation] = field(default_factory=dict)

    @property
    def ddl(self) -> str:
        return ", ".join(f"{n} {t}" for n, t in self.fields.items())

    @property
    def struct_type(self) -> StructType:
        return StructType.fromDDL(self.ddl)

    def conform(self, df: DataFrame, from_schema: str | None = None) -> DataFrame:
        """Make ``df`` a valid block of this schema:
        1. translate via the ``implementations`` mapping (if coming
           from another schema), else select declared fields;
        2. cast every field to its declared type;
        3. enforce ``unique_on`` by keep-latest over ``latest_by``.
        All three stages are pure projections/one window — Catalyst
        folds 1+2 into the scan."""
        if from_schema is not None:
            mapping = self.implementations[from_schema]
            df = schema_translate(
                df,
                {tgt: F.expr(src) for tgt, src in mapping.items()},
                casts=self.fields,
            )
        else:
            df = df.select(
                *[F.col(n).cast(t).alias(n) for n, t in self.fields.items()]
            )
        if self.unique_on:
            if not self.latest_by:
                raise ValueError(f"schema {self.name}: unique_on needs latest_by")
            df = dedupe_keep_latest(df, self.unique_on, [self.latest_by])
        return df

    def join_relation(
        self,
        df: DataFrame,
        relation: str,
        target: DataFrame,
        how: str = "left",
        broadcast: bool | None = None,
        prefix: str | None = None,
    ) -> DataFrame:
        """Compile a declared relation into the join it denotes:
        equi-join on the declared field mapping, target columns
        prefixed (default ``<relation>_``) so nothing collides.

        ``broadcast=None`` resolves by cardinality: a many_to_one
        relation is a dimension lookup, so the target ships to every
        executor and the (large) fact side never shuffles — the right
        default at any scale. one_to_many targets are fact-sized and
        shuffle-join under AQE instead."""
        rel = self.relations[relation]
        prefix = f"{relation}_" if prefix is None else prefix
        renamed = target.select(
            *[F.col(c).alias(f"{prefix}{c}") for c in target.columns]
        )
        if broadcast is None:
            broadcast = rel.cardinality == "many_to_one"
        if broadcast:
            renamed = F.broadcast(renamed)
        cond = None
        for local, remote in rel.on.items():
            clause = df[local] == renamed[f"{prefix}{remote}"]
            cond = clause if cond is None else cond & clause
        return df.join(renamed, cond, how)

    def validate(self, df: DataFrame) -> list[str]:
        """Structural check: missing/mistyped columns (no data pass)."""
        have = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        problems = []
        for n, t in self.fields.items():
            if n not in have:
                problems.append(f"missing column {n}")
            elif have[n] != StructType.fromDDL(f"x {t}")[0].dataType.simpleString():
                problems.append(f"column {n}: expected {t}, got {have[n]}")
        return problems
