"""Python UDTFs (SURVEY.md §2.B.9) — Spark 4's table-valued python
functions: one input row -> many output rows, the python-snap analogue
of snapflow functions that emit multiple records per input
[P snapflow/core/function.py].

For array-shaped expansion prefer ``explode`` (JVM, codegen); a UDTF
is for row-generation logic that needs python (stateful parsing,
generators). Registered per-session because UDTF registration needs an
active SparkSession.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")


@udtf(returnType="sent_idx int, sentence string")
class SplitSentences:
    """text -> one row per sentence (index, text). The UDTF runs
    Arrow-batched like pandas UDFs; each worker holds the compiled
    regex once."""

    def eval(self, text: str):  # noqa: A002
        if not text:
            return
        for i, s in enumerate(_SENT_SPLIT.split(text.strip())):
            if s:
                yield i, s


@udtf(returnType="tok_idx int, token string")
class SplitTokens:
    """text -> one row per single-space-delimited token (index,
    token), matching ``F.split(col, ' ')`` element-for-element
    (python ``str.split(' ')`` has the same empty-string and
    consecutive-delimiter semantics) — so a LATERAL join over this
    UDTF re-derives exactly what the array-expression form computes,
    which is what q_scalar_array's 'lateral' branch hash-proves."""

    def eval(self, text: str):  # noqa: A002
        if text is None:
            return
        for i, t in enumerate(text.split(" ")):
            yield i, t


def register_udtfs(spark: SparkSession) -> None:
    """Expose UDTFs to SQL: ``SELECT s.* FROM docs, LATERAL
    split_sentences(text) s`` — the SQL-snap form of a row-generating
    python snap. Idempotent per session (re-registration replaces)."""
    spark.udtf.register("split_sentences", SplitSentences)
    spark.udtf.register("split_tokens", SplitTokens)
