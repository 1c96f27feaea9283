"""Custom stateful streaming operators (SURVEY.md §2.B.10 "stateful
custom op" row) via ``applyInPandasWithState``.

Snapflow's accumulator-style snaps keep arbitrary python state across
incremental runs [P snapflow/modules/core/functions/accumulator]; the
Structured Streaming analogue is a per-key state store surviving
micro-batches. State here is bounded per key (a handful of floats), so
an infinite stream holds O(#keys) state, and timeouts can retire idle
keys at 100 TB/day arrival rates.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = "user_id bigint, n_events bigint, total double, ewma double"
STATE_SCHEMA = "n bigint, total double, ewma double"


def running_user_stats(
    stream: DataFrame,
    key: str = "user_id",
    value: str = "value",
    alpha: float = 0.2,
) -> DataFrame:
    """Per-key running count / sum / EWMA across micro-batches — the
    canonical custom-state op no built-in aggregation expresses (EWMA
    is order- and history-dependent). Emits one updated row per key
    per micro-batch."""

    def update(
        key_tuple: Any, batches: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (uid,) = key_tuple
        if state.exists:
            n, total, ewma = state.get
        else:
            n, total, ewma = 0, 0.0, None
        for pdf in batches:
            for v in pdf[value]:
                n += 1
                total += float(v)
                ewma = float(v) if ewma is None else alpha * float(v) + (1 - alpha) * ewma
        state.update((n, total, ewma))
        yield pd.DataFrame(
            {"user_id": [uid], "n_events": [n], "total": [total], "ewma": [ewma]}
        )

    return stream.groupBy(key).applyInPandasWithState(
        update,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_stats_tws(
    stream: DataFrame,
    key: str = "user_id",
    value: str = "value",
    alpha: float = 0.2,
) -> DataFrame:
    """The SAME operator on Spark 4's transformWithStateInPandas — the
    successor API (typed per-key state handles, state schema evolution,
    timers). Kept alongside the applyInPandasWithState form so both
    stateful surfaces are covered; semantics are identical and the
    parity test runs wherever the runtime supports it.

    RUNTIME REQUIREMENT: Spark's TWS state-server protocol needs
    ``google.protobuf``, which this sandbox does not ship — the
    import guard below raises a clear error here and is a no-op on
    any normal cluster (protobuf is a stock Spark dependency)."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas requires google.protobuf (Spark's "
            "TWS state-server protocol); use running_user_stats "
            "(applyInPandasWithState) in environments without it"
        ) from e
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("stats", STATE_SCHEMA)

        def handleInputRows(self, key_tuple, rows, timerValues):
            (uid,) = key_tuple
            if self._state.exists():
                n, total, ewma = self._state.get()
            else:
                n, total, ewma = 0, 0.0, None
            for pdf in rows:
                for v in pdf[value]:
                    n += 1
                    total += float(v)
                    ewma = (
                        float(v) if ewma is None else alpha * float(v) + (1 - alpha) * ewma
                    )
            self._state.update((n, total, ewma))
            yield pd.DataFrame(
                {"user_id": [uid], "n_events": [n], "total": [total], "ewma": [ewma]}
            )

        def close(self) -> None:
            pass

    return stream.groupBy(key).transformWithStateInPandas(
        RunningStats(),
        outputStructType=RUNNING_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
