"""Custom stateful streaming operators via Arrow-batched
``applyInPandasWithState`` (north-star streaming surface; the
reference has no custom state at all — SURVEY.md §2.8 'not present').

``running_user_totals`` keeps a per-key (count, sum) accumulator in the
state store and emits the updated totals every micro-batch — the
building block for running leaderboards without recomputing windows.
On Spark 4 the same shape could move to ``transformWithStateInPandas``
(ValueState + timers), but in this environment its Python driver
worker exits unexpectedly even with the RocksDB state store provider
(probed 2026-08; "TransformWithStateInPySpark driver worker exited
unexpectedly"), so ``applyInPandasWithState`` — stable since 3.4 — is
the supported custom-state path here.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_OUTPUT = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("total_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def running_user_totals(
    df: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Cumulative per-key (count, sum) across micro-batches.

    State is O(keys); each batch shuffles only its own rows to the
    key's state partition — no window recomputation, no growing state
    per event.
    """

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, round(total, 6)))
        yield pd.DataFrame(
            {"key": [str(key[0])], "total_events": [n], "total_value": [round(total, 6)]}
        )

    return df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=RUNNING_TOTALS_OUTPUT,
        stateStructType=_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
