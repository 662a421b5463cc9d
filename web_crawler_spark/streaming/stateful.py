"""Custom stateful streaming operator: the per-host politeness gate.

``politeness_gate`` is the streaming twin of the batch per-host budget
window (politeness.select_per_host): a stream of fetch candidates is
group-limited per host with a **running count held in GroupState** — the
``applyInPandasWithState`` pattern for operators Structured Streaming's
built-in aggregations can't express (a budget consumes state across
micro-batches, not per window).

Semantics: per host, admit candidates in (ts, url) order until the host's
lifetime budget is exhausted; everything beyond is dropped (a production
variant would route the overflow to a deferred topic — same operator shape,
different sink). Deterministic for a given input: per-batch rows are sorted
inside the state function, and the running count makes admission
order-stable across batches.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

GATE_OUTPUT = StructType(
    [
        StructField("host", StringType(), False),
        StructField("url", StringType(), False),
        StructField("ts", TimestampType(), True),
        StructField("admitted_seq", IntegerType(), False),
    ]
)

GATE_STATE = StructType([StructField("n_admitted", LongType(), False)])


def politeness_gate(candidates: DataFrame, budget_per_host: int) -> DataFrame:
    """Admit at most ``budget_per_host`` rows per host across the stream.

    ``candidates`` is a *streaming* DataFrame with (host, url, ts) columns.
    Returns the admitted rows with their per-host admission sequence.
    """

    def gate(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        (n_admitted,) = state.get if state.exists else (0,)
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "url"], kind="mergesort")
        remaining = budget_per_host - n_admitted
        take = batch.iloc[: max(remaining, 0)].copy()
        if len(take):
            take["admitted_seq"] = range(
                int(n_admitted) + 1, int(n_admitted) + len(take) + 1
            )
            take["host"] = host
        state.update((int(n_admitted) + len(take),))
        yield take[["host", "url", "ts", "admitted_seq"]] if len(take) else pd.DataFrame(
            {"host": [], "url": [], "ts": [], "admitted_seq": []}
        )

    return candidates.groupBy("host").applyInPandasWithState(
        gate,
        outputStructType=GATE_OUTPUT,
        stateStructType=GATE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
