"""Custom stateful streaming operator: incremental LWW change feed via
``applyInPandasWithState``.

The batch engine folds each micro-batch and lets the lake's MoR merge
resolve across batches; this operator instead keeps the per-key winner
**in streaming state**, so each micro-batch emits only the keys whose
winner CHANGED — a change-data-feed of state transitions (at most one
row per key per batch), the shape downstream incremental consumers
want. Covers the custom-stateful-operator surface of SURVEY §2.7 that
foreachBatch/windowed aggregation don't.

State per key: the winning ``(ts, seq)`` so far. An arriving event wins
iff its ``(ts, seq)`` is strictly larger — identical ordering to
``operators/lww.py`` (largest-writetime-wins, seq tie-break;
``PKFactory.java:114-125``, ``WritetimeTTL.java:235-258``).

Python boundary is Arrow-batched (pandas per key-group); the per-group
work is a vectorized idxmax, not a row loop.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("best_ts", T.TimestampType()),
        T.StructField("best_seq", T.LongType()),
    ]
)


def stateful_lww_updates(
    stream: DataFrame,
    key_col: str = "url",
    ts_col: str = "warc_ts",
    seq_col: str = "seq",
) -> DataFrame:
    """Per-key LWW state machine over a (possibly streaming) DataFrame.

    Emits, for each micro-batch, the keys whose winner improved, with
    the full winning row ("update" output mode). Works identically on a
    batch DataFrame (one "batch" = the whole input).
    """
    out_schema = stream.schema

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            best_ts, best_seq = state.get
            best_ts = pd.Timestamp(best_ts)
        else:
            best_ts, best_seq = None, None
        best_row = None
        for pdf in pdfs:
            # null-ts rows can never win (batch LWW orders nulls smallest;
            # pandas sort_values would place NaT LAST and crown it)
            pdf = pdf.dropna(subset=[ts_col])
            if pdf.empty:
                continue
            # vectorized winner of this chunk: lexicographic (ts, seq)
            idx = (
                pdf[[ts_col, seq_col]]
                .sort_values([ts_col, seq_col])
                .index[-1]
            )
            cand = pdf.loc[idx]
            cand_key = (pd.Timestamp(cand[ts_col]), int(cand[seq_col]))
            if best_ts is None or cand_key > (best_ts, best_seq):
                best_ts, best_seq = cand_key
                best_row = pdf.loc[[idx]]
        if best_row is not None:
            state.update((best_ts.to_pydatetime(), int(best_seq)))
            yield best_row

    grouped = stream.groupBy(key_col)
    return grouped.applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
