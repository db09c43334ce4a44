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

    def _ordkey(ts: object, seq: int) -> tuple:
        # batch LWW ordering: nulls-smallest on ts, seq tie-break
        t = pd.Timestamp.min if ts is None or pd.isna(ts) else pd.Timestamp(ts)
        return (t, seq)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st_ts, st_seq = state.get
            best = _ordkey(st_ts, st_seq)
        else:
            best = None
        best_row = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            # vectorized winner of this chunk: lexicographic (ts, seq)
            # with nulls smallest — a null-ts row wins only if the chunk
            # holds nothing else, matching the batch fold's
            # nulls-smallest ordering (pandas sort_values alone would
            # place NaT LAST and wrongly crown it)
            nn = pdf.dropna(subset=[ts_col])
            if not nn.empty:
                idx = (
                    nn[[ts_col, seq_col]]
                    .sort_values([ts_col, seq_col])
                    .index[-1]
                )
            else:
                idx = pdf[seq_col].sort_values().index[-1]
            cand = pdf.loc[idx]
            cand_key = _ordkey(cand[ts_col], int(cand[seq_col]))
            if best is None or cand_key > best:
                best = cand_key
                best_row = pdf.loc[[idx]]
        if best_row is not None:
            won_ts = best_row.iloc[0][ts_col]
            state.update((
                None if pd.isna(won_ts) else pd.Timestamp(won_ts).to_pydatetime(),
                int(best[1]),
            ))
            yield best_row

    grouped = stream.groupBy(key_col)
    return grouped.applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
