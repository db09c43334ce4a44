"""Point-in-time (as-of) join — a custom operator Spark lacks.

For every left row, attach the columns of the LATEST right row with
``right.ts <= left.ts`` for the same key (inclusive), or nulls if no
prior right row exists — the "state as of event time" lookup a CDC
lake needs for point-in-time queries (reference analog: none; CDM has
no joins beyond PK point lookups, SURVEY §2.3).

Implementation is the union-merge shape, NOT a range join:

* tag both sides, union on an aligned schema,
* one shuffle on the key, one sort by ``(ts, side)`` (right rows sort
  BEFORE left rows at equal ts => inclusive semantics),
* carry the matched right row forward as ONE struct with
  ``last(..., ignorenulls=True)`` over an unbounded-preceding running
  window — the struct is non-null whenever a match exists, so right
  rows whose payload columns are themselves NULL still match (exactly
  DuckDB ASOF LEFT JOIN semantics),
* keep the left rows.

Cost is one shuffle + sort of |L| + |R| rows — linear, skew-bounded by
the key distribution. A naive ``l.ts >= r.ts`` range join explodes to
|L|x|R| per key before its per-row argmax; the window form never
materializes a pair.

The right side must be unique per ``(key, ts)`` — pre-collapse ties
(e.g. keep the max-seq row) before calling, as the oracle's ASOF JOIN
demands the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    carry_cols: dict[str, str],
    carry_ts_as: str | None = None,
) -> DataFrame:
    """As-of join: left rows + the latest right row at-or-before each
    left row's ``ts_col`` per key.

    ``carry_cols`` maps right-side column -> output column name;
    ``carry_ts_as`` optionally emits the matched right row's timestamp.
    """
    match_struct = F.struct(
        F.col(ts_col).alias("_ts"),
        *[F.col(src).alias(dst) for src, dst in carry_cols.items()],
    )
    r = right.select(
        *key_cols, F.col(ts_col), match_struct.alias("_m")
    ).withColumn("_side", F.lit(0))
    l = left.withColumn("_side", F.lit(1))
    unioned = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("_mm", F.last("_m", ignorenulls=True).over(w))
    return matched.where(F.col("_side") == 1).select(
        *left.columns,
        *([F.col("_mm")["_ts"].alias(carry_ts_as)] if carry_ts_as else []),
        *[F.col("_mm")[dst].alias(dst) for dst in carry_cols.values()],
    )


def state_diff(
    ev: DataFrame,
    key_col: str,
    ts_col: str,
    seq_col: str,
    t1: str,
    t2: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Snapshot diff between two points in time over a changelog: for
    every key, compare the LWW winner at ``t1`` against the winner at
    ``t2`` and classify the key ADDED / REMOVED / CHANGED / UNCHANGED
    (a winner whose op is ``delete_op`` counts as absent) — the
    CDC-native "what changed between these two snapshots" report
    (reference analog: DiffData compares origin vs target the same
    four-way, /root/reference/src/main/java/com/datastax/cdm/job/
    DiffJobSession.java; here both sides are the SAME log at two
    timestamps).

    ONE shuffle total: both winners come from a single conditional
    ``max(struct)`` aggregation per key (struct ordered (ts, seq) =
    the LWW order, max ignores rows past the cutoff via when()) — the
    skinny-LWW trick, never two window passes plus a self-join. Keys
    absent on both sides (never seen, or deleted at both cutoffs) are
    dropped.
    """
    pick = F.struct(
        F.col(ts_col).alias("_ts"),
        F.col(seq_col).alias("_seq"),
        F.col(op_col).alias("_op"),
    )
    lit1 = F.lit(t1).cast("timestamp")
    lit2 = F.lit(t2).cast("timestamp")
    agg = ev.groupBy(key_col).agg(
        F.max(F.when(F.col(ts_col) <= lit1, pick)).alias("_w1"),
        F.max(F.when(F.col(ts_col) <= lit2, pick)).alias("_w2"),
    )
    p1 = F.col("_w1").isNotNull() & (F.col("_w1._op") != delete_op)
    p2 = F.col("_w2").isNotNull() & (F.col("_w2._op") != delete_op)
    status = (
        F.when(~p1 & p2, F.lit("ADDED"))
        .when(p1 & ~p2, F.lit("REMOVED"))
        .when(p1 & p2 & (F.col("_w1._seq") != F.col("_w2._seq")), F.lit("CHANGED"))
        .otherwise(F.lit("UNCHANGED"))
    )
    return agg.where(p1 | p2).select(
        F.col(key_col),
        status.alias("status"),
        F.when(p1, F.col("_w1._seq")).alias("seq_old"),
        F.when(p2, F.col("_w2._seq")).alias("seq_new"),
    )


def conversion_funnel(
    ev: DataFrame,
    key_col: str,
    ts_col: str,
    stages: list[tuple[str, str]],
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel: per key, the earliest time each stage
    was reached STRICTLY AFTER the previous stage (stage k's event must
    have ``ts > stage k-1's chosen ts``), plus the furthest stage
    index — classic sessionized progression analytics (view ->
    click -> purchase).

    ``stages`` maps event-type value -> output column name, in funnel
    order. ONE shuffle total: all stage times are nested unordered
    windows over the same key partition (Spark reuses the partitioning
    across the window chain and the final per-key aggregate — a single
    Exchange in the plan), never a per-stage join cascade.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(key_col)
    out = ev
    prev: F.Column | None = None
    names = []
    for stage_type, out_name in stages:
        cond = F.col(type_col) == stage_type
        if prev is not None:
            cond = cond & (F.col(ts_col) > prev)
        out = out.withColumn(out_name, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = F.col(out_name)
        names.append(out_name)
    reached = sum(
        (F.col(n).isNotNull().cast("int") for n in names), F.lit(0)
    )
    return (
        out.groupBy(key_col)
        .agg(
            *[F.max(n).alias(n) for n in names],
            F.max(reached).cast("long").alias("funnel_stage"),
        )
    )
