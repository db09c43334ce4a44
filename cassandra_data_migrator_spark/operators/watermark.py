"""Out-of-orderness observability for a change stream.

CDC correctness hinges on how late events arrive relative to the
epochs that carry them (the reference sidesteps this because Cassandra
resolves LWW server-side at read; a lake/streaming sink must pick
watermarks, and picking them needs measurements). ``late_arrival_stats``
reports, per ingest epoch, how many events arrived with an event-time
older than everything already ingested — the distribution that sizes
``withWatermark`` delays and the stateful feed's eviction horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def late_arrival_stats(
    df: DataFrame,
    epoch_col: str = "epoch",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Per-epoch late-event counts vs the prior epochs' high-water mark.

    Two-phase so nothing corpus-sized is ever sorted: (1) per-epoch max
    event-time — one partial-aggregated shuffle down to #epochs rows;
    (2) the exclusive running max over that tiny frame (a deliberate
    single-task window over <= #epochs rows) is the high-water mark
    each epoch inherits, broadcast back; (3) the late/lateness flags
    are row-local and the per-epoch rollup partial-aggregates again.
    Lateness is measured in exact integer microseconds (portable across
    engines; no fractional-second division).

    The first epoch has no predecessor: ``hwm`` is null there, so its
    ``n_late`` is 0 and ``max_late_us`` null.
    """
    em = df.groupBy(epoch_col).agg(F.max(ts_col).alias("_emax"))
    w = Window.orderBy(epoch_col).rowsBetween(Window.unboundedPreceding, -1)
    hwm = em.select(
        F.col(epoch_col), F.max("_emax").over(w).alias("_hwm")
    )  # <= #epochs rows: a deliberate tiny single-task window
    joined = df.join(F.broadcast(hwm), epoch_col)
    late = F.col(ts_col) < F.col("_hwm")
    # timestampdiff handles TIMESTAMP_NTZ (unix_micros does not)
    late_us = F.expr(f"timestampdiff(MICROSECOND, {ts_col}, _hwm)")
    return joined.groupBy(epoch_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.count(F.when(late, F.lit(1))).cast("long").alias("n_late"),
        F.max(F.when(late, late_us)).cast("long").alias("max_late_us"),
    )
