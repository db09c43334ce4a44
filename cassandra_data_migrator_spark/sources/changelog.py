"""Deterministic synthetic commitlog/WAL of web-page change events.

Generates the Common-Crawl-style change stream from BASELINE.json's
input_hint — ``(url, warc_ts, html, text, lang)`` plus CDC envelope
columns ``(seq, partition, batch_epoch, op)`` — entirely with Spark
column expressions from ``spark.range``: no driver-side loops, no
Python randomness, no wall clock. The same (n_events, knobs) always
produces byte-identical events, which is what makes the
replay-and-verify byte-identity check meaningful (SURVEY §7.4 hard
part c).

Skew: urls are drawn from a discrete Pareto (Zipf-like tail) so a few
hot urls dominate — the skew the north rule requires the merge path to
handle explicitly.

Reference analog: CDM has no generator (it reads a live cluster); the
nosqlbench perf-iot workload (``PERF/perf-iot.yaml:40-53``) plays this
role there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# deterministic hash-derived uniforms: tag keeps the streams independent
_U_SPACE = 1 << 40

EVOLVED_COLS = ("lang",)
LANGS = ["en", "de", "fr", "es", "zh"]
BASE_TS = "2025-01-01 00:00:00"


def _uniform(col, tag: str):
    """U(0,1) derived from xxhash64(col, tag) — deterministic, seedless."""
    h = F.pmod(F.xxhash64(col, F.lit(tag)), F.lit(_U_SPACE))
    return (h.cast("double") + F.lit(0.5)) / F.lit(float(_U_SPACE))


def zipf_rank(col, n_keys: int, alpha: float = 1.1, tag: str = "url"):
    """Discrete Pareto rank in [0, n_keys): P(rank >= r) ~ r^-alpha."""
    u = _uniform(col, tag)
    raw = F.floor(F.pow(u, F.lit(-1.0 / alpha))) - F.lit(1)
    return F.least(raw.cast("long"), F.lit(n_keys - 1))


def changelog(
    spark: SparkSession,
    n_events: int,
    n_urls: int | None = None,
    epoch_size: int = 10_000,
    num_partitions: int = 32,
    delete_frac: float = 0.01,
    update_frac: float = 0.30,
    disorder_seconds: int = 120,
    evolution_frac: float = 0.6,
    alpha: float = 1.1,
    slices: int | None = None,
    payload_repeat: int = 1,
) -> DataFrame:
    """Build the WAL as a DataFrame of ``n_events`` change events.

    Columns: seq long, partition int, batch_epoch long, op string,
    url string, warc_ts timestamp, html binary, text string,
    lang string (null before the evolution epoch — additive schema
    evolution arrives mid-stream).
    """
    n_urls = n_urls or max(64, n_events // 8)
    n_epochs = max(1, (n_events + epoch_size - 1) // epoch_size)
    evolution_epoch = int(n_epochs * evolution_frac)

    df = spark.range(0, n_events, numPartitions=slices or num_partitions)
    seq = F.col("id")

    rank = zipf_rank(seq, n_urls, alpha=alpha)
    url = F.concat(F.lit("https://example.com/page/"), rank.cast("string"))

    u_op = _uniform(seq, "op")
    op = (
        F.when(u_op < F.lit(delete_frac), F.lit("D"))
        .when(u_op < F.lit(delete_frac + update_frac), F.lit("U"))
        .otherwise(F.lit("I"))
    )

    # event time: base + seq seconds + bounded jitter => locally out of order,
    # so last-writer-wins resolution is actually exercised
    jitter = ((_uniform(seq, "ts") * 2.0 - 1.0) * F.lit(float(disorder_seconds))).cast("long")
    warc_ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit(BASE_TS).cast("timestamp")) + seq + jitter
    )

    batch_epoch = F.floor(seq / F.lit(epoch_size)).cast("long")
    partition = F.pmod(F.xxhash64(url), F.lit(num_partitions)).cast("int")

    # page text: pure function of (url, warc_ts, seq) => the verify fold can
    # recompute the expected winning text independently. payload_repeat
    # scales the page toward realistic Common-Crawl sizes (KBs) — still
    # fully deterministic.
    body = F.md5(F.concat_ws("|", url, warc_ts.cast("string"), seq.cast("string")))
    if payload_repeat > 1:
        body = F.repeat(F.concat(body, F.lit(" ")), payload_repeat)
    text = F.concat(F.lit("text "), url, F.lit(" rev "), body)
    html = F.encode(F.concat(F.lit("<html><body>"), text, F.lit("</body></html>")), "utf-8")

    lang = F.when(
        batch_epoch >= F.lit(evolution_epoch),
        F.element_at(F.array(*[F.lit(x) for x in LANGS]),
                     (F.pmod(F.xxhash64(url, F.lit("lang")), F.lit(len(LANGS))) + 1).cast("int")),
    ).otherwise(F.lit(None).cast("string"))

    is_del = op == F.lit("D")
    return df.select(
        seq.alias("seq"),
        partition.alias("partition"),
        batch_epoch.alias("batch_epoch"),
        op.alias("op"),
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        F.when(is_del, F.lit(None).cast("binary")).otherwise(html).alias("html"),
        F.when(is_del, F.lit(None).cast("string")).otherwise(text).alias("text"),
        F.when(is_del, F.lit(None).cast("string")).otherwise(lang).alias("lang"),
    )


def write_changelog(df: DataFrame, path: str) -> None:
    """Materialize the WAL partitioned by batch_epoch (one dir per
    micro-batch) — the layout both the batch replayer and the
    Structured Streaming file source consume."""
    df.write.mode("overwrite").partitionBy("batch_epoch").parquet(path)


def events_as_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver-provided ``events`` table into the WAL shape.

    Used by the oracle-checked queries: ``events(event_id, ts, user_id,
    event_type, value, props)`` becomes a change stream keyed by a
    synthetic url per user, 'error' events acting as deletes. Purely
    declarative so DuckDB can express the identical fold.
    """
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        F.col("event_id").alias("seq"),
        F.concat(F.lit("https://example.com/u/"), F.col("user_id").cast("string")).alias("url"),
        F.col("ts").alias("warc_ts"),
        F.when(F.col("event_type") == "error", F.lit("D")).otherwise(F.lit("U")).alias("op"),
        F.col("event_type"),
        F.col("value"),
        F.col("props"),
    )
