"""Guardrail — large-field screening.

Reference: ``feature/Guardrail.java:88-125`` encodes every column of
every row and flags columns whose serialized size exceeds
``colSizeInKB`` (byte count at ``CqlTable.java:327-340``); the job
(``job/GuardrailCheckJobSession.java:44-78``) scans origin-only and
reports READ / VALID / LARGE counters.

Spark-first: ``octet_length`` is evaluated JVM-side inside whole-stage
codegen — no row-at-a-time encoding pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..metrics import JobCounter


# serialized widths of the fixed-length CQL codecs (CqlTable.java:327-340
# measures codec-encoded bytes; these are the wire sizes those codecs emit)
_FIXED_WIDTH = {
    T.BooleanType: 1,
    T.ByteType: 1,
    T.ShortType: 2,
    T.IntegerType: 4,
    T.FloatType: 4,
    T.DateType: 4,
    T.LongType: 8,
    T.DoubleType: 8,
    T.TimestampType: 8,
    T.TimestampNTZType: 8,
}


def _size_expr(field: T.StructField):
    c = F.col(field.name)
    dt = field.dataType
    if isinstance(dt, (T.StringType, T.BinaryType)):
        return F.coalesce(F.octet_length(c), F.lit(0))
    if type(dt) in _FIXED_WIDTH:
        # fixed-width codecs serialize to a constant size regardless of value
        return F.when(c.isNull(), F.lit(0)).otherwise(F.lit(_FIXED_WIDTH[type(dt)]))
    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        # collections/UDTs: measure the JSON encoding — content-
        # proportional like the reference's per-element codec encode
        # (CqlTable.java:327-340), unlike cast-to-string which Spark
        # renders with lossy display formatting
        return F.coalesce(F.octet_length(F.to_json(c)), F.lit(0))
    # decimals + anything exotic: string encoding is content-proportional
    return F.coalesce(F.octet_length(c.cast("string")), F.lit(0))


def guardrail_flags(df: DataFrame, col_size_kb: int, cols: list[str] | None = None) -> DataFrame:
    """Adds ``_large_cols`` (array of offending column names, empty if
    none) — one pass, all columns screened in parallel expressions."""
    threshold = col_size_kb * 1000  # reference multiplies by 1000, not 1024 (Guardrail.java:96)
    names = cols or df.columns
    fields = {f.name: f for f in df.schema.fields}
    flagged = F.array_compact(
        F.array(
            *[
                F.when(_size_expr(fields[n]) > F.lit(threshold), F.lit(n)).otherwise(
                    F.lit(None).cast("string")
                )
                for n in names
            ]
        )
    )
    return df.withColumn("_large_cols", flagged)


def guardrail_check(df: DataFrame, col_size_kb: int, cols: list[str] | None = None):
    """Run the screen; returns (offending_rows_df, JobCounter) with
    READ / VALID / LARGE counts like GuardrailCheckJobSession."""
    flagged = guardrail_flags(df, col_size_kb, cols)
    agg = flagged.select(
        F.count(F.lit(1)).alias("read"),
        F.sum(F.when(F.size("_large_cols") > 0, 1).otherwise(0)).alias("large"),
    ).collect()[0]
    jc = JobCounter()
    jc.add("READ", agg["read"] or 0)
    jc.add("LARGE", agg["large"] or 0)
    jc.add("VALID", (agg["read"] or 0) - (agg["large"] or 0))
    return flagged.where(F.size("_large_cols") > 0), jc
