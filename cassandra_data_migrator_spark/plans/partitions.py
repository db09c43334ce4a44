"""Token-range partition planning — SplitPartitions re-expressed.

Reference: CDM splits the Cassandra token universe into ``numParts``
even sub-ranges (``job/SplitPartitions.java:41-76``), shuffles them
twice to decorrelate hot ranges (:36-38), optionally shrinks each range
to its first ``coveragePercent`` for sampled validation (:66-68), and
drives one Spark task per range.

In the Spark-first build the *data* partitioning is Catalyst's job; the
token plan survives as (a) the key-hash space used for commit keys and
skew salting, and (b) predicate helpers that prune a scan to a token
range — which Catalyst pushes into the parquet/lake scan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

# key-hash token space: xxhash64 yields signed 64-bit; we use its
# non-negative half [0, 2^63) like CDM uses the Murmur3 range
# [-2^63, 2^63) (BaseJob.scala:133-143)
TOKEN_SPACE = 1 << 63


def token_expr(key_col: str) -> Column:
    """Deterministic token for a key in [0, TOKEN_SPACE)."""
    return F.abs(F.xxhash64(F.col(key_col)))


@dataclass
class TokenRange:
    min_token: int
    max_token: int  # inclusive, like CDM's TOKEN(pk) <= ?


def split_token_ranges(num_parts: int, coverage_percent: int = 100) -> list[TokenRange]:
    """Even split of [0, TOKEN_SPACE) into num_parts ranges; each range
    optionally shrunk to its first coverage_percent."""
    if not 1 <= coverage_percent <= 100:
        raise ValueError("coverage_percent must be in [1, 100]")
    step = TOKEN_SPACE // num_parts
    ranges = []
    for i in range(num_parts):
        lo = i * step
        hi = TOKEN_SPACE - 1 if i == num_parts - 1 else (i + 1) * step - 1
        if coverage_percent < 100:
            hi = lo + max(0, (hi - lo) * coverage_percent // 100)
        ranges.append(TokenRange(lo, hi))
    return ranges


def in_token_range(key_col: str, r: TokenRange) -> Column:
    """Pushdown-able predicate: TOKEN(pk) >= min AND TOKEN(pk) <= max
    (OriginSelectByPartitionRangeStatement.java:52-56)."""
    t = token_expr(key_col)
    return (t >= F.lit(r.min_token)) & (t <= F.lit(r.max_token))


def coverage_filter(key_col: str, coverage_percent: int) -> Column:
    """Sampled-scan predicate: keep keys whose token falls in the first
    coverage_percent of the space (coveragePercent analog)."""
    if coverage_percent >= 100:
        return F.lit(True)
    cutoff = TOKEN_SPACE // 100 * coverage_percent
    return token_expr(key_col) < F.lit(cutoff)


def partition_expr(key_col: str, num_partitions: int) -> Column:
    """Key-hash partition id (the stream's token-range analog)."""
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(num_partitions)).cast("int")


def salt_expr(salt_source_col: str, salt_buckets: int) -> Column:
    """Deterministic salt for two-phase skew handling."""
    return F.pmod(F.xxhash64(F.col(salt_source_col), F.lit("salt")), F.lit(salt_buckets))
