"""Typed engine configuration — the ``cdm.properties`` analog.

Reference: CDM's entire job surface is driven by ``spark.cdm.*``
properties enumerated in
``src/main/java/com/datastax/cdm/properties/KnownProperties.java:26-498``
with defaults in ``src/resources/cdm-detailed.properties``. This module
re-expresses the knobs that survive the Spark-first re-design as a
dataclass; anything Catalyst already handles (fetch size, async flush
thresholds, rate limiters) is intentionally absent.
"""

from __future__ import annotations

from dataclasses import dataclass, field, fields


@dataclass
class EngineConfig:
    # --- partitioning (SplitPartitions.java:32-76; KnownProperties.java:177-178)
    num_partitions: int = 32          # key-hash partitions of the change stream
    num_buckets: int = 64             # lake-table hash buckets (bucket(url))
    coverage_percent: int = 100       # sampled validation (KnownProperties.java:238)
    salt_buckets: int = 8             # hot-key salting factor for the dedup shuffle

    # --- batching (micro-batch epochs; CopyJobSession.java:150-218 analog)
    epoch_size: int = 100_000         # events per batch_epoch
    rerun_multiplier: int = 4         # resumed epochs re-drive pending partitions in this
                                      # many finer commit groups (TrackRun.java:48-71)

    # --- LWW semantics (WritetimeTTL.java:235-258, PKFactory.java:106-133)
    key_col: str = "url"
    ts_col: str = "warc_ts"
    seq_col: str = "seq"              # tie-break (writetimeIncrement analog, WritetimeTTL.java:244)
    op_col: str = "op"
    ttl_col: str = ""                 # row TTL in seconds ("" = disabled); USING TTL analog
                                      # (TargetInsertStatement.java:128, WritetimeTTL.java:260-281)

    # --- filters (OriginSelectStatement.java:104-131)
    min_token: int | None = None              # token-range restriction of the run
    max_token: int | None = None              # (partition.min/max params, README.md:181-184)
    where_condition: str | None = None        # user filter (OriginFilterCondition.java:54-76)
    min_ts: str | None = None                 # writetime-range filter lo
    max_ts: str | None = None                 # writetime-range filter hi
    filter_column: str | None = None          # column-value skip filter
    filter_value: str | None = None

    # --- guardrail (Guardrail.java:88-125; KnownProperties.java col size)
    guardrail_col_size_kb: int = 0            # 0 = disabled

    # --- run tracking (TargetUpsertRunDetailsStatement.java:63-66)
    track_run: bool = True
    run_id: int = 1
    prev_run_id: int = 0

    # --- auto-correct (DiffJobSession autocorrect; README.md:129-131)
    autocorrect_missing: bool = False
    autocorrect_mismatch: bool = False

    # --- paths
    lake_path: str = ""
    lineage_path: str = ""
    changelog_path: str = ""

    # --- schema evolution: columns that may appear mid-stream
    evolvable_cols: tuple[str, ...] = ("lang",)

    extra: dict = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict) -> "EngineConfig":
        known = {f.name for f in fields(cls)}
        kw = {k: v for k, v in d.items() if k in known}
        rest = {k: v for k, v in d.items() if k not in known}
        cfg = cls(**kw)
        cfg.extra.update(rest)
        return cfg
