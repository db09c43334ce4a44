"""PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of datastax/cassandra-data-migrator's
capabilities (token-range-partitioned copy / diff / guardrail jobs,
writetime-ordered last-writer-wins upserts, per-partition run tracking)
as an idiomatic PySpark engine: a commitlog/WAL of insert/update/delete
change events over Common-Crawl-style web pages is replayed in
micro-batches and applied as key-partitioned LWW upserts into an
atomic-commit lake table, with replay-and-verify validation,
checkpointed resume, and CDM-style run metrics.

Reference semantics (cited per-module as /root/reference file:line):
  - copy job        -> jobs.ingest        (CopyJobSession.java:76-148)
  - diff/validate   -> jobs.validate      (DiffJobSession.java:115-330)
  - guardrail       -> jobs.guardrail     (GuardrailCheckJobSession.java:44-78)
  - run tracking    -> lineage            (TargetUpsertRunDetailsStatement.java:63-66)
  - token ranges    -> plans.partitions   (SplitPartitions.java:32-76)
  - metrics         -> metrics            (JobCounter.java:28-173)
"""

__version__ = "0.1.0"
