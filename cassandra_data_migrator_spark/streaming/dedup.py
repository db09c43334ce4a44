"""Streaming incremental near-dup detection over the CDC WAL.

The batch-side operator (``operators.dedup.incremental_lsh_pairs``)
pairs one arriving epoch against the accumulated signature index; this
module runs the same shape continuously: tail the WAL as a streaming
file source, and per micro-batch

1. LWW-collapse the batch to one live row per key (deletes dropped),
2. MinHash-sign the batch's documents (map-side, zero shuffle),
3. emit candidate pairs against the signatures of every EARLIER batch
   (broadcast left-semi bucket prune — the index is never re-paired
   with itself),
4. append the batch's signatures to the index.

Exactly-once without a transactional sink: both outputs are written
with dynamic partition overwrite into a ``batch_id=`` partition, so a
foreachBatch retry (at-least-once with a stable batch_id) rewrites the
same partitions byte-identically instead of duplicating — the same
idempotence idea as the lake's ``stream:<batch_id>`` commit keys in
``streaming/replay.py``, re-expressed for plain parquet outputs. The
index read filters ``batch_id < current`` (partition-pruned), so a
retried batch never pairs against its own half-written output.

At 10^10 docs the index side is exactly the lake-bucketed banded store
described in ``operators/dedup.py``; here it is a parquet directory —
the per-batch cost model (O(batch x bucket occupancy)) is identical.

Reference analog: none — CDM has no streaming surface; this extends
the SURVEY §2.7 streaming family with the training-data dedup the
webtext tier needs.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..config import EngineConfig
from ..operators import dedup
from ..operators.lww import lww_dedup_skinny
from .replay import WAL_SCHEMA


def stream_dedup(
    spark: SparkSession,
    cfg: EngineConfig,
    checkpoint_dir: str,
    index_dir: str,
    pairs_dir: str,
    num_hashes: int = 16,
    bands: int = 8,
    max_bucket_size: int | None = 1000,
    max_files_per_trigger: int = 4,
    timeout_sec: int = 600,
):
    """Tail the WAL; per micro-batch emit near-dup candidate pairs of
    the batch's live documents vs all earlier batches, then append the
    batch's signatures to the index. Trigger.AvailableNow: drains what
    exists, then stops; rerunning resumes from the checkpoint and
    rewrites (not duplicates) any replayed batch."""
    stream = (
        spark.readStream.schema(WAL_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(cfg.changelog_path)
    )

    def apply_batch(batch, batch_id: int) -> None:
        s = batch.sparkSession
        live = lww_dedup_skinny(
            batch.drop("partition", "batch_epoch"),
            cfg.key_col, cfg.ts_col, cfg.seq_col,
        )
        # NULL-op rows are live (same null-safe definition as the
        # lake/expected_state live-row filter)
        live = live.where(
            (F.col(cfg.op_col).isNull() | (F.col(cfg.op_col) != "D"))
            & F.col("text").isNotNull()
        )
        new_sig = dedup.minhash_signature(
            live, "text", cfg.key_col, num_hashes=num_hashes, hash_mode="fast"
        )
        # read-and-fallback, not a directory-existence check: object
        # stores have no directories, so probe by attempting the read
        # (a missing/empty prefix raises AnalysisException)
        try:
            index_all = s.read.parquet(index_dir)
            index_all.schema  # force analysis now, inside the try
        except AnalysisException:
            index_all = None
        if index_all is not None:
            index_sig = (
                index_all
                .where(F.col("batch_id") < batch_id)
                .drop("batch_id")
            )
            pairs = dedup.incremental_lsh_pairs(
                index_sig, new_sig, cfg.key_col,
                num_hashes=num_hashes, bands=bands,
                max_bucket_size=max_bucket_size,
            )
        else:
            # first batch: no index yet — pairs are batch-internal only
            pairs = dedup.lsh_candidate_pairs(
                new_sig, cfg.key_col,
                num_hashes=num_hashes, bands=bands,
                max_bucket_size=max_bucket_size,
            )
        for df, out in ((pairs, pairs_dir), (new_sig, index_dir)):
            (
                df.withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id")
                .parquet(out)
            )

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    terminated = q.awaitTermination(timeout_sec)
    if not terminated:
        q.stop()
        q.awaitTermination()
    return q
