"""Atomic-commit, hash-bucketed lake table over parquet.

The north rule targets an Iceberg sink; this sandbox ships no lake-format
jars, so this module implements the minimal lake-table contract the
engine needs, in the same shape Iceberg provides it:

  * **snapshot isolation** — a table is a directory of immutable parquet
    data files plus a ``_manifests/`` log; readers resolve the CURRENT
    pointer once and only ever see a committed snapshot.
  * **atomic commits** — a commit writes new data files, then a new
    manifest JSON, then atomically swaps the CURRENT pointer
    (``os.replace``). A crash at any point leaves either the old or the
    new snapshot, never a torn one (orphan data files are harmless).
  * **idempotent commit keys** — every commit carries an application key
    (``partition:batch_epoch`` in the CDC jobs). Keys live *inside* the
    manifest, so "was this batch applied?" and "apply this batch" are the
    same atomic unit — the exactly-once guard the reference approximates
    with its ``cdm_run_details`` tracking table
    (``cql/statement/TargetUpsertRunDetailsStatement.java:63-66``).
  * **hash bucketing** — rows are bucketed by ``xxhash64(key) % N``
    (Iceberg ``bucket(N, url)`` analog; CDM's token-range partitioning,
    ``job/SplitPartitions.java:41-76``). Upserts only rewrite affected
    buckets.
  * **additive schema evolution** — the manifest stores the table schema;
    merging a batch with new columns widens it, and old files read
    through the widened schema yield nulls for the new columns (CDM's
    missing-column => unset semantics, ``CqlTable.java:408-428``).
  * **copy-on-write and merge-on-read** — ``merge_cow`` rewrites affected
    buckets; ``append_mor`` appends delta files and defers last-writer-
    wins resolution to read time (Hudi/Iceberg MoR analog), with
    ``compact()`` folding deltas into the base.

Rows are stored with their CDC system columns (``op``, ``warc_ts``,
``seq``); deletes persist as tombstones so a late-arriving older event
still loses LWW resolution (SURVEY §7.4 hard part b). ``read()`` drops
tombstones at final projection.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass, field
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

BUCKET_COL = "_bucket"
GLOBAL_DELTA = "__global__"
MANIFEST_DIR = "_manifests"
CURRENT_FILE = "CURRENT"


def _norm_stat(v):
    """JSON-serializable, totally-ordered form of a footer statistic.

    Timestamps (parquet stores UTC instants; pyarrow hands back naive
    datetimes) normalize to epoch microseconds so manifest JSON stays
    engine-neutral; ints/floats/strings pass through. Unknown types
    normalize to None, which disables pruning for that file — never
    wrong, just unpruned."""
    if v is None:
        return None
    if isinstance(v, datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=timezone.utc)
        return int(v.timestamp() * 1_000_000)
    if isinstance(v, (bool, int, float, str)):
        return v
    return None


def bucket_expr(key_col: str, num_buckets: int):
    """Deterministic bucket id for a key (Iceberg bucket-transform analog)."""
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(num_buckets)).cast("int")


@dataclass
class Manifest:
    version: int
    schema_json: str
    num_buckets: int
    key_col: str
    ts_col: str
    seq_col: str
    op_col: str
    base: dict[str, list[str]] = field(default_factory=dict)    # bucket -> base files
    deltas: dict[str, list[str]] = field(default_factory=dict)  # bucket -> MoR delta files
    applied: list[str] = field(default_factory=list)            # idempotent commit keys
    props: dict = field(default_factory=dict)
    # file -> {"rows", "min_ts", "max_ts"} footer stats (Iceberg manifest
    # column-bounds analog); absent for files written before stats landed
    stats: dict[str, dict] = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(self.__dict__, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "Manifest":
        return cls(**json.loads(s))

    def schema(self) -> T.StructType:
        return T.StructType.fromJson(json.loads(self.schema_json))


@dataclass
class CommitResult:
    committed: bool
    version: int
    skipped_keys: list[str] = field(default_factory=list)
    rows_written: int = 0
    buckets_rewritten: int = 0


class LakeTable:
    """One lake table rooted at ``path``."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # ------------------------------------------------------------- manifest IO
    @property
    def _mdir(self) -> str:
        return os.path.join(self.path, MANIFEST_DIR)

    def exists(self) -> bool:
        return os.path.exists(os.path.join(self._mdir, CURRENT_FILE))

    def manifest(self, version: int | None = None) -> Manifest:
        """The CURRENT manifest, or a specific retained version (time
        travel; vacuumed versions raise with the retained range)."""
        if version is None:
            with open(os.path.join(self._mdir, CURRENT_FILE)) as f:
                version = int(f.read().strip())
        mpath = os.path.join(self._mdir, f"v{version:08d}.json")
        if not os.path.exists(mpath):
            avail = self.versions()
            raise ValueError(
                f"manifest v{version} not found (retained versions: "
                f"{avail[0]}..{avail[-1]})" if avail else
                f"manifest v{version} not found (no versions retained)"
            )
        with open(mpath) as f:
            return Manifest.from_json(f.read())

    def versions(self) -> list[int]:
        """Retained manifest versions, oldest first (snapshot history)."""
        out = []
        for fn in os.listdir(self._mdir):
            if fn.startswith("v") and fn.endswith(".json"):
                out.append(int(fn[1:-5]))
        return sorted(out)

    def _swap(self, mf: Manifest, expected_parent: int) -> None:
        """Atomically publish a new manifest version.

        Two-layer concurrency guard (CDM likewise assumes one run at a
        time per table, enforced via run_id in cdm_run_info):

        1. optimistic read check — the parent version on disk must still
           be ``expected_parent``;
        2. the version file itself is created with ``O_CREAT|O_EXCL`` —
           if two writers race past check 1, exactly one wins the create
           and the other fails loudly instead of silently discarding the
           winner's data files and applied keys.

        The version file is written to a tmp path and published with
        ``os.link`` (atomic; raises ``FileExistsError`` on a real
        concurrent writer). A crash mid-write therefore leaves only an
        ignorable ``*.tmp.*`` file, never a partial ``v{N}.json``; the
        wedging window (complete-but-unswapped orphan) shrinks to the
        instant between the link and the CURRENT swap.
        """
        referenced = {
            f for store in (mf.base, mf.deltas) for fs in store.values() for f in fs
        }
        mf.stats = {f: s for f, s in mf.stats.items() if f in referenced}
        cur = os.path.join(self._mdir, CURRENT_FILE)
        if os.path.exists(cur):
            with open(cur) as f:
                on_disk = int(f.read().strip())
            if on_disk != expected_parent:
                raise RuntimeError(
                    f"concurrent commit detected: expected v{expected_parent}, found v{on_disk}"
                )
        os.makedirs(self._mdir, exist_ok=True)
        mpath = os.path.join(self._mdir, f"v{mf.version:08d}.json")
        mtmp = mpath + f".tmp.{uuid.uuid4().hex}"
        with open(mtmp, "w") as f:
            f.write(mf.to_json())
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(mtmp, mpath)
        except FileExistsError:
            raise RuntimeError(
                f"concurrent commit detected: manifest {mpath} already exists "
                "(another writer, or an orphan from a crashed commit — "
                "delete it to recover if no other writer is active)"
            ) from None
        finally:
            os.unlink(mtmp)
        ctmp = cur + f".tmp.{uuid.uuid4().hex}"
        with open(ctmp, "w") as f:
            f.write(str(mf.version))
            f.flush()
            os.fsync(f.fileno())
        os.replace(ctmp, cur)  # the atomic commit point

    # ------------------------------------------------------------- create
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        key_col: str = "url",
        ts_col: str = "warc_ts",
        seq_col: str = "seq",
        op_col: str = "op",
        num_buckets: int = 64,
        ttl_col: str = "",
    ) -> "LakeTable":
        t = cls(spark, path)
        if t.exists():
            return t
        os.makedirs(t._mdir, exist_ok=True)
        mf = Manifest(
            version=1,
            schema_json=json.dumps(schema.jsonValue()),
            num_buckets=num_buckets,
            key_col=key_col,
            ts_col=ts_col,
            seq_col=seq_col,
            op_col=op_col,
            props={"ttl_col": ttl_col} if ttl_col else {},
        )
        t._swap(mf, expected_parent=1)  # first CURRENT write; no parent file exists
        return t

    # ------------------------------------------------------------- helpers
    def _files(self, mf: Manifest, buckets: list[int] | None, which: str) -> list[str]:
        store: dict[str, list[str]] = getattr(mf, which)
        if buckets is None:
            keys = list(store)
        else:
            keys = [str(b) for b in buckets]
            # global (unbucketed) delta files may hold any key — always in
            # scope when reading a bucket subset
            if which == "deltas" and GLOBAL_DELTA in store:
                keys.append(GLOBAL_DELTA)
        out: list[str] = []
        for k in keys:
            out.extend(os.path.join(self.path, p) for p in store.get(k, []))
        return out

    def _collect_stats(
        self, files_by_bucket: dict[str, list[str]], mf: Manifest
    ) -> dict[str, dict]:
        """Per-file footer statistics: row count + ts_col min/max.

        Read from the parquet metadata on the driver — no Spark job, no
        data scan, O(files just written) — the way Iceberg manifests
        carry column bounds at commit time. Powers metadata-only row
        counts (:meth:`row_count_bound`) and ts-range file skipping
        (:meth:`scan_changes`). A file whose footer lacks min/max for
        the ts column (e.g. legacy INT96 timestamps) gets ``None``
        bounds and is simply never skipped."""
        import pyarrow.parquet as pq

        out: dict[str, dict] = {}
        for files in files_by_bucket.values():
            for rel in files:
                md = pq.ParquetFile(os.path.join(self.path, rel)).metadata
                entry = {"rows": md.num_rows, "min_ts": None, "max_ts": None}
                names = [
                    md.schema.column(i).path for i in range(md.num_columns)
                ]
                idx = names.index(mf.ts_col) if mf.ts_col in names else None
                if idx is not None and md.num_rows > 0:
                    mins, maxs = [], []
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(idx).statistics
                        if st is None or not st.has_min_max:
                            mins = []
                            break
                        mins.append(_norm_stat(st.min))
                        maxs.append(_norm_stat(st.max))
                    if mins and None not in mins and None not in maxs:
                        entry["min_ts"] = min(mins)
                        entry["max_ts"] = max(maxs)
                out[rel] = entry
        return out

    def _prune_by_ts(
        self, mf: Manifest, files: list[str], ts_lower, ts_upper
    ) -> tuple[list[str], int]:
        """Drop files whose footer ts range lies wholly outside
        [ts_lower, ts_upper]. Files without stats are always kept, so
        pruning is safe across manifests that predate stats collection.
        Returns (kept files, skipped count)."""
        lo, hi = _norm_stat(ts_lower), _norm_stat(ts_upper)
        if (lo is None and hi is None) or not mf.stats:
            return files, 0
        kept: list[str] = []
        skipped = 0
        for p in files:
            st = mf.stats.get(os.path.relpath(p, self.path))
            if st and st.get("min_ts") is not None:
                try:
                    if (hi is not None and st["min_ts"] > hi) or (
                        lo is not None and st["max_ts"] < lo
                    ):
                        skipped += 1
                        continue
                except TypeError:
                    pass  # bound type mismatches stored stat: keep the file
            kept.append(p)
        return kept, skipped

    def _read_files(self, mf: Manifest, files: list[str]) -> DataFrame:
        schema = mf.schema()
        if not files:
            return self.spark.createDataFrame([], schema)
        # explicit schema => old files yield null for columns added later
        return self.spark.read.schema(schema).parquet(*files)

    def _write_data(
        self, df: DataFrame, mf: Manifest, bucketed: bool = True
    ) -> dict[str, list[str]]:
        """Write df under data/c-<uuid>/; return bucket->relative files.

        ``bucketed=True``: one shuffle partition per bucket => one data
        file per (bucket, commit). ``bucketed=False``: write as-is (AQE
        has already sized the partitions) under the GLOBAL_DELTA slot —
        the cheap path for small MoR delta batches, which would
        otherwise pay a num_buckets-way shuffle + num_buckets tiny files
        per commit.
        """
        commit_dir = f"data/c-{uuid.uuid4().hex}"
        out = os.path.join(self.path, commit_dir)
        if not bucketed:
            df.write.parquet(out)
            files = [
                os.path.join(commit_dir, fn)
                for fn in os.listdir(out)
                if fn.endswith(".parquet")
            ]
            return {GLOBAL_DELTA: files}
        (
            df.withColumn(BUCKET_COL, bucket_expr(mf.key_col, mf.num_buckets))
            .repartition(mf.num_buckets, BUCKET_COL)
            .write.partitionBy(BUCKET_COL)
            .parquet(out)
        )
        by_bucket: dict[str, list[str]] = {}
        for bdir in os.listdir(out):
            if not bdir.startswith(f"{BUCKET_COL}="):
                continue
            b = bdir.split("=", 1)[1]
            for fn in os.listdir(os.path.join(out, bdir)):
                if fn.endswith(".parquet"):
                    by_bucket.setdefault(b, []).append(
                        os.path.join(commit_dir, bdir, fn)
                    )
        return by_bucket

    PRECEDENCE_COL = "_prec"

    def _lww_resolve(self, df: DataFrame, mf: Manifest) -> DataFrame:
        """Keep, per key, the row with the largest (ts, seq[, precedence]).

        Largest-writetime-wins with seq tie-break — the reference's row
        timestamp semantics (``PKFactory.java:114-125``,
        ``WritetimeTTL.java:235-258``; tie-break analog of
        ``writetimeIncrement`` ``WritetimeTTL.java:244``). An optional
        precedence column (added by force-merges) breaks exact (ts, seq)
        ties in favor of the incoming batch, the autocorrect-overwrite
        case.
        """
        cols = [c for c in df.columns if c not in (BUCKET_COL, self.PRECEDENCE_COL)]
        payload = F.struct(*[F.col(c) for c in cols])
        order_cols = [F.col(mf.ts_col), F.col(mf.seq_col)]
        if self.PRECEDENCE_COL in df.columns:
            order_cols.append(F.col(self.PRECEDENCE_COL))
        winner = F.max_by(payload, F.struct(*order_cols)).alias("_w")
        return df.groupBy(mf.key_col).agg(winner).select("_w.*")

    def _evolve_schema(self, mf: Manifest, batch_schema: T.StructType) -> Manifest:
        """Additively widen the table schema with new batch columns."""
        cur = mf.schema()
        names = {f.name for f in cur.fields}
        new = [f for f in batch_schema.fields if f.name not in names and f.name != BUCKET_COL]
        if new:
            for f in new:
                cur = cur.add(T.StructField(f.name, f.dataType, True))
            mf.schema_json = json.dumps(cur.jsonValue())
        return mf

    def _align(self, df: DataFrame, schema: T.StructType) -> DataFrame:
        """Project df to the table schema, nulling absent columns."""
        cols = []
        for f in schema.fields:
            if f.name in df.columns:
                cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        return df.select(*cols)

    # ------------------------------------------------------------- merge (CoW)
    def merge_cow(
        self, batch: DataFrame, commit_keys: list[str] | str, force: bool = False
    ) -> CommitResult:
        """LWW-upsert a (pre-deduplicated) batch; rewrite affected buckets.

        Iceberg ``MERGE INTO ... WHEN MATCHED UPDATE WHEN NOT MATCHED
        INSERT`` analog of the reference's upsert sink
        (``TargetInsertStatement.java:33-183``). ``commit_keys`` are the
        idempotence keys covered by this batch (one per
        ``partition:batch_epoch`` slice); if all are already applied the
        call is a no-op. Callers re-driving a partially-applied epoch
        must pre-filter the batch to the unapplied keys.
        """
        keys = [commit_keys] if isinstance(commit_keys, str) else list(commit_keys)
        mf = self.manifest()
        if all(k in mf.applied for k in keys):
            return CommitResult(False, mf.version, skipped_keys=keys)
        if mf.deltas.get(GLOBAL_DELTA):
            # global delta files may hold keys outside the affected
            # buckets; fold them into the base before a bucket-scoped CoW
            self.compact()
            mf = self.manifest()
        parent = mf.version
        mf = self._evolve_schema(mf, batch.schema)
        schema = mf.schema()
        batch = self._align(batch, schema).withColumn(
            BUCKET_COL, bucket_expr(mf.key_col, mf.num_buckets)
        )
        affected = sorted(
            r[0] for r in batch.select(BUCKET_COL).distinct().collect()
        )
        existing = self._read_files(
            mf, self._files(mf, affected, "base") + self._files(mf, affected, "deltas")
        ).withColumn(BUCKET_COL, bucket_expr(mf.key_col, mf.num_buckets))
        if force:
            # batch wins exact (ts, seq) ties — autocorrect overwrite
            # (writetimeIncrement analog, WritetimeTTL.java:244)
            existing = existing.withColumn(self.PRECEDENCE_COL, F.lit(0))
            batch = batch.withColumn(self.PRECEDENCE_COL, F.lit(1))
        merged = self._lww_resolve(
            existing.unionByName(batch, allowMissingColumns=True), mf
        )
        new_files = self._write_data(merged, mf)
        mf.stats.update(self._collect_stats(new_files, mf))
        mf.version = parent + 1
        for b in affected:
            mf.base[str(b)] = new_files.get(str(b), [])
            mf.deltas.pop(str(b), None)
        mf.applied.extend(k for k in keys if k not in mf.applied)
        self._swap(mf, expected_parent=parent)
        return CommitResult(True, mf.version, buckets_rewritten=len(affected))

    # ------------------------------------------------------------- counter merge
    def merge_counter(
        self,
        batch: DataFrame,
        commit_keys: list[str] | str,
        counter_cols: list[str],
    ) -> CommitResult:
        """Delta-merge for counter columns: new = existing + sum(deltas).

        The reference's counter-table path binds origin-target deltas so
        counters converge under replay (``TargetUpdateStatement.java:
        69-76``, ``CopyJobSession.java:188-197``). Here the WAL carries
        deltas; idempotent commit keys guarantee each delta is summed
        exactly once, so the counter is exact even across retries.
        Non-counter columns resolve LWW as usual.

        Unlike ``merge_cow`` (LWW, idempotent under re-application),
        re-summing a counter delta is NEVER safe — a batch whose keys
        partially overlap the applied set would double-count the
        already-applied partitions' deltas, so partial overlap raises
        instead of relying on a caller pre-filter contract.
        """
        keys = [commit_keys] if isinstance(commit_keys, str) else list(commit_keys)
        mf = self.manifest()
        overlap = [k for k in keys if k in mf.applied]
        if len(overlap) == len(keys):
            return CommitResult(False, mf.version, skipped_keys=keys)
        if overlap:
            raise ValueError(
                f"merge_counter: commit keys partially applied ({overlap}); "
                "re-summing applied counter deltas would double-count — "
                "re-drive with the batch filtered to unapplied keys only"
            )
        parent = mf.version
        mf = self._evolve_schema(mf, batch.schema)
        schema = mf.schema()
        batch = self._align(batch, schema).withColumn(
            BUCKET_COL, bucket_expr(mf.key_col, mf.num_buckets)
        )
        affected = sorted(r[0] for r in batch.select(BUCKET_COL).distinct().collect())
        if mf.deltas.get(GLOBAL_DELTA) or any(mf.deltas.get(str(b)) for b in affected):
            # counter tables are CoW-only: MoR delta files hold unresolved
            # row versions whose counter values would double-sum
            raise ValueError("merge_counter cannot run on buckets with MoR deltas")
        existing = self._read_files(
            mf, self._files(mf, affected, "base")
        ).withColumn(BUCKET_COL, bucket_expr(mf.key_col, mf.num_buckets))
        both = existing.unionByName(batch, allowMissingColumns=True)
        other_cols = [
            c for c in both.columns
            if c not in counter_cols and c not in (mf.key_col, BUCKET_COL)
        ]
        payload = F.struct(*[F.col(c) for c in other_cols])
        order = F.struct(F.col(mf.ts_col), F.col(mf.seq_col))
        merged = (
            both.groupBy(mf.key_col)
            .agg(
                F.max_by(payload, order).alias("_w"),
                *[F.sum(c).alias(c) for c in counter_cols],
            )
            .select(mf.key_col, *counter_cols, "_w.*")
        )
        new_files = self._write_data(self._align(merged, schema), mf)
        mf.stats.update(self._collect_stats(new_files, mf))
        mf.version = parent + 1
        for b in affected:
            mf.base[str(b)] = new_files.get(str(b), [])
            mf.deltas.pop(str(b), None)
        mf.applied.extend(k for k in keys if k not in mf.applied)
        self._swap(mf, expected_parent=parent)
        return CommitResult(True, mf.version, buckets_rewritten=len(affected))

    # ------------------------------------------------------------- append (MoR)
    def stage_delta(self, batch: DataFrame) -> dict:
        """Write a MoR delta file set WITHOUT publishing it — the
        parallel half of ``append_mor``, safe to run concurrently from
        several driver threads (the epoch-pipelining path in
        ``jobs.ingest``). Files land under a unique commit dir and stay
        invisible until :meth:`commit_staged_delta` links them into a
        manifest; a crash before that leaves harmless orphans."""
        mf = self.manifest()
        # widen a LOCAL manifest copy so a batch carrying new columns is
        # written with them; the authoritative schema evolution happens
        # at commit time (ordered), and readers ignore file columns the
        # committed schema doesn't (yet) name
        mf = self._evolve_schema(mf, batch.schema)
        aligned = self._align(batch, mf.schema())
        files = self._write_data(aligned, mf, bucketed=False)
        return {
            "files": files,
            "schema_json": json.dumps(batch.schema.jsonValue()),
            "stats": self._collect_stats(files, mf),
        }

    def commit_staged_delta(
        self, staged: dict, commit_keys: list[str] | str
    ) -> CommitResult:
        """Publish a staged delta file set atomically (ordered, cheap —
        manifest JSON only, no Spark job)."""
        keys = [commit_keys] if isinstance(commit_keys, str) else list(commit_keys)
        mf = self.manifest()
        if all(k in mf.applied for k in keys):
            return CommitResult(False, mf.version, skipped_keys=keys)
        parent = mf.version
        mf = self._evolve_schema(mf, T.StructType.fromJson(json.loads(staged["schema_json"])))
        mf.version = parent + 1
        for b, files in staged["files"].items():
            mf.deltas.setdefault(b, []).extend(files)
        mf.stats.update(staged.get("stats", {}))
        mf.applied.extend(k for k in keys if k not in mf.applied)
        self._swap(mf, expected_parent=parent)
        return CommitResult(True, mf.version, buckets_rewritten=0)

    def append_mor(self, batch: DataFrame, commit_keys: list[str] | str) -> CommitResult:
        """Append a delta file set; LWW resolution deferred to read time.

        Merge-on-read: O(batch) write cost per commit regardless of table
        size — the scale path for 10^10-event ingest; ``compact()``
        amortizes the read cost.
        """
        keys = [commit_keys] if isinstance(commit_keys, str) else list(commit_keys)
        mf = self.manifest()
        if all(k in mf.applied for k in keys):
            return CommitResult(False, mf.version, skipped_keys=keys)
        return self.commit_staged_delta(self.stage_delta(batch), keys)

    def compact(
        self, buckets: list[int] | None = None, expire_as_of=None
    ) -> CommitResult:
        """Fold MoR deltas into the base for the given (or all) buckets.

        ``expire_as_of``: additionally drop rows whose TTL has lapsed by
        that timestamp — the physical reclaim of USING-TTL rows
        (Cassandra compaction-expiry analog). Like Cassandra, a
        later-arriving OLDER version of an expired row can resurrect the
        key until the next expiring compaction."""
        mf = self.manifest()
        parent = mf.version
        has_global = bool(mf.deltas.get(GLOBAL_DELTA))
        with_deltas = sorted(
            int(b) for b in mf.deltas if b != GLOBAL_DELTA and mf.deltas[b]
        )
        if buckets is not None and not has_global:
            with_deltas = [b for b in with_deltas if b in buckets]
        if has_global:
            # global deltas may hold any key: fold over every bucket that
            # has base data too
            with_deltas = sorted(set(with_deltas) | {int(b) for b in mf.base})
        if not with_deltas and not has_global:
            return CommitResult(False, mf.version)
        df = self._read_files(
            mf,
            self._files(mf, with_deltas, "base") + self._files(mf, with_deltas, "deltas"),
        ).withColumn(BUCKET_COL, bucket_expr(mf.key_col, mf.num_buckets))
        resolved = self._lww_resolve(df, mf)
        ttl_col = mf.props.get("ttl_col")
        if expire_as_of is not None and ttl_col and ttl_col in resolved.columns:
            from ..functions.transforms import ttl_alive_predicate

            resolved = resolved.where(
                ttl_alive_predicate(mf.ts_col, ttl_col, expire_as_of)
            )
        new_files = self._write_data(resolved, mf)
        mf.stats.update(self._collect_stats(new_files, mf))
        mf.version = parent + 1
        rewritten = sorted(set(with_deltas) | {int(b) for b in new_files})
        for b in rewritten:
            mf.base[str(b)] = new_files.get(str(b), [])
            mf.deltas.pop(str(b), None)
        mf.deltas.pop(GLOBAL_DELTA, None)
        self._swap(mf, expected_parent=parent)
        return CommitResult(True, mf.version, buckets_rewritten=len(rewritten))

    def vacuum(self, retain_last: int = 1) -> int:
        """Physically delete data files referenced only by manifests
        older than the newest ``retain_last`` versions, and drop those
        manifests (Delta VACUUM / Iceberg expire-snapshots analog).
        Bounds time travel to the retained versions; returns the number
        of files deleted.

        Single-writer assumption (same as the rest of the lake): must
        not run while an ingest is staging commits — a staged-but-
        unpublished commit dir is unreferenced by any manifest and would
        be swept as garbage. Driver-side file ops only, no Spark job."""
        if retain_last < 1:
            raise ValueError("retain_last must be >= 1")
        versions = self.versions()
        # the CURRENT-pointed version is ALWAYS retained, independent of
        # retain_last: _swap publishes v{N}.json before swapping CURRENT,
        # so a crash in that window leaves an orphan manifest NEWER than
        # CURRENT — counting retention from the newest file would then
        # delete the live manifest (and data files the orphan doesn't
        # reference), bricking the table
        with open(os.path.join(self._mdir, CURRENT_FILE)) as f:
            current_v = int(f.read().strip())
        keep_versions = set(versions[-retain_last:]) | {current_v}
        keep_files: set[str] = set()
        for v in sorted(keep_versions):
            mf = self.manifest(v)
            for store in (mf.base, mf.deltas):
                for files in store.values():
                    keep_files.update(files)
        # drop expired manifests BEFORE touching data files: a crash
        # mid-vacuum then leaves only orphan (unreferenced) data files —
        # harmless, reclaimed by the next vacuum — never a readable
        # manifest version pointing at deleted files
        for v in versions:
            if v not in keep_versions:
                os.remove(os.path.join(self._mdir, f"v{v:08d}.json"))
        removed = 0
        data_root = os.path.join(self.path, "data")
        if os.path.isdir(data_root):
            for root, _dirs, files in os.walk(data_root):
                for fn in files:
                    p = os.path.join(root, fn)
                    if fn.endswith(".parquet") and \
                            os.path.relpath(p, self.path) not in keep_files:
                        os.remove(p)
                        removed += 1
            # prune commit dirs that no longer hold any data file
            # (leftover _SUCCESS/.crc markers go with them)
            for cdir in os.listdir(data_root):
                full = os.path.join(data_root, cdir)
                has_parquet = any(
                    fn.endswith(".parquet")
                    for _, _, fns in os.walk(full) for fn in fns
                )
                if not has_parquet:
                    shutil.rmtree(full, ignore_errors=True)
        return removed

    # ------------------------------------------------------------- read
    def read(
        self,
        include_tombstones: bool = False,
        resolve: bool = True,
        buckets: list[int] | None = None,
        as_of=None,
        version: int | None = None,
    ) -> DataFrame:
        """Current snapshot — or, with ``version``, the table exactly as
        it stood at that manifest version (time travel: data files are
        immutable and manifests are retained until :meth:`vacuum`, so a
        historical manifest resolves byte-identically — the
        reproducible-training-dataset guarantee; Delta ``VERSION AS OF``
        / Iceberg snapshot-read analog, no reference counterpart).
        Tombstones ('D' rows) dropped at projection.

        ``as_of``: when the table has a TTL column, rows whose TTL
        lapsed by that timestamp are filtered out at read time (the
        query-time half of USING-TTL expiry; ``compact(expire_as_of=)``
        is the physical reclaim)."""
        mf = self.manifest(version)
        base = self._read_files(mf, self._files(mf, buckets, "base"))
        has_deltas = any(mf.deltas.values())
        if has_deltas:
            deltas = self._read_files(mf, self._files(mf, buckets, "deltas"))
            df = base.unionByName(deltas, allowMissingColumns=True)
            if resolve:
                df = df.withColumn(
                    BUCKET_COL, bucket_expr(mf.key_col, mf.num_buckets)
                )
                df = self._lww_resolve(df, mf)
        else:
            df = base
        if not include_tombstones and mf.op_col in df.columns:
            # null op (e.g. correction rows) is live, not a tombstone
            df = df.where(~F.col(mf.op_col).eqNullSafe(F.lit("D")))
        ttl_col = mf.props.get("ttl_col")
        if as_of is not None and ttl_col and ttl_col in df.columns:
            from ..functions.transforms import ttl_alive_predicate

            df = df.where(ttl_alive_predicate(mf.ts_col, ttl_col, as_of))
        return df

    def scan_changes(
        self,
        ts_lower=None,
        ts_upper=None,
        buckets: list[int] | None = None,
        include_tombstones: bool = True,
        version: int | None = None,
    ) -> DataFrame:
        """Raw (unresolved) scan of the snapshot's committed row
        versions with ``ts_col`` bounded to [ts_lower, ts_upper] — the
        incremental-consumer read (Iceberg incremental-scan analog; the
        pull-based counterpart of the streaming ``feed`` job). A file
        whose footer ts range lies wholly outside the window is never
        opened (:meth:`_prune_by_ts`), so a "changes since yesterday"
        scan over a 10^10-row table touches only the recent delta files,
        not the compacted base.

        Unresolved by design: LWW resolution needs every version of a
        key, so a resolved read could not skip files — and a change
        consumer wants every committed version in the window anyway.
        Tombstones are included by default (a delete IS a change)."""
        mf = self.manifest(version)
        files = self._files(mf, buckets, "base") + self._files(mf, buckets, "deltas")
        kept, _ = self._prune_by_ts(mf, files, ts_lower, ts_upper)
        df = self._read_files(mf, kept)
        if ts_lower is not None:
            df = df.where(F.col(mf.ts_col) >= F.lit(ts_lower))
        if ts_upper is not None:
            df = df.where(F.col(mf.ts_col) <= F.lit(ts_upper))
        if not include_tombstones and mf.op_col in df.columns:
            df = df.where(~F.col(mf.op_col).eqNullSafe(F.lit("D")))
        return df

    def row_count_bound(self, version: int | None = None) -> int | None:
        """Sum of footer row counts across the snapshot's files — a
        metadata-only upper bound on live rows (exact when the table is
        fully compacted and tombstone-free), answered from the manifest
        without launching a Spark job (Iceberg ``snapshot.summary``
        analog). ``None`` if any referenced file predates stats
        collection."""
        mf = self.manifest(version)
        total = 0
        for store in (mf.base, mf.deltas):
            for fs in store.values():
                for rel in fs:
                    st = mf.stats.get(rel)
                    if st is None:
                        return None
                    total += st["rows"]
        return total

    def lookup(self, keys: list, as_of=None) -> DataFrame:
        """Point lookup by primary key (``OriginSelectByPKStatement.java:
        27-67`` analog): prune the read to the hash buckets the keys
        fall in, then filter to the keys — touches at most ``len(keys)``
        buckets' files instead of the whole table."""
        mf = self.manifest()
        kdf = self.spark.createDataFrame(
            [(k,) for k in keys], T.StructType([mf.schema()[mf.key_col]])
        )
        buckets = sorted(
            r[0] for r in
            kdf.select(bucket_expr(mf.key_col, mf.num_buckets)).distinct().collect()
        )
        df = self.read(buckets=buckets, as_of=as_of)
        return df.where(F.col(mf.key_col).isin(keys))

    def applied_keys(self) -> set[str]:
        return set(self.manifest().applied)
