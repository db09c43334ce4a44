"""End-to-end CDC replay tests — the SIT golden-test analog
(/root/reference SIT/smoke/01_basic_kvp: migrate then validate, assert
final state + counters)."""

import pytest
from pyspark.sql import functions as F

from cassandra_data_migrator_spark.config import EngineConfig
from cassandra_data_migrator_spark.jobs import expected_state, ingest, validate
from cassandra_data_migrator_spark.operators.diff import STATUS_COL
from cassandra_data_migrator_spark.sources import changelog as wal
from cassandra_data_migrator_spark.sources.lake import LakeTable

N_EVENTS = 4_000
EPOCH = 500


def make_cfg(tmp_path, **kw) -> EngineConfig:
    d = dict(
        lake_path=str(tmp_path / "lake"),
        lineage_path=str(tmp_path / "lineage"),
        epoch_size=EPOCH,
        num_partitions=8,
        num_buckets=8,
    )
    d.update(kw)
    return EngineConfig.from_dict(d)


@pytest.fixture(scope="module")
def events(spark):
    df = wal.changelog(
        spark, N_EVENTS, n_urls=300, epoch_size=EPOCH, num_partitions=8
    ).cache()
    df.count()
    return df


def test_changelog_deterministic(spark, events):
    again = wal.changelog(spark, N_EVENTS, n_urls=300, epoch_size=EPOCH, num_partitions=8)
    assert events.exceptAll(again).count() == 0
    assert again.exceptAll(events).count() == 0


def test_changelog_has_skew_and_evolution(spark, events):
    top = events.groupBy("url").count().orderBy(F.desc("count")).first()
    assert top["count"] > N_EVENTS / 300 * 5, "zipf head should be hot"
    # lang appears only in later epochs (additive evolution mid-stream)
    pre = events.where("batch_epoch < 4").where(F.col("lang").isNotNull()).count()
    post = events.where("batch_epoch >= 5").where(
        F.col("lang").isNotNull() & (F.col("op") != "D")
    ).count()
    assert pre == 0 and post > 0


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_ingest_matches_expected_fold(spark, events, tmp_path, mode):
    cfg = make_cfg(tmp_path / mode)
    res = ingest(spark, cfg, changelog_df=events, mode=mode)
    assert res.counters.get("READ") == N_EVENTS
    lake = LakeTable(spark, cfg.lake_path)
    actual = lake.read()
    expected = expected_state(events, cfg)
    # final state must equal the one-shot LWW fold exactly
    assert actual.exceptAll(expected).count() == 0
    assert expected.exceptAll(actual).count() == 0
    # winners whose final op is delete are gone
    assert actual.where(F.col("op") == "D").count() == 0


def test_validate_green(spark, events, tmp_path):
    cfg = make_cfg(tmp_path)
    ingest(spark, cfg, changelog_df=events, mode="mor")
    d, jc = validate(spark, cfg, changelog_df=events)
    assert jc.get("MISSING") == 0
    assert jc.get("MISMATCH") == 0
    assert jc.get("VALID") > 0


def test_kill_and_resume_no_duplicates(spark, events, tmp_path):
    cfg = make_cfg(tmp_path)
    with pytest.raises(RuntimeError, match="injected failure"):
        ingest(spark, cfg, changelog_df=events, mode="mor", fail_at_epoch=3)
    lake = LakeTable(spark, cfg.lake_path)
    n_applied_before = len(lake.applied_keys())
    assert n_applied_before > 0

    # resume: must skip committed epochs, apply the rest, end in the same state
    res = ingest(spark, cfg, changelog_df=events, mode="mor")
    assert res.epochs_skipped, "resume should skip already-committed epochs"
    actual = LakeTable(spark, cfg.lake_path).read()
    expected = expected_state(events, cfg)
    assert actual.exceptAll(expected).count() == 0
    assert expected.exceptAll(actual).count() == 0
    # re-running a completed ingest is a no-op (idempotent commit keys)
    res2 = ingest(spark, cfg, changelog_df=events, mode="mor")
    assert not res2.epochs_applied


def test_validate_detects_and_corrects_drift(spark, events, tmp_path):
    cfg = make_cfg(tmp_path)
    ingest(spark, cfg, changelog_df=events, mode="mor")
    lake = LakeTable(spark, cfg.lake_path)
    # seed drift: tamper one row's text, delete another url entirely
    snapshot = lake.read()
    two = snapshot.orderBy("url").limit(2).collect()
    tampered_url, missing_url = two[0]["url"], two[1]["url"]
    drifted_rows = (
        snapshot.withColumn(
            "text",
            F.when(F.col("url") == tampered_url, F.lit("corrupted")).otherwise(F.col("text")),
        )
        .where(F.col("url") != missing_url)
        .collect()  # materialize before the source files are deleted
    )
    drifted_schema = snapshot.schema
    drifted = spark.createDataFrame(drifted_rows, drifted_schema)
    # rebuild a drifted lake
    import shutil

    shutil.rmtree(cfg.lake_path)
    cfg2 = make_cfg(tmp_path, lake_path=cfg.lake_path)
    lake2 = LakeTable.create(
        spark, cfg2.lake_path, drifted.schema, num_buckets=cfg2.num_buckets
    )
    lake2.merge_cow(drifted, ["seed"])

    d, jc = validate(spark, cfg2, changelog_df=events, autocorrect=False)
    assert jc.get("MISMATCH") == 1
    assert jc.get("MISSING") == 1
    assert (
        d.where(STATUS_COL + " = 'MISMATCH'").first()["url"] == tampered_url
    )

    # autocorrect heals; second validate is green
    d2, jc2 = validate(spark, cfg2, changelog_df=events, autocorrect=True)
    assert jc2.get("CORRECTED_MISSING") >= 1
    d3, jc3 = validate(spark, cfg2, changelog_df=events, autocorrect=False)
    assert jc3.get("MISSING") == 0 and jc3.get("MISMATCH") == 0


def test_schema_evolution_lang_null_before_epoch(spark, events, tmp_path):
    cfg = make_cfg(tmp_path)
    ingest(spark, cfg, changelog_df=events, mode="mor")
    actual = LakeTable(spark, cfg.lake_path).read()
    assert "lang" in actual.columns
    # urls whose winning event predates evolution have lang null
    pre = actual.where(F.col("lang").isNull()).count()
    post = actual.where(F.col("lang").isNotNull()).count()
    assert pre > 0 and post > 0


def test_rerun_resplit_partial_epoch(spark, events, tmp_path):
    """A partially-applied epoch re-drives its pending partitions in
    finer commit groups (rerunMultiplier analog, TrackRun.java:48-71)."""
    from cassandra_data_migrator_spark.jobs import _ensure_lake
    from cassandra_data_migrator_spark.operators.lww import lww_dedup_skinny

    cfg = make_cfg(tmp_path, rerun_multiplier=3)
    # simulate a run that died mid-epoch: partition 0 of epoch 0 applied
    lake = _ensure_lake(spark, cfg, events)
    first = events.where(
        (F.col("batch_epoch") == 0) & (F.col("partition") == 0)
    ).drop("partition", "batch_epoch")
    lake.append_mor(lww_dedup_skinny(first, "url", "warc_ts", "seq"), ["0:0"])

    res = ingest(spark, cfg, changelog_df=events, mode="mor")
    assert 0 in res.epochs_applied
    # every partition:epoch key applied exactly once; final state correct
    actual = LakeTable(spark, cfg.lake_path).read()
    expected = expected_state(events, cfg)
    assert actual.exceptAll(expected).count() == 0
    assert expected.exceptAll(actual).count() == 0
    # lineage shows epoch 0's pending partitions went in 3 commit groups
    from cassandra_data_migrator_spark.lineage import LineageStore

    det = LineageStore(spark, cfg.lineage_path).details()
    e0 = det.where((F.col("batch_epoch") == 0) & (F.col("status") == "PASS"))
    assert e0.count() == 7  # 8 partitions minus the pre-applied one
    assert e0.select("ts_unix").distinct().count() == 3


def test_validate_sampled_coverage(spark, events, tmp_path):
    """coverage_percent < 100 validates a token-space sample of keys on
    BOTH sides (SplitPartitions.java:66-68, README.md:186)."""
    cfg = make_cfg(tmp_path)
    ingest(spark, cfg, changelog_df=events, mode="mor")
    full_d, full_jc = validate(spark, cfg, changelog_df=events)
    cfg25 = make_cfg(tmp_path, coverage_percent=25)
    d, jc = validate(spark, cfg25, changelog_df=events)
    assert 0 < jc.get("READ") < full_jc.get("READ")
    assert jc.get("MISSING") == 0 and jc.get("MISMATCH") == 0


def test_diff_reports_mismatching_column_names(spark):
    from cassandra_data_migrator_spark.operators.diff import diff

    e = spark.createDataFrame(
        [("k1", "a", 1), ("k2", "b", 2), ("k3", "c", 3)], "key string, v string, n long"
    )
    a = spark.createDataFrame(
        [("k1", "a", 1), ("k2", "XX", 2), ("k4", "d", 4)], "key string, v string, n long"
    )
    d = {r["key"]: r for r in diff(e, a, "key", ["v", "n"]).collect()}
    assert d["k1"][STATUS_COL] == "VALID" and d["k1"]["_mismatch_cols"] == []
    assert d["k2"][STATUS_COL] == "MISMATCH" and d["k2"]["_mismatch_cols"] == ["v"]
    assert d["k3"][STATUS_COL] == "MISSING" and d["k3"]["_mismatch_cols"] == ["v", "n"]
    assert d["k4"][STATUS_COL] == "EXTRA"


def test_lake_point_lookup_prunes_buckets(spark, events, tmp_path):
    cfg = make_cfg(tmp_path)
    ingest(spark, cfg, changelog_df=events, mode="mor")
    lake = LakeTable(spark, cfg.lake_path)
    all_rows = {r["url"]: r["seq"] for r in lake.read().collect()}
    some = sorted(all_rows)[:3]
    got = {r["url"]: r["seq"] for r in lake.lookup(some).collect()}
    assert got == {k: all_rows[k] for k in some}


def test_token_range_restricted_ingest(spark, events, tmp_path):
    """min/max-token restriction: only keys whose token falls in range
    are ingested (partition.min/max param analog), and the full-range
    ingest of the complement + range together equals the unrestricted
    fold."""
    from cassandra_data_migrator_spark.plans.partitions import TOKEN_SPACE, token_expr

    mid = TOKEN_SPACE // 2
    cfg = make_cfg(tmp_path, max_token=mid)
    ingest(spark, cfg, changelog_df=events, mode="mor")
    got = LakeTable(spark, cfg.lake_path).read()
    full = expected_state(events, make_cfg(tmp_path / "unused"))
    expected = full.where(token_expr("url") <= mid)
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0
    assert got.count() < full.count()

def test_asof_join_matches_lake_built_up_to_timestamp(spark, events, tmp_path):
    """Cross-check of the two point-in-time paths: for sampled cut
    timestamps T, the event-stream as-of join probed at T must agree
    per key with a lake ingested from only the events at-or-before T
    (deleted winners absent from the lake, matched as op='D' by the
    as-of join)."""
    from cassandra_data_migrator_spark.operators.asof import asof_join

    tmin, tmax = events.agg(F.min("warc_ts"), F.max("warc_ts")).first()
    cuts = [tmin + (tmax - tmin) * f for f in (0.33, 0.66, 1.0)]
    urls = [r["url"] for r in events.select("url").distinct().limit(60).collect()]
    # right side unique per (key, ts): collapse ts-ties by max seq —
    # the same (ts, seq) ordering the lake's LWW fold uses
    right = (
        events.groupBy("url", "warc_ts")
        .agg(F.max_by(F.struct("seq", "text", "op"), "seq").alias("_w"))
        .select("url", "warc_ts", "_w.*")
    )
    for i, cut in enumerate(cuts):
        cfg = make_cfg(tmp_path / f"t{i}")
        ingest(spark, cfg,
               changelog_df=events.where(F.col("warc_ts") <= F.lit(cut)),
               mode="mor")
        lake_rows = {
            r["url"]: (r["seq"], r["text"])
            for r in LakeTable(spark, cfg.lake_path).read()
            .where(F.col("url").isin(urls)).collect()
        }
        probes = spark.createDataFrame(
            [(u, cut) for u in urls], "url string, warc_ts timestamp"
        )
        got = asof_join(
            probes, right, ["url"], "warc_ts",
            {"seq": "w_seq", "text": "w_text", "op": "w_op"},
        ).collect()
        assert len(got) == len(urls)
        checked_live = 0
        for r in got:
            if r["w_seq"] is None or r["w_op"] == "D":
                assert r["url"] not in lake_rows, (i, r["url"])
            else:
                assert lake_rows.get(r["url"]) == (r["w_seq"], r["w_text"]), (i, r["url"])
                checked_live += 1
        assert checked_live > 0

def test_auto_lww_salts_skewed_epoch_only(spark, tmp_path):
    """lww_strategy='auto': an epoch dominated by a single key engages
    the salted two-phase fold (recorded in RunResult.epochs_salted);
    a uniform epoch stays skinny; final state matches the one-shot fold
    either way."""
    import datetime

    base_ts = datetime.datetime(2026, 1, 1)
    rows = []
    # epoch 0: 400 rows, ONE key (degenerate skew)
    for i in range(400):
        rows.append((i, i % 8, "U", "https://hot", base_ts + datetime.timedelta(seconds=i),
                     None, f"v{i}", None, 0))
    # epoch 1: 400 rows over 200 keys (uniform)
    for i in range(400):
        rows.append((400 + i, i % 8, "U", f"https://u/{i % 200}",
                     base_ts + datetime.timedelta(seconds=400 + i), None, f"w{i}", None, 1))
    from cassandra_data_migrator_spark.streaming.replay import WAL_SCHEMA
    events = spark.createDataFrame(rows, WAL_SCHEMA)

    cfg = make_cfg(tmp_path, skew_min_rows=100, num_partitions=8)
    res = ingest(spark, cfg, changelog_df=events, mode="mor", lww_strategy="auto")
    assert res.epochs_salted == [0]
    lake = LakeTable(spark, cfg.lake_path)
    actual = lake.read()
    expected = expected_state(events, cfg)
    assert actual.exceptAll(expected).count() == 0
    assert expected.exceptAll(actual).count() == 0
    # the hot key folded to its single (ts, seq)-max winner
    hot = actual.where("url = 'https://hot'").collect()
    assert len(hot) == 1 and hot[0]["text"] == "v399"


def test_time_travel_reads_and_vacuum(spark, events, tmp_path):
    """Snapshot reads: read(version=v) must reproduce the table exactly
    as it stood when v was CURRENT — across MoR commits and compaction.
    vacuum(retain_last=1) then deletes every data file the current
    manifest doesn't reference, keeps the current read byte-identical,
    and makes old versions raise."""
    import os

    def count_parquet() -> int:
        return sum(
            fn.endswith(".parquet")
            for _, _, fns in os.walk(str(tmp_path / "lake"))
            for fn in fns
        )

    cfg = make_cfg(tmp_path)
    snaps = {}
    lake = None
    for upto in (3, 6):
        ingest(spark, cfg,
               changelog_df=events.where(F.col("batch_epoch") < upto),
               mode="mor")
        lake = LakeTable(spark, cfg.lake_path)
        snaps[lake.manifest().version] = {
            tuple(r) for r in lake.read().collect()
        }
    assert len(snaps) == 2
    v1, v2 = sorted(snaps)
    assert {tuple(r) for r in lake.read(version=v1).collect()} == snaps[v1]
    assert {tuple(r) for r in lake.read(version=v2).collect()} == snaps[v2]
    assert lake.versions()[-1] == v2
    # vacuum: current read unchanged, old versions gone, files deleted
    n_before = count_parquet()
    removed = lake.vacuum(retain_last=1)
    assert removed > 0
    assert {tuple(r) for r in lake.read().collect()} == snaps[v2]
    with pytest.raises(ValueError, match="retained"):
        lake.read(version=v1)
    assert count_parquet() == n_before - removed


def test_vacuum_survives_swap_crash_orphan(spark, events, tmp_path):
    """_swap publishes v{N}.json BEFORE swapping CURRENT; a crash in
    that window leaves an orphan manifest newer than CURRENT. vacuum
    must still retain the CURRENT-pointed manifest and its data files —
    counting retention from the newest file would delete the live
    version and brick the table."""
    import json
    import os
    import shutil

    cfg = make_cfg(tmp_path)
    ingest(spark, cfg, changelog_df=events.where(F.col("batch_epoch") < 3),
           mode="mor")
    lake = LakeTable(spark, cfg.lake_path)
    cur_v = lake.manifest().version
    before = {tuple(r) for r in lake.read().collect()}
    # forge the crash: an orphan manifest at cur_v+1 referencing a
    # compact-shaped rewrite (no files in common with CURRENT), with
    # CURRENT still pointing at cur_v
    mdir = os.path.join(str(tmp_path / "lake"), "_manifests")
    with open(os.path.join(mdir, f"v{cur_v:08d}.json")) as f:
        mf = json.load(f)
    mf["version"] = cur_v + 1
    mf["base"] = {"0": []}
    mf["deltas"] = {}
    with open(os.path.join(mdir, f"v{cur_v + 1:08d}.json"), "w") as f:
        json.dump(mf, f)
    lake.vacuum(retain_last=1)
    # the CURRENT-pointed manifest survives and the table still reads
    assert lake.manifest().version == cur_v
    assert {tuple(r) for r in lake.read().collect()} == before
    shutil.rmtree(str(tmp_path / "lake"), ignore_errors=True)
