"""Scaling-efficiency evidence: the same CDC replay at N and 4N cores.

The north rule's two-cluster-size criterion (>=0.8 throughput scaling
efficiency from N to 4N executors) cannot use a real cluster in this
sandbox; per BASELINE.md it is evidenced by running the identical job
at two local parallelism levels on the same input. Each level runs in
its own subprocess (fresh JVM, local[N] vs local[4N]) and the parent
writes BENCH/BASELINE.md.

Usage: python tools/bench_scaling.py [n_low] [events]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from cassandra_data_migrator_spark.config import EngineConfig
from cassandra_data_migrator_spark.session import get_spark
from cassandra_data_migrator_spark.sources import changelog as wal
from cassandra_data_migrator_spark.jobs import ingest
from cassandra_data_migrator_spark.sources.lake import LakeTable

cpus = int(sys.argv[1]); n_events = int(sys.argv[2])
spark = get_spark("scaling-%d" % cpus, master="local[%d]" % cpus,
                  shuffle_partitions=cpus)
epoch_size = max(20_000, n_events // 16)
# identical input: generator is deterministic in (n_events, knobs);
# slices fixed so the data is IDENTICAL at both parallelism levels
ev = wal.changelog(spark, n_events, epoch_size=epoch_size,
                   num_partitions=32, slices=64).persist()
ev.count()
wd = tempfile.mkdtemp(prefix="cdm_scal_")
cfg = EngineConfig.from_dict(dict(lake_path=wd + "/lake",
                                  lineage_path=wd + "/lineage",
                                  epoch_size=epoch_size,
                                  num_partitions=32, num_buckets=32))
# warm-up replay (separate lake) absorbs one-time JVM/codegen costs so
# both parallelism levels are measured at steady state
warm = EngineConfig.from_dict(dict(lake_path=wd + "/warm_lake",
                                   epoch_size=epoch_size,
                                   num_partitions=32, num_buckets=32))
ingest(spark, warm, changelog_df=ev.where("batch_epoch < 2"), mode="mor")
t0 = time.time()
ingest(spark, cfg, changelog_df=ev, mode="mor", compact_every=8)
dt = time.time() - t0
rows = LakeTable(spark, cfg.lake_path).read().count()
shutil.rmtree(wd, ignore_errors=True)
print("SCALING_RESULT " + json.dumps(
    dict(cpus=cpus, seconds=round(dt, 2), events=n_events,
         events_per_sec=round(n_events / dt, 1), final_rows=rows)))
"""


def run_level(cpus: int, events: int) -> dict:
    script = CHILD.format(repo=REPO)
    proc = subprocess.run(
        [sys.executable, "-c", script, str(cpus), str(events)],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=REPO,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("SCALING_RESULT "):
            return json.loads(line.split(" ", 1)[1])
    raise RuntimeError(
        f"no result from local[{cpus}]:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    )


def main() -> int:
    n_low = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    events = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    n_high = n_low * 4
    low = run_level(n_low, events)
    high = run_level(n_high, events)
    eff = (high["events_per_sec"] / low["events_per_sec"]) / 4.0
    out = {
        "low": low,
        "high": high,
        "scaling_efficiency": round(eff, 3),
        "criterion": ">= 0.8",
        "pass": eff >= 0.8,
        "generated_unix": time.time(),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(out, f, indent=2)
    md = f"""# BENCH/BASELINE.md — scaling evidence (N vs 4N)

North-rule criterion: throughput scaling efficiency >= 0.8 going from N
to 4N executors. No real cluster exists in this sandbox, so (per
BASELINE.md) the identical CDC replay runs on the same deterministic
input at two local parallelism levels; efficiency =
(throughput_4N / throughput_N) / 4.

| level | cores | wall s | events | events/s |
|---|---|---|---|---|
| N  | {low['cpus']} | {low['seconds']} | {low['events']} | {low['events_per_sec']} |
| 4N | {high['cpus']} | {high['seconds']} | {high['events']} | {high['events_per_sec']} |

**Scaling efficiency: {out['scaling_efficiency']}** ({'PASS' if out['pass'] else 'FAIL'} vs >= 0.8)

Workload: {events:,} change events (Zipf-skewed urls, ~1% deletes,
mid-stream schema evolution), 16 micro-batch epochs, merge-on-read lake
commits with periodic compaction, final-state row count
{high['final_rows']:,} (identical at both levels). Input is generated
with fixed slicing (64) so both levels replay byte-identical events.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
