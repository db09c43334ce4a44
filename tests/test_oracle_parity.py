"""Oracle-parity gate: every queries() entry must match its DuckDB
oracle at sf0.001 (the driver's correctness check, run locally).

Runs tools/check_parity.py in a subprocess so the comparison uses its
own Spark session exactly as the driver would."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_all_queries_match_oracles():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_parity.py")],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
    )
    tail = "\n".join(proc.stdout.splitlines()[-40:])
    assert proc.returncode == 0, f"parity failures:\n{tail}\n{proc.stderr[-2000:]}"
    assert "ALL MATCH" in proc.stdout


def test_top10_queries_match_oracles_at_sf01():
    """Scale-dependent-divergence gate (VERDICT r4 #8): the ten most
    expensive swept queries re-checked against DuckDB at sf0.1 — 100x
    the default gate's rows — to catch overflow, spill-ordering and
    hash-collision divergence the small SFs cannot. Opt-in (slow):

        CDM_PARITY_SF01=1 python -m pytest tests/test_oracle_parity.py -k sf01
    """
    import pytest

    if not os.environ.get("CDM_PARITY_SF01"):
        pytest.skip("set CDM_PARITY_SF01=1 to run the sf0.1 parity gate")
    top10 = [
        "webtext_full_prep", "dedup_incremental", "dedup_minhash_pairs",
        "dedup_ngram_jaccard", "embed_cosine_pairs", "dedup_simhash_pairs",
        "webtext_budget", "webtext_pipeline", "ann_lsh_topk", "asof_state",
    ]
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_parity.py"),
         "/root/testdata/sf0.1", *top10],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    tail = "\n".join(proc.stdout.splitlines()[-20:])
    assert proc.returncode == 0, f"sf0.1 parity failures:\n{tail}\n{proc.stderr[-2000:]}"
    assert "ALL MATCH" in proc.stdout
