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
