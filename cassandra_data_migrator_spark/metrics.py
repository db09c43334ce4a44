"""CDM-style run metrics.

Mirrors the reference's typed counter set (``job/JobCounter.java:28-57``:
READ, WRITE, MISMATCH, CORRECTED_MISMATCH, MISSING, CORRECTED_MISSING,
VALID, SKIPPED, LARGE, ERROR) and its global merge semantics
(``job/CDMMetricsAccumulator.java:22-61`` merges per-range counters via
an AccumulatorV2). Here per-batch counters are produced by
``pyspark.sql.Observation`` (metrics ride the existing action — no extra
job) and merged into a plain dict; the final print matches CDM's
"Final <type> Record Count" log lines (``JobCounter.java:151-171``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

COUNTER_TYPES = (
    "READ",
    "WRITE",
    "MISMATCH",
    "CORRECTED_MISMATCH",
    "MISSING",
    "CORRECTED_MISSING",
    "VALID",
    "SKIPPED",
    "LARGE",
    "ERROR",
)


@dataclass
class JobCounter:
    counts: dict[str, int] = field(default_factory=lambda: {t: 0 for t in COUNTER_TYPES})

    def add(self, counter_type: str, n: int = 1) -> None:
        if counter_type not in self.counts:
            raise KeyError(f"unknown counter type {counter_type!r}")
        self.counts[counter_type] += int(n)

    def get(self, counter_type: str) -> int:
        return self.counts[counter_type]

    def merge(self, other: "JobCounter") -> "JobCounter":
        for t, v in other.counts.items():
            self.counts[t] = self.counts.get(t, 0) + v
        return self

    def as_dict(self) -> dict[str, int]:
        return dict(self.counts)

    def print_final(self, job_type: str = "JobCounter") -> None:
        # format mirrors JobCounter.printFinal (JobCounter.java:151-171),
        # asserted by the reference's SIT harness (SIT/cdm-assert.sh:1-35)
        print(f"################################################################################################")
        for t in COUNTER_TYPES:
            if self.counts.get(t, 0) or t in ("READ", "WRITE", "VALID"):
                label = t.replace("_", " ").title()
                print(f"Final {label} Record Count: {self.counts.get(t, 0)}")
        print(f"################################################################################################")
