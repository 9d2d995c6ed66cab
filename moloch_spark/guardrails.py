"""Guardrails — the reference's protective limits, enforced engine-side.

| Limit | Reference | Here |
|---|---|---|
| maxAggSize 10000 buckets | viewer/apiSessions.js:2294 | cap on top-K k |
| spiDataMaxIndices 4 | viewer/apiSessions.js:1799 | cap on partitions a facet query may touch |
| length cap 2,000,000 | viewer/apiSessions.js:1219 | sessions_search max_length |
| esQueryTimeout 300s | viewer/internals.js:17 | job-group cancel timer |
"""

from __future__ import annotations

import threading
from dataclasses import dataclass


class GuardrailError(RuntimeError):
    pass


@dataclass
class Guardrails:
    max_agg_size: int = 10_000
    spi_data_max_indices: int = 4
    max_length: int = 2_000_000
    query_timeout_s: int = 300

    def cap_k(self, k: int) -> int:
        return min(k, self.max_agg_size)

    def cap_length(self, n: int) -> int:
        return min(n, self.max_length)

    def check_partition_count(self, n_partitions: int) -> None:
        """spiDataMaxIndices analog: facet queries refuse to span more
        time-partitions than the cap (the reference caps, warns, and
        truncates; we fail loudly so the caller narrows the range)."""
        if n_partitions > self.spi_data_max_indices:
            raise GuardrailError(
                f"facet query spans {n_partitions} partitions > "
                f"spiDataMaxIndices={self.spi_data_max_indices}; narrow the "
                "time range"
            )


def run_with_timeout(spark, action, *, timeout_s: int, group: str = "guarded"):
    """Run a DataFrame action under a cancellable job group with a
    timeout — the esQueryTimeout + cancel-id machinery
    (viewer/apiSessions.js:1623-1625 -> spark.cancelJobGroup)."""
    sc = spark.sparkContext
    result: list = []
    error: list = []

    def target():
        sc.setJobGroup(group, f"guarded query ({timeout_s}s timeout)", True)
        try:
            result.append(action())
        except Exception as e:  # surfaced below
            error.append(e)

    t = threading.Thread(target=target, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        sc.cancelJobGroup(group)
        t.join(10)
        raise TimeoutError(f"query exceeded {timeout_s}s and was cancelled")
    if error:
        raise error[0]
    return result[0]
