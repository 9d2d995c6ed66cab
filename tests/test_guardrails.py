from __future__ import annotations

import time

import pytest

from moloch_spark.guardrails import Guardrails, GuardrailError, run_with_timeout
from moloch_spark.sources.tables import load_table


def test_caps():
    g = Guardrails()
    assert g.cap_k(50_000) == 10_000
    assert g.cap_k(5) == 5
    assert g.cap_length(10_000_000) == 2_000_000
    g.check_partition_count(4)
    with pytest.raises(GuardrailError, match="spiDataMaxIndices"):
        g.check_partition_count(5)


def test_run_with_timeout_completes(spark):
    ev = load_table(spark, "events", "/root/testdata/sf0.001")
    n = run_with_timeout(spark, lambda: ev.count(), timeout_s=120)
    assert n == 1000


def test_run_with_timeout_cancels(spark):
    def slow():
        time.sleep(20)
        return 1

    t0 = time.time()
    with pytest.raises(TimeoutError):
        run_with_timeout(spark, slow, timeout_s=2)
    assert time.time() - t0 < 15
