"""Job-orchestration coverage (SURVEY ST10 beyond triggers; r3 verdict
"What's missing" #3): interval cadence, boot-time runs, failure
isolation, per-job metrics — deterministic via an injected clock."""

from __future__ import annotations

import pytest

from algorithmic_data_ingestion_for_cryptocurrencies_spark.streaming.scheduler import (
    JobScheduler,
)


class FakeClock:
    def __init__(self) -> None:
        self.t = 0.0

    def __call__(self) -> float:
        return self.t


def test_boot_run_and_interval_cadence():
    clock = FakeClock()
    sched = JobScheduler(clock=clock)
    calls: list[str] = []
    sched.add_job("boot", lambda: calls.append("boot"),
                  interval_seconds=60, run_on_start=True)
    sched.add_job("lazy", lambda: calls.append("lazy"), interval_seconds=30)

    assert sched.run_pending() == ["boot"]          # boot fires at t=0
    clock.t = 29
    assert sched.run_pending() == []                # nothing due yet
    clock.t = 30
    assert sched.run_pending() == ["lazy"]
    clock.t = 61
    assert sorted(sched.run_pending()) == ["boot", "lazy"]
    assert calls == ["boot", "lazy", "boot", "lazy"]


def test_late_wakeup_does_not_drift_cadence():
    clock = FakeClock()
    sched = JobScheduler(clock=clock)
    sched.add_job("j", lambda: None, interval_seconds=10)
    clock.t = 35                                    # slept through 3 slots
    assert sched.run_pending() == ["j"]             # one catch-up run
    assert sched.next_runs()["j"] == 40             # grid-aligned, not 45


def test_failure_recorded_and_cadence_kept():
    clock = FakeClock()
    sched = JobScheduler(clock=clock)
    n = {"v": 0}

    def flaky():
        n["v"] += 1
        if n["v"] == 1:
            raise RuntimeError("ingest blew up")

    sched.add_job("flaky", flaky, interval_seconds=10, run_on_start=True)
    sched.run_pending()
    m = sched.metrics()["flaky"]
    assert m["runs"] == 1 and m["failures"] == 1
    assert "ingest blew up" in m["last_error"]
    clock.t = 10                                    # slot survived the failure
    sched.run_pending()
    m = sched.metrics()["flaky"]
    assert m["runs"] == 2 and m["failures"] == 1


def test_duration_metrics_use_injected_clock():
    clock = FakeClock()
    sched = JobScheduler(clock=clock)

    def slow():
        clock.t += 2.5                              # job "takes" 2.5s

    sched.add_job("slow", slow, interval_seconds=10, run_on_start=True)
    sched.run_pending()
    m = sched.metrics()["slow"]
    assert m["duration_last"] == pytest.approx(2.5)
    assert m["duration_mean"] == pytest.approx(2.5)
    assert m["duration_min"] == pytest.approx(2.5)


def test_validation():
    sched = JobScheduler(clock=FakeClock())
    sched.add_job("a", lambda: None, interval_seconds=5)
    with pytest.raises(ValueError):
        sched.add_job("a", lambda: None, interval_seconds=5)
    with pytest.raises(ValueError):
        sched.add_job("b", lambda: None, interval_seconds=0)


def test_orchestrates_real_spark_jobs(spark, tmp_path):
    """End-to-end: two scheduled jobs submit real Spark work (a batch
    write and a compaction probe) on their own cadences."""
    from algorithmic_data_ingestion_for_cryptocurrencies_spark.sources.lake import (
        storage_probe,
    )

    clock = FakeClock()
    sched = JobScheduler(clock=clock)
    out = str(tmp_path / "cadence")
    results: list[bool] = []

    def ingest():
        spark.range(100).write.mode("append").parquet(out)

    sched.add_job("ingest", ingest, interval_seconds=60, run_on_start=True)
    sched.add_job("probe", lambda: results.append(storage_probe(spark, str(tmp_path))),
                  interval_seconds=120)

    sched.run_pending()                             # boot ingest
    clock.t = 60
    sched.run_pending()                             # second ingest
    clock.t = 120
    sched.run_pending()                             # third ingest + probe
    assert spark.read.parquet(out).count() == 300
    assert results == [True]
    m = sched.metrics()
    assert m["ingest"]["runs"] == 3 and m["ingest"]["failures"] == 0
    assert m["probe"]["runs"] == 1
