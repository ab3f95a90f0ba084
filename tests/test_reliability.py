"""Reliability layer tests — mirrors the reference's circuit-breaker /
surge-protector suites (circuitbreaker_test.go, surgeprotector_test.go):
trip, auto-reset, debounce, token bucket refill, retry-then-CB, and the
retry-table drain."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from electrician_spark.reliability import (
    CircuitBreaker,
    CircuitOpenError,
    TokenBucket,
    drain_retry_table,
    retry_call,
    to_retry_table,
    with_dlq_split,
)


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t

    def advance(self, dt):
        self.t += dt


def test_breaker_trips_and_auto_resets():
    clk = FakeClock()
    cb = CircuitBreaker(threshold=3, window_sec=60, reset_timeout_sec=30, clock=clk)
    for _ in range(3):
        cb.record_error()
    assert cb.is_open()
    clk.advance(31)
    assert not cb.is_open() and cb.is_half_open()
    cb.record_success()  # half-open trial succeeds → closed
    assert not cb.is_open() and not cb.is_half_open()


def test_breaker_debounce_collapses_bursts():
    clk = FakeClock()
    cb = CircuitBreaker(threshold=3, window_sec=60, debounce_sec=5, clock=clk)
    for _ in range(10):  # burst within debounce window counts once
        cb.record_error()
    assert not cb.is_open()


def test_breaker_window_expires_errors():
    clk = FakeClock()
    cb = CircuitBreaker(threshold=3, window_sec=10, clock=clk)
    cb.record_error()
    clk.advance(11)
    cb.record_error()
    clk.advance(11)
    cb.record_error()
    assert not cb.is_open()  # never 3 errors inside one window


def test_breaker_call_raises_while_open():
    clk = FakeClock()
    cb = CircuitBreaker(threshold=1, reset_timeout_sec=30, clock=clk)
    with pytest.raises(ValueError):
        cb.call(lambda: (_ for _ in ()).throw(ValueError("boom")))
    assert cb.is_open()
    with pytest.raises(CircuitOpenError):
        cb.call(lambda: 1)
    clk.advance(31)
    assert cb.call(lambda: 42) == 42  # half-open trial closes
    assert not cb.is_open()


def test_retry_call_retries_then_succeeds():
    attempts = []

    def flaky():
        attempts.append(1)
        if len(attempts) < 3:
            raise RuntimeError("transient")
        return "ok"

    assert retry_call(flaky, max_retries=3, sleep=lambda _t: None) == "ok"
    assert len(attempts) == 3


def test_retry_exhaustion_records_into_breaker():
    cb = CircuitBreaker(threshold=1)
    with pytest.raises(RuntimeError):
        retry_call(
            lambda: (_ for _ in ()).throw(RuntimeError("hard")),
            max_retries=2,
            breaker=cb,
            sleep=lambda _t: None,
        )
    assert cb.is_open()


def test_token_bucket_refill():
    clk = FakeClock()
    tb = TokenBucket(capacity=2, refill_per_sec=1, clock=clk)
    assert tb.try_take() and tb.try_take()
    assert not tb.try_take()  # empty
    clk.advance(1.5)
    assert tb.try_take()  # refilled one
    assert not tb.try_take()


def test_dlq_split(spark):
    df = spark.createDataFrame([(1, "ok"), (2, "error"), (3, "ok")], "id int, status string")
    good, bad = with_dlq_split(df, F.col("status") == "error")
    assert sorted(r.id for r in good.collect()) == [1, 3]
    assert [r.id for r in bad.collect()] == [2]
    assert "_error" not in good.columns


def test_retry_table_roundtrip(spark):
    failed = spark.createDataFrame([(1, 5), (2, 9), (3, 1)], "id int, priority int")
    table = to_retry_table(failed)
    assert "retry_count" in table.columns and "_enqueued_at" in table.columns
    drained = drain_retry_table(table, 2, id_cols=("id",)).collect()
    # same enqueue time ⇒ order by base priority desc
    assert [r.id for r in drained] == [2, 1]
    assert all(r.retry_count == 1 for r in drained)
