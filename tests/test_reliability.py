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


def test_dlq_split_null_condition_routes_to_dlq(spark):
    # 3VL hazard (r15 review): filter(cond)/filter(~cond) both exclude
    # a NULL condition — the row would vanish from BOTH sides. A DLQ
    # must never lose rows: NULL-cond rows go to the DLQ.
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -1.0)], "id int, amount double"
    )
    good, bad = with_dlq_split(df, F.col("amount") < 0)
    assert sorted(r.id for r in good.collect()) == [1]
    assert sorted(r.id for r in bad.collect()) == [2, 3]


def test_breaker_half_open_trial_failure_reopens():
    # A failed half-open trial must re-open IMMEDIATELY — neither the
    # debounce nor the rolling window applies to the trial (r15 review:
    # debounce_sec=5 with reset_timeout=3 left the breaker permanently
    # permissive after a failed trial).
    clk = FakeClock()
    cb = CircuitBreaker(
        threshold=1, window_sec=60, reset_timeout_sec=3, debounce_sec=5, clock=clk
    )
    cb.record_error()
    assert cb.is_open()
    clk.advance(3.5)  # half-open
    assert cb.is_half_open()
    cb.record_error()  # trial fails (would be debounced away before)
    assert cb.is_open()
    # window-expiry variant: all prior errors aged out at trial time
    clk2 = FakeClock()
    cb2 = CircuitBreaker(threshold=3, window_sec=60, reset_timeout_sec=90, clock=clk2)
    for _ in range(3):
        cb2.record_error()
        clk2.advance(1)
    assert cb2.is_open()
    clk2.advance(90)
    assert cb2.is_half_open()
    cb2.record_error()  # trial failure; window is empty but must re-open
    assert cb2.is_open()


def test_retry_table_stamps_priority_and_drains_deterministically(spark):
    # input without a priority column gets priority 0 stamped at
    # enqueue (the priority_col parameter was dead before r15), and a
    # drain with no id_cols still picks a deterministic set (tiebreak
    # over payload columns).
    failed = spark.createDataFrame([(3,), (1,), (2,)], "id int")
    table = to_retry_table(failed)
    assert "priority" in table.columns
    a = sorted(r.id for r in drain_retry_table(table, 2).collect())
    b = sorted(r.id for r in drain_retry_table(table, 2).collect())
    assert a == b == [1, 2]  # equal priorities → payload-column tiebreak


def test_retry_table_roundtrip(spark):
    failed = spark.createDataFrame([(1, 5), (2, 9), (3, 1)], "id int, priority int")
    table = to_retry_table(failed)
    assert "retry_count" in table.columns and "_enqueued_at" in table.columns
    drained = drain_retry_table(table, 2, id_cols=("id",)).collect()
    # same enqueue time ⇒ order by base priority desc
    assert [r.id for r in drained] == [2, 1]
    assert all(r.retry_count == 1 for r in drained)
