"""Streaming sinks — the foreachBatch router.

Re-expresses the reference's sink-side control plane (SURVEY §2.7,
§2.11) at micro-batch granularity:

- fan-out (C4): one micro-batch, many writers — persist once, write N
  times (kafkaclient adapters attaching to multiple wires).
- blackout window (W5, surgeprotector/config.go:18-54): batches
  arriving inside [start,end) are stashed or dropped, not written.
- backup reroute (W6, surgeprotector/submit.go:17-32): while a breaker
  is open, batches go to backup sinks instead of primary.
- DLQ (C6): the error split writes to a dead-letter path.
- threshold abort (A4, meter/monitor.go:37-52): stop the query when the
  error ratio crosses a threshold.

Everything here is driver-side orchestration over declarative writes —
the per-batch work itself stays in the JVM.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from electrician_spark.reliability import CircuitBreaker, CircuitOpenError

Sink = Callable[[DataFrame, int], None]


def parquet_sink(path: str) -> Sink:
    def write(df: DataFrame, _epoch: int) -> None:
        df.write.mode("append").parquet(path)

    return write


def ndjson_sink(path: str) -> Sink:
    def write(df: DataFrame, _epoch: int) -> None:
        df.write.mode("append").json(path)

    return write


def memory_sink(buffer: list) -> Sink:
    """Test sink: drain to a driver-side list (reference Load())."""

    def write(df: DataFrame, _epoch: int) -> None:
        buffer.extend(df.collect())

    return write


@dataclass
class Blackout:
    """Trip between start/end (reference blackout window)."""

    start: dt.time
    end: dt.time
    clock: Callable[[], dt.datetime] = dt.datetime.utcnow

    def active(self) -> bool:
        now = self.clock().time()
        if self.start <= self.end:
            return self.start <= now < self.end
        return now >= self.start or now < self.end  # crosses midnight


@dataclass
class ForEachBatchRouter:
    """The foreachBatch body: fan-out + blackout + breaker/backup + DLQ.

    Use: ``query = df.writeStream.foreachBatch(router).start()`` or call
    directly per-batch in tests. Semantics per batch:

    1. blackout active → send to ``stash`` (or drop if none)
    2. breaker open → send to ``backups`` (reference: tripped surge
       protector submits to backup submitters)
    3. else → every primary sink gets the batch; DLQ split applied
       first when an ``error_condition`` is configured
    """

    sinks: list[Sink] = field(default_factory=list)
    backups: list[Sink] = field(default_factory=list)
    dlq_sink: Sink | None = None
    error_condition: object | None = None  # pyspark Column
    breaker: CircuitBreaker | None = None
    blackout: Blackout | None = None
    stash: Sink | None = None
    error_ratio_abort: float | None = None
    on_abort: Callable[[], None] | None = None

    def __call__(self, batch: DataFrame, epoch_id: int) -> None:
        if self.blackout is not None and self.blackout.active():
            if self.stash is not None:
                self.stash(batch, epoch_id)
            return

        if self.breaker is not None and self.breaker.is_open():
            for b in self.backups:
                b(batch, epoch_id)
            return

        main = batch
        if self.error_condition is not None:
            from electrician_spark.reliability import with_dlq_split

            main, bad = with_dlq_split(batch, self.error_condition)
            if self.dlq_sink is not None:
                self.dlq_sink(bad, epoch_id)
            if self.error_ratio_abort is not None:
                total = batch.count()
                n_bad = bad.count()
                if total and n_bad / total >= self.error_ratio_abort:
                    if self.on_abort is not None:
                        self.on_abort()
                    raise RuntimeError(
                        f"error ratio {n_bad}/{total} >= {self.error_ratio_abort} — aborting"
                    )

        if len(self.sinks) > 1:
            main = main.persist()
        try:
            run = lambda: [s(main, epoch_id) for s in self.sinks]  # noqa: E731
            if self.breaker is not None:
                try:
                    self.breaker.call(run)
                except CircuitOpenError:
                    for b in self.backups:
                        b(main, epoch_id)
            else:
                run()
        finally:
            if len(self.sinks) > 1:
                main.unpersist()
