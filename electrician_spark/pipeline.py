"""Pipeline facade — the electrician-shaped builder API.

Maps the reference's component model onto lazy DataFrame plan
composition (SURVEY §3.1-3.2):

- ``Wire``      one transform stage: ordered chain of operations
                (reference wire.Wire[T] transformer chain,
                /root/reference/pkg/internal/wire/wire.go:14-68;
                transform chain transform.go:94-120)
- ``Conduit``   ordered composition of wires — output of wire N feeds
                wire N+1 (conduit/wiring.go:81-98). In Spark this is
                function composition over one logical plan: no
                materialization between stages, Catalyst optimizes the
                whole chain (narrow stages fuse into one codegen span).
- ``Pipeline``  source → conduit → sink(s); ``run()`` executes batch,
                ``collect()`` is the reference's ``Load()``
                (wire/load.go:11-50); fan-out to multiple sinks reuses
                the one plan (C4).

Construction never executes anything — exactly like the reference,
where builder options only mutate config and nothing runs until
``Start`` (wire/lifecycle.go:13-66). Mutation after start panics in the
reference (wire/immutability.go:6); here ``freeze()`` gives the same
guard.

Transformers: prefer Column expressions (JVM-side); ``map_batches``
accepts a pandas-batch function (Arrow path) for logic that genuinely
needs Python — the analog of the reference's transformer factory with
worker-local state (T7: each partition gets its own iterator state).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession

from electrician_spark.reliability import with_dlq_split


class FrozenPipelineError(RuntimeError):
    """Mutation after start (reference: immutability.go panic)."""


class Wire:
    """One logical transform stage: an ordered list of plan edits."""

    def __init__(self, name: str = "wire"):
        self.name = name
        self._ops: list[Callable[[DataFrame], DataFrame]] = []
        self._frozen = False

    def _add(self, op: Callable[[DataFrame], DataFrame]) -> "Wire":
        if self._frozen:
            raise FrozenPipelineError(f"wire {self.name!r} is frozen (already started)")
        self._ops.append(op)
        return self

    # -- the transformer vocabulary (reference Transformer[T]) --------
    def transform(self, fn: Callable[[DataFrame], DataFrame]) -> "Wire":
        """Arbitrary DataFrame → DataFrame plan edit."""
        return self._add(fn)

    def with_column(self, name: str, col: Column) -> "Wire":
        return self._add(lambda df: df.withColumn(name, col))

    def select(self, *cols) -> "Wire":
        return self._add(lambda df: df.select(*cols))

    def filter(self, cond: Column) -> "Wire":
        """Drop-semantics filter (reference models filters as
        flag-setting or divert; builder.Filter is the slice helper,
        pkg/builder/utils.go:27-29)."""
        return self._add(lambda df: df.filter(cond))

    def map_batches(
        self, fn: Callable[[pd.DataFrame], pd.DataFrame], schema: str | Any
    ) -> "Wire":
        """Arrow-batched Python transform (mapInPandas). The per-batch
        function may hold per-partition state — the transformer-factory
        pattern (T7, pkg/builder/wire.go:76-80)."""

        def op(df: DataFrame) -> DataFrame:
            def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                for b in batches:
                    yield fn(b)

            return df.mapInPandas(gen, schema)

        return self._add(op)

    def apply(self, df: DataFrame) -> DataFrame:
        self._frozen = True
        for op in self._ops:
            df = op(df)
        return df


class Conduit:
    """Ordered wire composition (reference conduit chaining — plan
    composition, not materialization)."""

    def __init__(self, *wires: Wire, name: str = "conduit"):
        self.name = name
        self._wires = list(wires)
        self._frozen = False

    def add(self, wire: Wire) -> "Conduit":
        if self._frozen:
            raise FrozenPipelineError(f"conduit {self.name!r} is frozen")
        self._wires.append(wire)
        return self

    def then(self, other: "Conduit") -> "Conduit":
        """NextConduit forwarding (conduit/lifecycle.go:60-77) = concat."""
        return Conduit(*self._wires, *other._wires, name=f"{self.name}->{other.name}")

    def apply(self, df: DataFrame) -> DataFrame:
        self._frozen = True
        for w in self._wires:
            df = w.apply(df)
        return df


class Pipeline:
    """source → conduit → sinks. Batch-first; streaming pipelines use
    streaming.sinks.ForEachBatchRouter with the same conduit."""

    def __init__(self, name: str = "pipeline"):
        self.name = name
        self._source: Callable[[SparkSession], DataFrame] | None = None
        self._conduit = Conduit(name=f"{name}.conduit")
        self._sinks: list[Callable[[DataFrame], None]] = []
        self._dlq_sink: Callable[[DataFrame], None] | None = None
        self._dlq_condition: Column | None = None
        self._started = False

    # -- sources (reference plugs/adapters) ----------------------------
    def source(self, fn: Callable[[SparkSession], DataFrame]) -> "Pipeline":
        self._check_mutable()
        self._source = fn
        return self

    def source_df(self, df: DataFrame) -> "Pipeline":
        return self.source(lambda _s: df)

    def source_union(self, *fns: Callable[[SparkSession], DataFrame]) -> "Pipeline":
        """Fan-in (C3): multiple generators feed one wire = unionByName."""
        self._check_mutable()

        def merged(spark: SparkSession) -> DataFrame:
            dfs = [fn(spark) for fn in fns]
            out = dfs[0]
            for d in dfs[1:]:
                out = out.unionByName(d)
            return out

        self._source = merged
        return self

    # -- transforms -----------------------------------------------------
    def wire(self, wire: Wire) -> "Pipeline":
        self._check_mutable()
        self._conduit.add(wire)
        return self

    def transform(self, fn: Callable[[DataFrame], DataFrame]) -> "Pipeline":
        return self.wire(Wire().transform(fn))

    def filter(self, cond: Column) -> "Pipeline":
        return self.wire(Wire().filter(cond))

    # -- error path (C5/C6 neutral wires / DLQ) --------------------------
    def dlq(self, condition: Column, sink: Callable[[DataFrame], None] | None = None) -> "Pipeline":
        """Rows matching ``condition`` divert to the DLQ sink instead of
        the main output (reference error channel wire/error.go:5-48 and
        Kafka writer DLQ topic, types/kafka_adapter.go:79-80)."""
        self._check_mutable()
        self._dlq_condition = condition
        self._dlq_sink = sink
        return self

    # -- sinks (fan-out C4: one plan, many writers) ----------------------
    def sink(self, fn: Callable[[DataFrame], None]) -> "Pipeline":
        self._check_mutable()
        self._sinks.append(fn)
        return self

    # -- execution -------------------------------------------------------
    def plan(self, spark: SparkSession) -> DataFrame:
        """The composed DataFrame plan (lazy; nothing executes)."""
        if self._source is None:
            raise ValueError(f"pipeline {self.name!r} has no source")
        df = self._source(spark)
        df = self._conduit.apply(df)
        if self._dlq_condition is not None:
            good, bad = with_dlq_split(df, self._dlq_condition)
            if self._dlq_sink is not None:
                self._dlq_sink(bad)
            df = good
        return df

    def run(self, spark: SparkSession) -> DataFrame:
        """Start (lifecycle.go:13-66): build the plan, feed every sink.
        Returns the final DataFrame for chaining/inspection."""
        self._started = True
        df = self.plan(spark)
        for s in self._sinks:
            s(df)
        return df

    def collect(self, spark: SparkSession) -> list:
        """The reference's Load(): drain results to memory
        (wire/load.go:11-50). Only for bounded/test data."""
        return self.run(spark).collect()

    def _check_mutable(self) -> None:
        if self._started:
            raise FrozenPipelineError(f"pipeline {self.name!r} already started")
