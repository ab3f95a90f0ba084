"""In-process fake Kafka broker as a Spark Python DataSource — the
executable contract test for the S4/K3 Kafka surfaces when no real
broker exists in the environment (reference integration posture:
kafkaclient_integration_test.go:24 runs the real client against
Redpanda; this module plays Redpanda's role for the option maps).

``format("kafka_fake")`` accepts the SAME option maps the real Spark
Kafka connector consumes — ``kafka_source_options(...)`` on the read
side, ``kafka_sink_options(...)`` + a ``kafka_frame(...)``-shaped
DataFrame on the write side — and round-trips records through a
disk-backed topic log (``brokerDir``), so producer framing, topic
routing, key-hash partitioning, header transport, offset assignment
and startingOffsets semantics are all EXECUTED, not just constructed.

Honored options (lowercased; Spark passes DataSource options
case-insensitively):
- write: ``topic`` (fallback when the frame has no topic column),
  ``numpartitions`` (partition count per topic, default 2; the real
  broker owns this), ``includeheaders`` (header transport on/off)
- read: exactly one of ``subscribe`` (comma-separated topics),
  ``assign`` (JSON ``{topic: [partition, ...]}`` — the real
  connector's explicit-partition form), or ``subscribepattern``
  (regex over topic names, re-resolved each plan), ``startingoffsets``
  earliest|latest|JSON offset map (``{topic: {"<part>": off}}`` with
  the real connector's sentinels: -2 = earliest, -1 = latest; batch
  queries REJECT latest in either form and streams honor both, like
  the real source; unlisted partitions start earliest — a leniency vs
  the real source's must-list-all assertion), ``endingoffsets``
  latest|JSON offset map (BATCH ONLY — the stream reader rejects it
  like the real source; -1 = latest, -2 rejected; exclusive end; an
  end beyond the partition's log end is CLAMPED to the log end — a
  documented leniency, the real batch source errors out-of-range;
  pinned in tests/test_kafka_fake.py),
  ``startingoffsetsbytimestamp`` (JSON, the reference's
  StartAt=timestamp), ``maxoffsetspertrigger`` (poll window cap per
  partition), ``includeheaders``
- ``kafka.*`` client options (bootstrap.servers, acks, compression,
  batch.size, linger.ms) are accepted and ignored — they configure a
  network client this fake replaces; the REAL connector consumes them.

Record timestamps use a synthetic logical clock (epoch + offset
seconds) so timestamp-based starts are deterministic and replayable.

Partitioning follows Kafka's contract shape: an explicit ``partition``
column wins, else crc32(key) % numPartitions, else partition 0 for
null keys (deterministic stand-in for round-robin, which is
batch-order-dependent on a real producer).

Scale posture: this is a TEST DOUBLE for contract execution, not a
transport — production reads/writes go through Spark's built-in
``format("kafka")`` with checkpointing (R5). Layout mirrors a log:
``brokerDir/<topic>/p<partition>/<segment>.jsonl`` with offsets
assigned by segment order at read time.
"""

from __future__ import annotations

import base64
import glob
import json
import os
import time
import uuid
import zlib
from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

KAFKA_SOURCE_SCHEMA = StructType(
    [
        StructField("key", BinaryType(), True),
        StructField("value", BinaryType(), True),
        StructField("headers", ArrayType(
            StructType([
                StructField("key", StringType(), False),
                StructField("value", BinaryType(), True),
            ])
        ), True),
        StructField("topic", StringType(), False),
        StructField("partition", IntegerType(), False),
        StructField("offset", LongType(), False),
        StructField("timestamp", TimestampType(), False),
        StructField("timestampType", IntegerType(), False),
    ]
)


def _opts(options: dict) -> dict:
    return {str(k).lower(): v for k, v in options.items()}


def _broker_dir(o: dict) -> str:
    d = o.get("brokerdir")
    if not d:
        raise ValueError("kafka_fake requires a brokerDir option")
    return d


def _subscription(
    o: dict,
) -> tuple[list[str] | None, dict[str, set[int]] | None, str | None]:
    """Resolve (topics, partition filter, topic pattern) from exactly
    one of ``subscribe`` / ``assign`` / ``subscribePattern`` — the real
    source's contract (it rejects zero or several). ``assign`` pins
    explicit partitions (JSON ``{topic: [partition, ...]}``);
    ``subscribePattern`` is a regex over topic names, re-resolved at
    every plan so topics created after a stream starts are discovered
    at the next trigger (the real source's pattern behavior)."""
    sub = o.get("subscribe")
    assign = o.get("assign")
    pat = o.get("subscribepattern")
    if sum(bool(x) for x in (sub, assign, pat)) != 1:
        raise ValueError(
            "kafka_fake read requires exactly one of `subscribe`, "
            "`assign`, or `subscribePattern` (like the real source)"
        )
    if sub:
        return [t.strip() for t in sub.split(",") if t.strip()], None, None
    if assign:
        amap = json.loads(assign)
        return sorted(amap), {t: {int(p) for p in ps} for t, ps in amap.items()}, None
    return None, None, str(pat)


class _TopicPartition(InputPartition):
    def __init__(self, topic: str, part_dir: str, partition: int) -> None:
        self.topic = topic
        self.part_dir = part_dir
        self.partition = partition


class KafkaFakeWriter(DataSourceWriter):
    """Consumes kafka_frame-shaped rows (value required; key / headers
    / topic / partition optional) and appends them to the topic log.
    One segment file per (task, topic, partition) — the append path is
    embarrassingly parallel, like a real producer's per-partition
    batches."""

    def __init__(self, options: dict, schema: StructType) -> None:
        o = _opts(options)
        self.dir = _broker_dir(o)
        self.default_topic = o.get("topic")
        self.n_partitions = int(o.get("numpartitions", "2"))
        self.include_headers = str(o.get("includeheaders", "true")).lower() == "true"
        self.fields = [f.name for f in schema.fields]

    def write(self, iterator) -> WriterCommitMessage:
        segments: dict[tuple[str, int], list[str]] = {}
        for row in iterator:
            d = row.asDict() if hasattr(row, "asDict") else dict(zip(self.fields, row))
            topic = d.get("topic") or self.default_topic
            if not topic:
                raise ValueError(
                    "record has no topic column and no `topic` write option "
                    "(the same contract the real Kafka sink enforces)"
                )
            part = d.get("partition")
            if part is None:
                key = d.get("key")
                part = (
                    zlib.crc32(str(key).encode()) % self.n_partitions
                    if key is not None
                    else 0
                )
            rec = {
                "key": None if d.get("key") is None else str(d["key"]),
                "value": None if d.get("value") is None else str(d["value"]),
            }
            headers = d.get("headers") if self.include_headers else None
            if headers is not None:
                rec["headers"] = [
                    [
                        h["key"] if isinstance(h, dict) else h.key,
                        base64.b64encode(
                            bytes(h["value"] if isinstance(h, dict) else h.value)
                        ).decode("ascii"),
                    ]
                    for h in headers
                ]
            segments.setdefault((topic, int(part)), []).append(json.dumps(rec))
        for (topic, part), lines in segments.items():
            pdir = os.path.join(self.dir, topic, f"p{part}")
            os.makedirs(pdir, exist_ok=True)
            # Segment names MUST sort in append order: offsets are
            # assigned by sorted(segment) position, so a later produce
            # sorting before an existing segment would renumber the
            # whole log (observed: random-uuid names broke streaming
            # checkpoint resume). time_ns prefix = monotonic across
            # produce calls; concurrent tasks in ONE write interleave
            # arbitrarily, like concurrent producers on a real broker,
            # but the order is frozen from then on.
            seg = os.path.join(pdir, f"{time.time_ns():020d}-{uuid.uuid4().hex[:8]}.jsonl")
            with open(seg, "w") as fh:
                fh.write("\n".join(lines) + "\n")
        return WriterCommitMessage()

    def commit(self, messages) -> None:  # log is append-only; segments are final
        return None

    def abort(self, messages) -> None:
        return None


class KafkaFakeReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        o = _opts(options)
        self.dir = _broker_dir(o)
        self.topics, self.assigned, self.pattern = _subscription(o)
        raw_start = str(o.get("startingoffsets", "earliest"))
        if raw_start.strip().startswith("{"):
            # the real connector's per-partition JSON form; sentinels
            # -2 = earliest, -1 = latest. Batch queries REJECT latest
            # (implicit or -1) like the real source; partitions absent
            # from the map start earliest (a documented leniency — the
            # real source asserts every partition is listed).
            self.start_json = json.loads(raw_start)
            self.starting = None
            bad = [
                f"{t}/{p}"
                for t, ps in self.start_json.items()
                for p, off in ps.items()
                if int(off) == -1
            ]
            if bad:
                raise ValueError(
                    f"startingOffsets can't be latest (-1) for batch "
                    f"queries (the real source's rule): {bad}"
                )
        else:
            self.start_json = None
            self.starting = raw_start.lower()
            if self.starting == "latest":
                raise ValueError(
                    "startingOffsets can't be 'latest' for batch queries "
                    "(the real source's rule)"
                )
            if self.starting != "earliest":
                # the real source rejects unknown strings — a typo like
                # 'earliestt' must not silently read the whole log
                raise ValueError(
                    f"startingOffsets must be 'earliest', 'latest' or a "
                    f"JSON offset map (got {raw_start!r})"
                )
        raw_end = str(o.get("endingoffsets", "latest"))
        if raw_end.strip().startswith("{"):
            self.end_json = json.loads(raw_end)  # -1 = latest; end EXCLUSIVE
            bad = [
                f"{t}/{p}"
                for t, ps in self.end_json.items()
                for p, off in ps.items()
                if int(off) == -2
            ]
            if bad:
                raise ValueError(
                    f"endingOffsets can't be earliest (-2) for batch "
                    f"queries (the real source's rule): {bad}"
                )
        else:
            self.end_json = None
            if raw_end.lower() != "latest":
                raise ValueError(
                    "endingOffsets must be 'latest' or a JSON offset map "
                    "(the real batch source's contract)"
                )
        by_ts = o.get("startingoffsetsbytimestamp")
        self.start_ts = json.loads(by_ts) if by_ts else None
        cap = o.get("maxoffsetspertrigger")
        self.max_per_partition = int(cap) if cap is not None else None
        self.include_headers = str(o.get("includeheaders", "false")).lower() == "true"

    def partitions(self):
        parts = [
            _TopicPartition(topic, pdir, p)
            for topic, pdir, p in _log_partitions(self.dir, self.topics, self.assigned, self.pattern)
        ]
        # empty log → one empty partition: a valid zero-row relation
        return parts or [_TopicPartition("", "", 0)]

    def _offset_range(self, partition) -> tuple[int, int]:
        """Resolve the [start, end) offsets a batch read covers for one
        topic-partition, honoring startingOffsets (string / JSON /
        by-timestamp), endingOffsets, and maxOffsetsPerTrigger — the
        same precedence the real batch source applies."""
        end_log = _partition_end(partition.part_dir)
        if self.start_ts is not None:
            tmap = self.start_ts.get(partition.topic, {})
            start_ms = tmap.get("-1", tmap.get(str(partition.partition)))
            # synthetic clock: record ts (sec) == offset
            start = 0 if start_ms is None else max(0, -(-int(start_ms) // 1000))
        elif self.start_json is not None:
            off = int(
                self.start_json.get(partition.topic, {}).get(
                    str(partition.partition), -2
                )
            )
            start = 0 if off == -2 else off  # -1 already rejected at plan
        else:
            start = 0  # 'latest' already rejected at plan time (batch rule)
        if self.end_json is not None:
            off = int(
                self.end_json.get(partition.topic, {}).get(
                    str(partition.partition), -1
                )
            )
            # out-of-range end clamps to log end (documented leniency —
            # the real batch source errors; see module docstring)
            end = end_log if off == -1 else min(off, end_log)
        else:
            end = end_log
        if self.max_per_partition is not None:
            end = min(end, start + self.max_per_partition)
        return start, max(start, end)

    def read(self, partition):
        if not partition.part_dir:
            return
        start, end = self._offset_range(partition)
        if end <= start:
            return
        offset = 0
        for seg in sorted(glob.glob(os.path.join(partition.part_dir, "*.jsonl"))):
            with open(seg) as fh:
                for line in fh:
                    cur = offset
                    offset += 1
                    if cur < start:
                        continue
                    if cur >= end:
                        return
                    rec = json.loads(line)
                    headers = None
                    if self.include_headers and rec.get("headers") is not None:
                        headers = [
                            (k, base64.b64decode(v)) for k, v in rec["headers"]
                        ]
                    yield (
                        None if rec["key"] is None else rec["key"].encode(),
                        None if rec["value"] is None else rec["value"].encode(),
                        headers,
                        partition.topic,
                        partition.partition,
                        cur,
                        datetime.fromtimestamp(cur, tz=timezone.utc),
                        0,
                    )


class _RangePartition(InputPartition):
    def __init__(self, topic: str, part_dir: str, partition: int, start: int, end: int) -> None:
        self.topic = topic
        self.part_dir = part_dir
        self.partition = partition
        self.start = start
        self.end = end


def _log_partitions(
    broker_dir: str,
    topics: list[str] | None,
    assigned: dict[str, set[int]] | None = None,
    pattern: str | None = None,
) -> list[tuple[str, str, int]]:
    if pattern is not None:
        import re

        rx = re.compile(pattern)
        topics = (
            sorted(
                t
                for t in os.listdir(broker_dir)
                if rx.fullmatch(t) and os.path.isdir(os.path.join(broker_dir, t))
            )
            if os.path.isdir(broker_dir)
            else []
        )
    out = []
    for topic in topics or []:
        for pdir in sorted(glob.glob(os.path.join(broker_dir, topic, "p*"))):
            p = int(os.path.basename(pdir)[1:])
            if assigned is not None and p not in assigned.get(topic, set()):
                continue
            out.append((topic, pdir, p))
    return out


def _partition_end(part_dir: str) -> int:
    n = 0
    for seg in glob.glob(os.path.join(part_dir, "*.jsonl")):
        with open(seg) as fh:
            n += sum(1 for _ in fh)
    return n


def _read_offset_range(part):
    """Yield KAFKA_SOURCE_SCHEMA tuples for offsets [start, end) of one
    topic-partition — shared by the stream reader's tasks."""
    offset = 0
    for seg in sorted(glob.glob(os.path.join(part.part_dir, "*.jsonl"))):
        with open(seg) as fh:
            for line in fh:
                cur = offset
                offset += 1
                if cur < part.start:
                    continue
                if cur >= part.end:
                    return
                rec = json.loads(line)
                headers = None
                if rec.get("headers") is not None:
                    headers = [(k, base64.b64decode(v)) for k, v in rec["headers"]]
                yield (
                    None if rec["key"] is None else rec["key"].encode(),
                    None if rec["value"] is None else rec["value"].encode(),
                    headers,
                    part.topic,
                    part.partition,
                    cur,
                    datetime.fromtimestamp(cur, tz=timezone.utc),
                    0,
                )


class KafkaFakeStreamReader(DataSourceStreamReader):
    """Micro-batch consumer over the fake broker log — the streaming
    half of the S4 contract, EXECUTED: offset planning (earliest /
    latest / by-timestamp starts), per-partition poll-window pacing
    (``maxOffsetsPerTrigger``), and exactly-once restart from a Spark
    checkpoint (the committed offset map is the source of truth; the
    log is never mutated, like a real broker with retention).

    Offsets are the real connector's JSON shape:
    ``{topic: {"<partition>": next_offset}}``. Partitions created
    after the stream starts are picked up at the next trigger starting
    from offset 0 (new-partition discovery, startingOffsets applies
    only to partitions present at start — Kafka's documented rule)."""

    def __init__(self, options: dict) -> None:
        o = _opts(options)
        self.dir = _broker_dir(o)
        self.topics, self.assigned, self.pattern = _subscription(o)
        raw_start = str(o.get("startingoffsets", "earliest"))
        if raw_start.strip().startswith("{"):
            # per-partition JSON form (stream: -2 = earliest and -1 =
            # latest are BOTH valid, unlike batch; unlisted partitions
            # start earliest — documented leniency vs the real source's
            # must-list-all assertion)
            self.start_json = json.loads(raw_start)
            self.starting = None
        else:
            self.start_json = None
            self.starting = raw_start.lower()
            if self.starting not in ("earliest", "latest"):
                raise ValueError(
                    f"startingOffsets must be 'earliest', 'latest' or a "
                    f"JSON offset map (got {raw_start!r})"
                )
        if o.get("endingoffsets") is not None:
            raise ValueError(
                "endingOffsets is a batch-only option — the real "
                "streaming source rejects it"
            )
        by_ts = o.get("startingoffsetsbytimestamp")
        self.start_ts = json.loads(by_ts) if by_ts else None
        cap = o.get("maxoffsetspertrigger")
        self.max_per_partition = int(cap) if cap is not None else None
        # last planned end per "topic\x00p" — pacing state. On restart
        # Spark resumes from its checkpoint via partitions(start, ...),
        # which re-seeds this map (see partitions()).
        self._planned: dict[str, int] = {}
        # Seed pacing for the partitions present at start: Spark may
        # poll latestOffset() before the first batch plans, and a
        # zero default there would cap the first poll window at
        # [0, max_per_partition) — silently overriding a non-zero
        # start (JSON map or by-timestamp; caught by the q_kt1
        # mid-log replay, which consumed a 100-record prefix below
        # its timestamp cutoff). Partitions created after start are
        # deliberately NOT seeded: they consume from 0 (Kafka's
        # new-partition rule, see latestOffset).
        for topic, pdir, p in self._parts():
            self._planned[f"{topic}\x00{p}"] = self._start_offset_for(topic, pdir, p)

    def _parts(self):
        return _log_partitions(self.dir, self.topics, self.assigned, self.pattern)

    def _start_offset_for(self, topic: str, part_dir: str, partition: int) -> int:
        if self.start_ts is not None:
            tmap = self.start_ts.get(topic, {})
            start_ms = tmap.get("-1", tmap.get(str(partition)))
            if start_ms is None:
                return 0
            # synthetic clock: record ts (sec) == offset
            return max(0, -(-int(start_ms) // 1000))
        if self.start_json is not None:
            off = int(self.start_json.get(topic, {}).get(str(partition), -2))
            if off == -2:
                return 0
            if off == -1:
                return _partition_end(part_dir)
            return max(0, off)
        if self.starting == "latest":
            return _partition_end(part_dir)
        return 0

    def initialOffset(self) -> dict:
        out: dict[str, dict[str, int]] = {}
        for topic, pdir, p in self._parts():
            off = self._start_offset_for(topic, pdir, p)
            out.setdefault(topic, {})[str(p)] = off
            self._planned[f"{topic}\x00{p}"] = off
        return out

    def latestOffset(self) -> dict:
        out: dict[str, dict[str, int]] = {}
        for topic, pdir, p in self._parts():
            end = _partition_end(pdir)
            # Unknown partition ⇒ either created after start (consume
            # from 0, Kafka's new-partition rule) or the first trigger
            # after a checkpoint restart (partitions() re-seeds from the
            # committed start; one possibly-empty paced batch, no
            # loss/dup). initialOffset() seeds partitions present at a
            # fresh start.
            base = self._planned.get(f"{topic}\x00{p}", 0)
            if self.max_per_partition is not None:
                end = min(end, base + self.max_per_partition)
            end = max(end, base)
            out.setdefault(topic, {})[str(p)] = end
            self._planned[f"{topic}\x00{p}"] = end
        return out

    def partitions(self, start: dict, end: dict):
        parts = []
        for topic, pdir, p in self._parts():
            s = int(start.get(topic, {}).get(str(p), 0))
            e = int(end.get(topic, {}).get(str(p), s))
            # restart re-seed: never plan behind what the checkpoint
            # already committed (keeps pacing exactly-once after resume)
            k = f"{topic}\x00{p}"
            self._planned[k] = max(self._planned.get(k, 0), s, e)
            if e > s:
                parts.append(_RangePartition(topic, pdir, p, s, e))
        return parts or [_RangePartition("", "", 0, 0, 0)]

    def read(self, partition):
        if not partition.part_dir or partition.end <= partition.start:
            return iter(())
        return _read_offset_range(partition)

    def commit(self, end: dict) -> None:  # log retention is external, like Kafka
        return None


class KafkaFakeDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kafka_fake"

    def schema(self):
        return KAFKA_SOURCE_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return KafkaFakeReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return KafkaFakeStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        if overwrite:
            raise ValueError("kafka_fake is an append-only log (like Kafka)")
        return KafkaFakeWriter(self.options, schema)


def register(spark) -> None:
    """Idempotent per-session registration."""
    spark.dataSource.register(KafkaFakeDataSource)
