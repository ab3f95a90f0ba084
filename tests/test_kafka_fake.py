"""Executed Kafka contract round-trip against the in-process fake
broker (kafka_fake Python DataSource) — the S4/K3 option maps drive a
real write→read cycle, the role Redpanda plays for the reference's
integration test (kafkaclient_integration_test.go:24)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from electrician_spark import kafka_fake
from electrician_spark.streaming.sinks import kafka_frame, kafka_sink_options
from electrician_spark.streaming.sources import kafka_source_options


def _strip_client_opts(opts: dict) -> dict:
    # kafka.* options configure the network client the fake replaces;
    # the fake accepts them but they must not be required
    return opts


def test_kafka_roundtrip_full_option_surface(spark, tmp_path):
    """kafka_source_options → frames → kafka_sink_options as ONE
    executed round-trip: template keys, JSON values, header bytes,
    topic routing, key-hash partitioning, offset assignment and
    earliest/latest semantics all run through the fake log."""
    kafka_fake.register(spark)
    broker = str(tmp_path / "broker")

    src = spark.createDataFrame(
        [(1, "a", 10.5), (2, "b", 20.25), (3, "c", 30.0), (4, "d", 40.75)],
        "k long, s string, v double",
    )
    frame = kafka_frame(
        src,
        value_cols=["k", "v"],
        key_template="rec:{k}",
        header_templates={"tag": "{s}"},
        topic="events",
    )
    sink_opts = kafka_sink_options(
        "broker:9092", topic="events", acks="all", compression="lz4",
        batch_size=16384, linger_ms=5,
    )
    frame.write.format("kafka_fake").options(brokerDir=broker, **sink_opts).mode(
        "append"
    ).save()

    src_opts = kafka_source_options(
        ["events"], "broker:9092", start_at="earliest", group_id="g1"
    )
    back = (
        spark.read.format("kafka_fake")
        .options(brokerDir=broker, includeHeaders="true", **src_opts)
        .load()
    )
    rows = back.collect()
    assert len(rows) == 4
    got = {}
    for r in rows:
        payload = json.loads(bytes(r.value).decode())
        got[bytes(r.key).decode()] = (payload, r.topic, r.partition, r.offset, r.headers)
    assert set(got) == {"rec:1", "rec:2", "rec:3", "rec:4"}
    assert got["rec:1"][0] == {"k": 1, "v": 10.5}
    assert all(t == "events" for _, t, _, _, _ in got.values())
    # header bytes survive the wire
    for key, (_, _, _, _, headers) in got.items():
        (h,) = headers
        assert h.key == "tag" and bytes(h.value).decode() in {"a", "b", "c", "d"}
    # key-hash partitioning: every record landed where crc32 says
    import zlib

    for key, (_, _, part, _, _) in got.items():
        assert part == zlib.crc32(key.encode()) % 2
    # offsets are contiguous per partition starting at 0
    by_part: dict[int, list[int]] = {}
    for _, (_, _, part, off, _) in got.items():
        by_part.setdefault(part, []).append(off)
    for offs in by_part.values():
        assert sorted(offs) == list(range(len(offs)))

    # startingOffsets='latest' is REJECTED for batch queries, exactly
    # like the real source ("starting offset can't be latest for batch
    # queries")
    import pytest as _pytest

    latest = kafka_source_options(["events"], "broker:9092", start_at="latest")
    with _pytest.raises(Exception, match="latest"):
        spark.read.format("kafka_fake").options(brokerDir=broker, **latest).load().count()

    # an unrecognized offset STRING is rejected, not silently read as
    # earliest — the real source errors on unknown values (a typo like
    # 'earliestt' must not succeed with unintended full-log coverage)
    with _pytest.raises(Exception, match="earliest"):
        spark.read.format("kafka_fake").options(
            brokerDir=broker, subscribe="events", startingOffsets="earliestt"
        ).load().count()


def test_stream_reader_rejects_unknown_offset_string(tmp_path):
    # same typo-guard on the streaming half (earliest/latest both valid
    # there, anything else rejected at plan time)
    import pytest as _pytest

    from electrician_spark.kafka_fake import KafkaFakeStreamReader

    with _pytest.raises(ValueError, match="earliest"):
        KafkaFakeStreamReader(
            {"brokerdir": str(tmp_path), "subscribe": "t", "startingoffsets": "sooner"}
        )


def test_stream_pacing_respects_nonzero_start(spark, tmp_path):
    """Spark may poll latestOffset() before the first batch plans; the
    paced window must begin AT a non-zero start (JSON map or
    by-timestamp), not at [0, cap) — the q_kt1 regression: an
    unseeded pacing base of 0 made a timestamp-start stream consume a
    prefix BELOW its cutoff."""
    import json as _json

    from electrician_spark.kafka_fake import KafkaFakeStreamReader
    from electrician_spark.streaming.sinks import kafka_frame

    broker = str(tmp_path / "broker")
    df = spark.range(10).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"), F.col("id").alias("v")
    )
    frame = kafka_frame(df.coalesce(1), value_cols=["v"], key_template="{k}", topic="t")
    frame.write.format("kafka_fake").options(
        brokerDir=broker, topic="t", numPartitions="1"
    ).mode("append").save()

    for start_opts in (
        {"startingoffsets": _json.dumps({"t": {"0": 6}})},
        {"startingoffsetsbytimestamp": _json.dumps({"t": {"-1": 6000}})},
    ):
        r = KafkaFakeStreamReader(
            {"brokerdir": broker, "subscribe": "t", "maxoffsetspertrigger": "2", **start_opts}
        )
        # latestOffset polled FIRST (no initialOffset call yet): the
        # first poll window must be [6, 8), never [0, 2)
        assert r.latestOffset() == {"t": {"0": 8}}, start_opts
        assert r.initialOffset() == {"t": {"0": 6}}


def test_kafka_append_offsets_and_poll_window(spark, tmp_path):
    """A second produced batch appends with increasing offsets, and
    maxOffsetsPerTrigger (the reference's poll window) caps the read."""
    kafka_fake.register(spark)
    broker = str(tmp_path / "broker")
    for batch in range(2):
        df = spark.createDataFrame([(batch * 10 + i,) for i in range(5)], "k long")
        frame = kafka_frame(df, value_cols=["k"], key_template="x", topic="t1")
        frame.write.format("kafka_fake").options(
            brokerDir=broker, **kafka_sink_options("b:9092", topic="t1")
        ).mode("append").save()
    opts = kafka_source_options(["t1"], "b:9092", start_at="earliest")
    back = spark.read.format("kafka_fake").options(brokerDir=broker, **opts).load()
    offs = sorted(r.offset for r in back.collect())
    assert offs == list(range(10))  # same key -> one partition, contiguous log

    capped = kafka_source_options(
        ["t1"], "b:9092", start_at="earliest", max_offsets_per_trigger=4
    )
    assert (
        spark.read.format("kafka_fake").options(brokerDir=broker, **capped).load().count()
        == 4
    )


def test_kafka_batch_offset_maps(spark, tmp_path):
    """The real batch source's per-partition JSON offset maps, EXECUTED:
    startingOffsets {"t":{"0":2}} starts partition 0 at offset 2
    (sentinels -2 = earliest, -1 = latest), endingOffsets {"t":{"0":4}}
    is an EXCLUSIVE end, and both compose with maxOffsetsPerTrigger."""
    import json as _json

    kafka_fake.register(spark)
    broker = str(tmp_path / "broker")
    # one partition of 8 records (same key -> one partition)
    df = spark.createDataFrame([(i,) for i in range(8)], "k long")
    frame = kafka_frame(df, value_cols=["k"], key_template="x", topic="t")
    frame.write.format("kafka_fake").options(
        brokerDir=broker, **kafka_sink_options("b:9092", topic="t")
    ).mode("append").save()
    part = spark.read.format("kafka_fake").options(
        brokerDir=broker, subscribe="t"
    ).load().first().partition

    def offs(**extra):
        back = (
            spark.read.format("kafka_fake")
            .options(brokerDir=broker, subscribe="t", **extra)
            .load()
        )
        return sorted(r.offset for r in back.collect())

    start2 = _json.dumps({"t": {str(part): 2}})
    assert offs(startingOffsets=start2) == [2, 3, 4, 5, 6, 7]
    # sentinel -2 = earliest; -1 (latest) is REJECTED for batch, like
    # the real source
    assert offs(startingOffsets=_json.dumps({"t": {str(part): -2}})) == list(range(8))
    import pytest as _pytest

    with _pytest.raises(Exception, match="latest"):
        offs(startingOffsets=_json.dumps({"t": {str(part): -1}}))
    # exclusive end; -1 = latest; -2 (earliest) rejected for an end
    end4 = _json.dumps({"t": {str(part): 4}})
    assert offs(startingOffsets=start2, endingOffsets=end4) == [2, 3]
    assert offs(endingOffsets=_json.dumps({"t": {str(part): -1}})) == list(range(8))
    with _pytest.raises(Exception, match="earliest"):
        offs(endingOffsets=_json.dumps({"t": {str(part): -2}}))
    # end capped to the log, start map composes with the poll window
    assert offs(
        startingOffsets=start2,
        endingOffsets=_json.dumps({"t": {str(part): 99}}),
        maxOffsetsPerTrigger="3",
    ) == [2, 3, 4]
    # unknown-string endingOffsets raises like the real source
    with _pytest.raises(Exception, match="endingOffsets"):
        offs(endingOffsets="earliest")

    # STREAM honors the per-partition JSON start (the r14 review's
    # confirmed-by-execution finding: the stream previously ignored it
    # and replayed from earliest) and rejects the batch-only
    # endingOffsets option like the real streaming source.
    batches: list[list[dict]] = []

    def _sink(bdf, _bid):
        batches.append([r.asDict() for r in bdf.select("offset").collect()])

    q = (
        spark.readStream.format("kafka_fake")
        .options(brokerDir=broker, subscribe="t", startingOffsets=start2)
        .load()
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", str(tmp_path / "ckpt_js"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        assert _wait_rows(batches, 6) == 6
    finally:
        q.stop()
    assert sorted(r["offset"] for b in batches for r in b) == [2, 3, 4, 5, 6, 7]
    # the stream reader is built lazily at query start, so the
    # rejection surfaces on start/awaitTermination, not .load()
    with _pytest.raises(Exception, match="batch-only"):
        q2 = (
            spark.readStream.format("kafka_fake")
            .options(brokerDir=broker, subscribe="t", endingOffsets=end4)
            .load()
            .writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ckpt_eo"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            q2.awaitTermination(60)
            if q2.exception() is not None:
                raise q2.exception()
        finally:
            q2.stop()


def test_kafka_assign_explicit_partitions(spark, tmp_path):
    """`assign` pins explicit topic-partitions (the real connector's
    JSON form), is honored by batch AND streaming reads, and is
    mutually exclusive with `subscribe` — exactly one must be given."""
    import json as _json

    import pytest as _pytest

    kafka_fake.register(spark)
    broker = str(tmp_path / "broker")
    # spread 12 keyed records over 3 partitions
    df = spark.createDataFrame([(i,) for i in range(12)], "k long")
    frame = kafka_frame(df, value_cols=["k"], key_template="{k}", topic="t")
    frame.write.format("kafka_fake").options(
        brokerDir=broker, topic="t", numPartitions="3"
    ).mode("append").save()
    all_rows = (
        spark.read.format("kafka_fake")
        .options(brokerDir=broker, subscribe="t")
        .load()
        .collect()
    )
    parts = sorted({r.partition for r in all_rows})
    assert len(parts) == 3
    keep = parts[:2]
    assign = _json.dumps({"t": keep})
    got = (
        spark.read.format("kafka_fake")
        .options(brokerDir=broker, assign=assign)
        .load()
        .collect()
    )
    assert sorted({r.partition for r in got}) == keep
    assert len(got) == sum(1 for r in all_rows if r.partition in keep)

    # streaming honors the same assignment
    batches: list[list[dict]] = []

    def _sink(bdf, _bid):
        batches.append([r.asDict() for r in bdf.select("partition", "offset").collect()])

    q = (
        spark.readStream.format("kafka_fake")
        .options(brokerDir=broker, assign=assign)
        .load()
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        assert _wait_rows(batches, len(got)) == len(got)
    finally:
        q.stop()
    assert {r["partition"] for b in batches for r in b} <= set(keep)

    # exactly one of subscribe/assign (the real source's contract)
    with _pytest.raises(Exception, match="exactly one"):
        spark.read.format("kafka_fake").options(brokerDir=broker).load().collect()
    with _pytest.raises(Exception, match="exactly one"):
        spark.read.format("kafka_fake").options(
            brokerDir=broker, subscribe="t", assign=assign
        ).load().collect()


def test_kafka_subscribe_pattern(spark, tmp_path):
    """subscribePattern resolves topics by regex at every plan: batch
    reads match existing topics, and a PATTERN STREAM discovers a topic
    created after the stream started (the real source's behavior)."""
    kafka_fake.register(spark)
    broker = str(tmp_path / "broker")
    for topic in ("ga", "gb", "other"):
        _produce(spark, broker, range(3), topic=topic)

    back = (
        spark.read.format("kafka_fake")
        .options(brokerDir=broker, subscribePattern="g.*")
        .load()
        .collect()
    )
    assert sorted({r.topic for r in back}) == ["ga", "gb"]
    assert len(back) == 6

    batches: list[list[dict]] = []

    def _sink(bdf, _bid):
        batches.append([r.asDict() for r in bdf.select("topic", "offset").collect()])

    q = (
        spark.readStream.format("kafka_fake")
        .options(brokerDir=broker, subscribePattern="g.*")
        .load()
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        assert _wait_rows(batches, 6) == 6
        _produce(spark, broker, range(2), topic="gc")  # born after start
        assert _wait_rows(batches, 8) == 8
    finally:
        q.stop()
    topics_seen = {r["topic"] for b in batches for r in b}
    assert topics_seen == {"ga", "gb", "gc"}  # pattern re-resolved; 'other' never


def test_kafka_timestamp_start_and_multi_topic(spark, tmp_path):
    """StartAt=timestamp (startingOffsetsByTimestamp) skips records
    before the requested logical time; subscribe fans in topics."""
    kafka_fake.register(spark)
    broker = str(tmp_path / "broker")
    for topic in ("ta", "tb"):
        df = spark.createDataFrame([(i,) for i in range(6)], "k long")
        frame = kafka_frame(df, value_cols=["k"], key_template="x", topic=topic)
        frame.write.format("kafka_fake").options(
            brokerDir=broker, **kafka_sink_options("b:9092", topic=topic)
        ).mode("append").save()

    both = kafka_source_options(["ta", "tb"], "b:9092", start_at="earliest")
    back = spark.read.format("kafka_fake").options(brokerDir=broker, **both).load()
    assert back.groupBy("topic").count().count() == 2 and back.count() == 12

    # synthetic clock: offset N carries timestamp epoch+N s — start at 3000ms
    ts_opts = kafka_source_options(
        ["ta"], "b:9092", start_timestamp_ms=3000
    )
    late = spark.read.format("kafka_fake").options(brokerDir=broker, **ts_opts).load()
    assert sorted(r.offset for r in late.collect()) == [3, 4, 5]


def test_kafka_write_requires_topic(spark, tmp_path):
    """No topic column and no topic option must fail — the same
    contract the real sink enforces."""
    import pytest

    kafka_fake.register(spark)
    df = spark.createDataFrame([(1,)], "k long")
    frame = kafka_frame(df, value_cols=["k"])  # no topic
    with pytest.raises(Exception, match="topic"):
        frame.write.format("kafka_fake").options(
            brokerDir=str(tmp_path / "b"), **kafka_sink_options("b:9092")
        ).mode("append").save()


def test_kafka_dedupe_and_decode_pipeline_over_fake_source(spark, tmp_path):
    """S4 consumer shape end-to-end: produce JSON frames, read them
    back through the source option map, decode value JSON and dedupe on
    a key — the engine-side consumer pipeline the reference runs with
    CommitMode semantics (superseded here by deterministic offsets)."""
    kafka_fake.register(spark)
    broker = str(tmp_path / "broker")
    df = spark.createDataFrame(
        [(1, "x"), (2, "y"), (1, "x"), (3, "z")], "id long, payload string"
    )
    frame = kafka_frame(df, value_cols=["id", "payload"], key_template="{id}", topic="in")
    frame.write.format("kafka_fake").options(
        brokerDir=broker, **kafka_sink_options("b:9092", topic="in")
    ).mode("append").save()

    opts = kafka_source_options(["in"], "b:9092", start_at="earliest")
    back = spark.read.format("kafka_fake").options(brokerDir=broker, **opts).load()
    decoded = back.select(
        F.get_json_object(F.decode("value", "utf-8"), "$.id").cast("long").alias("id"),
        F.get_json_object(F.decode("value", "utf-8"), "$.payload").alias("payload"),
    )
    assert decoded.count() == 4
    assert decoded.dropDuplicates(["id"]).count() == 3


# ---------------------------------------------------------------------------
# Streaming consumer (KafkaFakeStreamReader) — the S4 micro-batch
# semantics EXECUTED: offset planning, poll-window pacing, checkpoint
# restart. Mirrors the reference's consumer loop (reader.go:17-120)
# at the granularity Spark's source API exposes.
# ---------------------------------------------------------------------------

import time


def _produce(spark, broker, ids, topic="t"):
    src = spark.createDataFrame([(i, f"v{i}") for i in ids], "k long, s string")
    frame = kafka_frame(src, value_cols=["k", "s"], key_template="{k}", topic=topic)
    frame.write.format("kafka_fake").options(
        brokerDir=broker, topic=topic, numPartitions="2"
    ).mode("append").save()


def _start_stream(spark, broker, checkpoint, batches, **extra):
    def _sink(df, batch_id):
        batches.append(
            [r.asDict() for r in df.select("key", "topic", "partition", "offset").collect()]
        )

    return (
        spark.readStream.format("kafka_fake")
        .options(brokerDir=broker, subscribe="t", **extra)
        .load()
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime="200 milliseconds")
        .start()
    )


def _wait_rows(batches, n, timeout=90):
    deadline = time.time() + timeout
    while time.time() < deadline and sum(map(len, batches)) < n:
        time.sleep(0.25)
    return sum(map(len, batches))


def test_kafka_stream_paced_exactly_once(spark, tmp_path):
    """maxOffsetsPerTrigger paces every micro-batch to ≤ cap records
    per partition, and the paced stream still consumes the whole log
    exactly once (offsets contiguous from 0 per partition)."""
    kafka_fake.register(spark)
    broker = str(tmp_path / "broker")
    _produce(spark, broker, range(10))

    batches: list[list[dict]] = []
    q = _start_stream(
        spark, broker, str(tmp_path / "ckpt"), batches, maxOffsetsPerTrigger="2"
    )
    try:
        assert _wait_rows(batches, 10) == 10
    finally:
        q.stop()

    per_batch_part: dict[tuple[int, int], int] = {}
    seen: list[tuple[int, int]] = []
    for i, b in enumerate(batches):
        for r in b:
            per_batch_part[(i, r["partition"])] = per_batch_part.get((i, r["partition"]), 0) + 1
            seen.append((r["partition"], r["offset"]))
    assert per_batch_part and max(per_batch_part.values()) <= 2  # the poll window held
    assert len(seen) == len(set(seen)) == 10  # exactly once
    for p in {p for p, _ in seen}:  # contiguous from 0 per partition
        offs = sorted(o for pp, o in seen if pp == p)
        assert offs == list(range(len(offs)))


def test_kafka_stream_checkpoint_restart(spark, tmp_path):
    """Stop the consumer, produce more, restart from the same Spark
    checkpoint: the source resumes from the committed offset map — no
    record is lost and nothing before the last offset-logged batch is
    re-read. (foreachBatch is at-least-once ACROSS a restart: the one
    batch whose offsets were WAL-logged but not yet committed when
    stop() hit may replay — R5's idempotent-sink contract absorbs it.)"""
    kafka_fake.register(spark)
    broker = str(tmp_path / "broker")
    ckpt = str(tmp_path / "ckpt")
    _produce(spark, broker, range(6))

    first: list[list[dict]] = []
    q = _start_stream(spark, broker, ckpt, first)
    try:
        assert _wait_rows(first, 6) == 6
    finally:
        q.stop()

    _produce(spark, broker, range(100, 104))
    second: list[list[dict]] = []
    q = _start_stream(spark, broker, ckpt, second)
    try:
        deadline = time.time() + 90
        want = {100, 101, 102, 103}
        while time.time() < deadline:
            keys2 = {int(bytes(r["key"]).decode()) for b in second for r in b}
            if want <= keys2:
                break
            time.sleep(0.25)
    finally:
        q.stop()
    assert want <= keys2

    def pairs(batches):
        return [(r["partition"], r["offset"]) for b in batches for r in b]

    p1, p2 = pairs(first), pairs(second)
    # no duplicates within a run; both runs together cover the full log
    # (10 records → contiguous offsets from 0 in each partition)
    assert len(p1) == len(set(p1)) and len(p2) == len(set(p2))
    union = set(p1) | set(p2)
    assert len(union) == 10
    for p in {pp for pp, _ in union}:
        offs = sorted(o for pp, o in union if pp == p)
        assert offs == list(range(len(offs)))
    # replay across the restart is bounded to ONE batch's worth
    replayed = set(p1) & set(p2)
    assert len(replayed) <= max((len(b) for b in first), default=0)


def test_kafka_stream_latest_start(spark, tmp_path):
    """startingOffsets=latest skips the pre-existing log and delivers
    only records produced after the stream starts."""
    kafka_fake.register(spark)
    broker = str(tmp_path / "broker")
    _produce(spark, broker, range(5))

    batches: list[list[dict]] = []
    q = _start_stream(
        spark, broker, str(tmp_path / "ckpt"), batches, startingOffsets="latest"
    )
    try:
        # Wait for the stream to have PLANNED a batch (offsets resolved)
        # before producing: "latest" snapshots at first batch planning,
        # so a fixed sleep races it under CPU contention — if the first
        # trigger fires after the produce below, the new records land
        # inside the skipped prefix and the stream delivers nothing.
        deadline = time.time() + 60
        while time.time() < deadline and not q.recentProgress:
            time.sleep(0.25)
        assert q.recentProgress, "stream never made progress"
        assert sum(map(len, batches)) == 0
        _produce(spark, broker, [50, 51, 52])
        assert _wait_rows(batches, 3) == 3
    finally:
        q.stop()

    keys = {int(bytes(r["key"]).decode()) for b in batches for r in b}
    assert keys == {50, 51, 52}


def test_kafka_stream_window_roundtrip(spark, tmp_path):
    """The composed S4→W1→K3 chain, end to end through the fake
    broker: streaming-consume JSON events, tumbling event-time count
    with watermark, kafka_frame the aggregates back onto a second
    topic, then batch-read the output topic and verify the window
    counts. foreachBatch writes each micro-batch's FINISHED windows —
    with availableNow-style consumption the complete-mode memory of
    the aggregation lives in Spark state, and the broker ends up with
    the final per-window rows."""
    import json as _json

    from pyspark.sql import functions as SF

    from electrician_spark.streaming.windows import tumbling

    kafka_fake.register(spark)
    broker = str(tmp_path / "broker")

    # produce 9 events across 3 hours onto topic "t" (2 partitions);
    # kafka_frame JSON-encodes (ts, v) into the record value
    events = [
        (i, f"2026-01-01T0{h}:15:00", 1)
        for i, h in enumerate([1, 1, 1, 2, 2, 3, 3, 3, 3])
    ]
    src = spark.createDataFrame(events, "k long, ts string, v int")
    frame = kafka_frame(src, value_cols=["ts", "v"], key_template="{k}", topic="t")
    frame.write.format("kafka_fake").options(
        brokerDir=broker, topic="t", numPartitions="2"
    ).mode("append").save()

    done = []

    def _sink(df, batch_id):
        # aggregate THIS batch's events and append window rows to the
        # output topic (idempotent per batch id is the R5 contract; a
        # single batch here keeps the assertion exact)
        parsed = df.select(
            SF.get_json_object(SF.col("value").cast("string"), "$.ts").cast("timestamp").alias("ts")
        )
        agg = tumbling(parsed, "ts", "1 hour", SF.count("*").alias("n"))
        out = agg.select(SF.col("window_start").cast("string").alias("w"), "n")
        kafka_frame(out, value_cols=["w", "n"], topic="agg").write.format(
            "kafka_fake"
        ).options(brokerDir=broker, topic="agg").mode("append").save()
        done.append(len(df.collect()))

    q = (
        spark.readStream.format("kafka_fake")
        .options(brokerDir=broker, subscribe="t")
        .load()
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline and sum(done) < 9:
            time.sleep(0.25)
    finally:
        q.stop()
    assert sum(done) == 9

    back = (
        spark.read.format("kafka_fake")
        .options(brokerDir=broker, subscribe="agg", startingOffsets="earliest")
        .load()
        .collect()
    )
    counts = {}
    for r in back:
        rec = _json.loads(bytes(r.value).decode())
        counts[rec["w"]] = counts.get(rec["w"], 0) + rec["n"]
    assert counts == {
        "2026-01-01 01:00:00": 3,
        "2026-01-01 02:00:00": 2,
        "2026-01-01 03:00:00": 4,
    }


def test_kafka_stream_enrich_roundtrip(spark, tmp_path):
    """The reference's FULL correlation pipeline, end to end through
    the fake broker (SURVEY §2.5 S4→S6+C3→K3): streaming-consume JSON
    order events from a topic, ENRICH each micro-batch against a
    customer dimension via the stream-static broadcast join
    (streaming/joins.enrich_stream_static), key the enriched records
    with the '{field}' template (templates.go:9-60), produce them onto
    a second topic, then batch-read the output topic and verify every
    event came back wearing its customer metadata under its templated
    key."""
    import json as _json

    from pyspark.sql import functions as SF

    from electrician_spark.streaming.joins import enrich_stream_static

    kafka_fake.register(spark)
    broker = str(tmp_path / "broker")

    events = [(1, 101, 10.0), (2, 102, 20.0), (3, 103, 30.0), (4, 101, 40.0)]
    src = spark.createDataFrame(events, "order_id long, cust_id long, amt double")
    frame = kafka_frame(
        src, value_cols=["order_id", "cust_id", "amt"], key_template="{order_id}",
        topic="orders",
    )
    frame.write.format("kafka_fake").options(
        brokerDir=broker, topic="orders", numPartitions="2"
    ).mode("append").save()

    dim = spark.createDataFrame(
        [(101, "acme", "BUILDING"), (102, "globex", "MACHINERY"),
         (103, "initech", "AUTOMOBILE")],
        "cust_id long, name string, segment string",
    )
    done = []

    def _sink(df, batch_id):
        parsed = df.select(
            SF.get_json_object(SF.col("value").cast("string"), "$.order_id")
            .cast("long").alias("order_id"),
            SF.get_json_object(SF.col("value").cast("string"), "$.cust_id")
            .cast("long").alias("cust_id"),
            SF.get_json_object(SF.col("value").cast("string"), "$.amt")
            .cast("double").alias("amt"),
        )
        enriched = enrich_stream_static(parsed, dim, ["cust_id"])
        plan = enriched._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
        out = kafka_frame(
            enriched,
            value_cols=["order_id", "cust_id", "amt", "name"],
            key_template="{segment}",
            topic="enriched",
        )
        out.write.format("kafka_fake").options(
            brokerDir=broker, topic="enriched"
        ).mode("append").save()
        done.append(parsed.count())

    q = (
        spark.readStream.format("kafka_fake")
        .options(brokerDir=broker, subscribe="orders")
        .load()
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 90
        while time.time() < deadline and sum(done) < 4:
            time.sleep(0.25)
    finally:
        q.stop()
    assert sum(done) == 4

    back = (
        spark.read.format("kafka_fake")
        .options(brokerDir=broker, subscribe="enriched", startingOffsets="earliest")
        .load()
        .collect()
    )
    got = set()
    for r in back:
        rec = _json.loads(bytes(r.value).decode())
        got.add((bytes(r.key).decode(), rec["order_id"], rec["name"], rec["amt"]))
    assert got == {
        ("BUILDING", 1, "acme", 10.0),
        ("MACHINERY", 2, "globex", 20.0),
        ("AUTOMOBILE", 3, "initech", 30.0),
        ("BUILDING", 4, "acme", 40.0),
    }
