"""Relay-envelope semantics: wrap/unwrap round-trip, compression,
encryption, TTL drop, receiver dedupe, per-key ordered delivery."""

import pytest
from pyspark.sql import functions as F

from electrician_spark import envelope
from electrician_spark.functions import codecs

KEY = "0123456789abcdef"  # 16-byte AES key
SCHEMA = "user_id string, n bigint"


@pytest.fixture(scope="module")
def payload(spark):
    rows = [("u1", i) for i in range(5)] + [("u2", i) for i in range(3)]
    return spark.createDataFrame(rows, SCHEMA)


def _wrap(payload, **kw):
    return envelope.wrap(
        payload,
        ordering_key="user_id",
        dedupe_key=F.concat_ws(":", "user_id", "n"),
        ts=F.to_timestamp(F.lit("2026-01-01 00:00:00")),
        **kw,
    )


@pytest.mark.parametrize("compression", [None, "deflate", "gzip"])
def test_round_trip(spark, payload, compression):
    env = _wrap(payload, compression=compression, encryption_key=KEY)
    back = envelope.unwrap(
        env, SCHEMA, compression=compression, encryption_key=KEY
    ).select("_decoded.user_id", "_decoded.n")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, payload.collect()))


def test_envelope_columns_and_id_determinism(spark, payload):
    env1 = _wrap(payload).collect()
    env2 = _wrap(payload).collect()
    assert {r.id for r in env1} == {r.id for r in env2}  # content-derived ids
    assert len({r.id for r in env1}) == len(env1)
    row = env1[0]
    assert row.encoding == "json" and row.compression == "none" and row.encryption == "none"


def test_seq_is_per_key_and_dense(spark, payload):
    env = _wrap(payload)
    seqs = {
        r.ordering_key: r.seqs
        for r in env.groupBy("ordering_key")
        .agg(F.array_sort(F.collect_list("seq")).alias("seqs"))
        .collect()
    }
    assert seqs == {"u1": [1, 2, 3, 4, 5], "u2": [1, 2, 3]}


def test_ttl_drop(spark, payload):
    env = _wrap(payload, ttl_seconds=60)
    live = envelope.unwrap(
        env, SCHEMA, drop_expired_at=F.to_timestamp(F.lit("2026-01-01 00:00:30"))
    )
    dead = envelope.unwrap(
        env, SCHEMA, drop_expired_at=F.to_timestamp(F.lit("2026-01-01 00:02:00"))
    )
    assert live.count() == payload.count()
    assert dead.count() == 0


def test_receiver_dedupe(spark, payload):
    dup = payload.unionAll(payload)
    env = _wrap(dup)
    out = envelope.unwrap(env, SCHEMA, dedupe=True)
    assert out.count() == payload.count()


def test_malformed_payload_flags_not_crashes(spark, payload):
    env = _wrap(payload).withColumn(
        "payload", F.encode(F.lit("not json at all"), "utf-8").cast("binary")
    )
    out = envelope.unwrap(env, SCHEMA)
    assert out.filter(F.col("payload_ok")).count() == 0
    assert out.count() == payload.count()


def test_ordered_delivery_within_partition(spark, payload):
    env = _wrap(payload)
    ordered = envelope.ordered_delivery(env, num_partitions=4)

    def check(it):
        last = {}
        for row in it:
            k, s = row.ordering_key, row.seq
            assert last.get(k, 0) < s, f"out of order for {k}"
            last[k] = s
        return iter([])

    ordered.rdd.mapPartitions(lambda it: check(it)).count()


def test_compression_codecs_round_trip(spark):
    df = spark.createDataFrame([("hello world " * 50,), (None,)], "s string")
    for codec in ("deflate", "gzip", "bz2", "xz"):
        out = df.select(
            F.decode(
                codecs.decompress(
                    codecs.compress(F.encode("s", "utf-8").cast("binary"), codec), codec
                ),
                "utf-8",
            ).alias("back")
        ).collect()
        assert out[0].back == "hello world " * 50
        assert out[1].back is None


def test_unknown_codec_rejected(spark):
    with pytest.raises(ValueError, match="not available"):
        codecs.compress(F.lit(b"x"), "nope")


def test_receiver_dedupe_keyless_rows_all_survive(spark, payload):
    # No dedupe key → no dedupe (reference proto:31-33): dropDuplicates
    # treats NULLs as equal, so a bare call would collapse every
    # keyless record into one (r15 review finding).
    env = envelope.wrap(payload, payload_cols=payload.columns)  # dedupe_key NULL
    out = envelope.unwrap(env, SCHEMA, dedupe=True)
    assert out.count() == payload.count()


def test_id_distinct_across_ordering_keys(spark):
    # Same payload + same seq under DIFFERENT ordering keys are
    # distinct records and must not share an id (r15 review finding:
    # the id hashed only payload+seq).
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("A", 1), ("B", 1)], "sess string, amount int")
    env = envelope.wrap(df, payload_cols=["amount"], ordering_key="sess")
    ids = [r.id for r in env.select("id").collect()]
    assert len(set(ids)) == 2, ids
