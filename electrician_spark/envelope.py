"""Cross-service payload envelope — the relay surface, Spark-first.

The reference ships records between services as a protobuf
``WrappedPayload``: id, timestamp, payload bytes, per-session seq,
encoding/compression/encryption markers, delivery mode, ordering key,
dedupe key and TTL (/root/reference/proto/electrician_relay.proto:16-43),
produced by the forward relay (encode → compress → encrypt → seq,
forwardrelay/submit.go:13-68, relaycodec/codec.go:85-200) and consumed
by receiving relays that decrypt → decompress → decode → ack with
dedupe/TTL/ordering semantics (receivingrelay/receive.go:13).

Spark mapping: the "wire" between jobs is a Kafka topic or a staging
table; the envelope is ordinary columns. Wrap/unwrap are column
pipelines (JSON encode → deflate/gzip/… → AES-GCM), seq is a window
per ordering key, TTL is a filter, dedupe is dropDuplicates (or
dropDuplicatesWithinWatermark on a stream), and per-key ordered
delivery is repartition(key) + sortWithinPartitions(seq) — Spark only
guarantees order within a partition, which is exactly the reference's
per-session guarantee (SURVEY §7.4.4).

At scale: every step is narrow except the seq window and the final
repartition, both keyed by ordering_key — one shuffle each, and the
same partitioning is reused by a keyed Kafka sink downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from electrician_spark.functions import codecs

ENVELOPE_COLS = (
    "id",
    "ts",
    "payload",
    "seq",
    "encoding",
    "compression",
    "encryption",
    "ordering_key",
    "dedupe_key",
    "expires_at",
)


def wrap(
    df: DataFrame,
    payload_cols: list[str] | None = None,
    *,
    ordering_key: Column | str | None = None,
    dedupe_key: Column | str | None = None,
    ts: Column | None = None,
    ttl_seconds: int | None = None,
    compression: str | None = None,
    encryption_key: str | None = None,
) -> DataFrame:
    """Payload columns → one envelope row per record.

    ``id`` is content-derived (sha256 of payload + seq) so re-wrapping
    the same batch is idempotent — the deterministic analog of the
    reference's ULID ids. ``seq`` is a per-ordering-key row_number in
    ``ts`` order (per-session seq, forwardrelay/submit.go:29); without
    an ordering key it is a global zipWithIndex-free constant 0 — the
    unordered delivery mode.
    """
    cols = payload_cols or df.columns
    okey = F.col(ordering_key) if isinstance(ordering_key, str) else ordering_key
    dkey = F.col(dedupe_key) if isinstance(dedupe_key, str) else dedupe_key
    ts_col = ts if ts is not None else F.current_timestamp()

    out = df.select(
        F.to_json(F.struct(*cols)).alias("_json"),
        ts_col.alias("ts"),
        (okey if okey is not None else F.lit(None).cast("string")).alias("ordering_key"),
        (dkey if dkey is not None else F.lit(None).cast("string")).alias("dedupe_key"),
    )
    if okey is not None:
        w = Window.partitionBy("ordering_key").orderBy("ts", "_json")
        out = out.withColumn("seq", F.row_number().over(w).cast("long"))
    else:
        out = out.withColumn("seq", F.lit(0).cast("long"))

    payload: Column = F.encode(F.col("_json"), "utf-8").cast("binary")
    if compression:
        payload = codecs.compress(payload, compression)
    if encryption_key:
        payload = codecs.aes_encrypt(payload, encryption_key)

    expires = (
        (F.col("ts") + F.expr(f"INTERVAL {int(ttl_seconds)} SECOND"))
        if ttl_seconds is not None
        else F.lit(None).cast("timestamp")
    )
    # id mixes the ordering key: two streams' records with the same
    # payload and seq (session A/B both at seq 1) are distinct records
    # and must not share an id (the reference's ULIDs are per-record);
    # keyless wrapping stays content-addressed (idempotent re-wrap).
    id_src = F.concat(
        F.col("_json"),
        F.col("seq").cast("string"),
        F.coalesce(F.col("ordering_key"), F.lit("")),
    )
    return out.select(
        F.sha2(id_src, 256).alias("id"),
        "ts",
        payload.alias("payload"),
        "seq",
        F.lit("json").alias("encoding"),
        F.lit(compression or "none").alias("compression"),
        F.lit("aes-gcm" if encryption_key else "none").alias("encryption"),
        "ordering_key",
        "dedupe_key",
        expires.alias("expires_at"),
    )


def unwrap(
    df: DataFrame,
    payload_schema: str,
    *,
    compression: str | None = None,
    encryption_key: str | None = None,
    drop_expired_at: Column | None = None,
    dedupe: bool = False,
) -> DataFrame:
    """Envelope rows → payload columns (receiving-relay semantics).

    Steps mirror receivingrelay/receive.go:13: decrypt → decompress →
    decode, then DropPolicy EXPIRED (``expires_at <= now``) and
    receiver-side dedupe on ``dedupe_key`` (proto:31-33). Malformed
    payloads decode to NULL structs rather than failing the task (the
    DLQ column pattern — filter on ``payload_ok``)."""
    payload: Column = F.col("payload")
    if encryption_key:
        payload = codecs.aes_decrypt(payload, encryption_key)
    if compression:
        payload = codecs.decompress(payload, compression)
    decoded = F.from_json(F.decode(payload, "utf-8"), payload_schema)

    # PERMISSIVE from_json yields a struct of all-nulls for corrupt
    # input (never a null struct); to_json drops null fields, so '{}'
    # marks a failed decode.
    out = df.withColumn("_decoded", decoded).withColumn(
        "payload_ok",
        F.col("_decoded").isNotNull() & (F.to_json(F.col("_decoded")) != F.lit("{}")),
    )
    if drop_expired_at is not None:
        out = out.filter(
            F.col("expires_at").isNull() | (F.col("expires_at") > drop_expired_at)
        )
    if dedupe:
        # Batch receiver dedupe; on a stream use
        # dropDuplicatesWithinWatermark(["dedupe_key"]) after withWatermark.
        # No dedupe key → no dedupe (reference proto:31-33 semantics):
        # dropDuplicates treats NULLs as equal, so a bare call would
        # collapse EVERY keyless record into one surviving row.
        keyless = out.filter(F.col("dedupe_key").isNull())
        out = (
            out.filter(F.col("dedupe_key").isNotNull())
            .dropDuplicates(["dedupe_key"])
            .unionByName(keyless)
        )
    return out


def to_wire(df: DataFrame, codec: str = "proto", out_col: str = "wire") -> DataFrame:
    """Envelope columns → ONE binary wire column, for shipping over a
    byte transport (Kafka value, staging blob). ``codec='proto'`` emits
    the reference's actual wire format — protobuf WrappedPayload
    (electrician_relay.proto:16-43, functions/protowire.py);
    ``codec='json'`` emits the envelope as a JSON object (payload
    hex-encoded — JSON has no bytes type), the debug-friendly form."""
    if codec == "proto":
        from electrician_spark.functions import protowire

        return protowire.wire_encode(df, out_col=out_col)
    if codec == "json":
        obj = F.struct(
            F.col("id"),
            F.unix_micros(F.col("ts")).alias("ts_us"),
            F.hex(F.col("payload")).alias("payload_hex"),
            F.col("seq"),
            F.col("encoding"),
            F.col("compression"),
            F.col("encryption"),
            F.col("ordering_key"),
            F.col("dedupe_key"),
            F.unix_micros(F.col("expires_at")).alias("expires_us"),
        )
        return df.withColumn(out_col, F.encode(F.to_json(obj), "utf-8"))
    raise ValueError(f"unknown wire codec {codec!r} (proto|json)")


def from_wire(
    df: DataFrame,
    codec: str = "proto",
    col: str = "wire",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Inverse of :func:`to_wire`: reconstruct the envelope columns
    from the wire bytes alone (receiving-relay entry point).
    ``keep`` carries named extra input columns through (both codecs;
    names colliding with ENVELOPE_COLS raise rather than silently
    duplicating an output column). Output schema is the keep columns
    FIRST (in the order given), then ENVELOPE_COLS."""
    if codec == "proto":
        from electrician_spark.functions import protowire

        return protowire.wire_decode(df, col=col, keep=keep)
    if codec == "json":
        schema = (
            "id string, ts_us long, payload_hex string, seq long, "
            "encoding string, compression string, encryption string, "
            "ordering_key string, dedupe_key string, expires_us long"
        )
        d = F.from_json(F.decode(F.col(col), "utf-8"), schema)
        bad = [k for k in keep if k in ENVELOPE_COLS]
        if bad:
            raise ValueError(
                f"keep columns collide with envelope output columns: {bad} "
                f"— rename them upstream (output schema is keep + "
                f"ENVELOPE_COLS)"
            )
        return df.select(
            *[F.col(k) for k in keep],
            d["id"].alias("id"),
            F.timestamp_micros(d["ts_us"]).alias("ts"),
            F.unhex(d["payload_hex"]).alias("payload"),
            d["seq"].alias("seq"),
            d["encoding"].alias("encoding"),
            d["compression"].alias("compression"),
            d["encryption"].alias("encryption"),
            d["ordering_key"].alias("ordering_key"),
            d["dedupe_key"].alias("dedupe_key"),
            F.timestamp_micros(d["expires_us"]).alias("expires_at"),
        )
    raise ValueError(f"unknown wire codec {codec!r} (proto|json)")


def ordered_delivery(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """DELIVERY_RELIABLE_ORDERED (proto:168-173): co-locate each
    ordering_key in one partition and sort by seq within it. Spark's
    per-partition order guarantee then gives per-key in-order consume —
    the same contract as the reference's per-target session streams."""
    parts = [F.col("ordering_key")]
    rep = df.repartition(num_partitions, *parts) if num_partitions else df.repartition(*parts)
    return rep.sortWithinPartitions("ordering_key", "seq")
