from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from electrician_spark.operators import packing, sampling


def test_mixture_sample_rates_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, "big" if i % 2 else "premium") for i in range(400)], "doc_id long, source string"
    )
    out = sampling.mixture_sample(df, "source", {"premium": 1.0, "big": 0.25})
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["premium"] == 200  # rate 1.0 keeps everything
    assert 20 <= counts["big"] <= 80  # ~25% of 200, md5-spread
    # byte-identical on re-run (no RNG state)
    again = sampling.mixture_sample(df, "source", {"premium": 1.0, "big": 0.25})
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(r["doc_id"] for r in again.collect())


def test_mixture_sample_default_rate_drops_unlisted(spark):
    df = spark.createDataFrame([(i, "unknown") for i in range(50)], "doc_id long, source string")
    assert sampling.mixture_sample(df, "source", {"listed": 1.0}).count() == 0
    assert sampling.mixture_sample(df, "source", {}, default_rate=1.0).count() == 50
    with pytest.raises(ValueError, match="rate"):
        sampling.mixture_sample(df, "source", {"x": 1.5})


def test_pack_sequences_chunking_arithmetic(spark):
    # Single shard so the stream order is fully known.
    df = spark.createDataFrame([(i, 60) for i in range(10)], "doc_id long, tok long")
    out = packing.pack_sequences(df, "tok", budget=100, n_shards=1).orderBy("doc_id").collect()
    assert [r["start_offset"] for r in out] == [60 * i for i in range(10)]
    assert [r["pack_id"] for r in out] == [0, 0, 1, 1, 2, 3, 3, 4, 4, 5]
    # docs crossing a 100-token cut touch two packs
    assert [r["n_splits"] for r in out] == [1, 2, 1, 2, 1, 1, 2, 1, 2, 1]


def test_pack_sequences_shards_are_stable_and_balanced(spark):
    df = spark.createDataFrame([(i, 10) for i in range(2000)], "doc_id long, tok long")
    out = packing.pack_sequences(df, "tok", budget=100, n_shards=8)
    per_shard = [r["n"] for r in out.groupBy("shard").agg(F.count("*").alias("n")).collect()]
    assert len(per_shard) == 8 and min(per_shard) > 100  # md5 spreads evenly-ish
    # within every shard the stream is gapless: offsets tile exactly
    total = out.groupBy("shard").agg(
        (F.max(F.col("start_offset") + F.col("tok"))).alias("stream_len"),
        F.sum("tok").alias("tok_sum"),
    )
    assert all(r["stream_len"] == r["tok_sum"] for r in total.collect())


def test_pack_sequences_validates_args(spark):
    df = spark.createDataFrame([(1, 10)], "doc_id long, tok long")
    with pytest.raises(ValueError, match="budget"):
        packing.pack_sequences(df, "tok", budget=0)
    with pytest.raises(ValueError, match="n_shards"):
        packing.pack_sequences(df, "tok", budget=10, n_shards=0)


# ---------------------------------------------------------------------------
# chunk_documents
# ---------------------------------------------------------------------------


def _py_chunks(text, max_tokens, overlap):
    toks = [t for t in text.split() if t]
    n = len(toks)
    if n == 0:
        return []
    stride = max_tokens - overlap
    starts = list(range(1, max(n - overlap, 1) + 1, stride))
    return [toks[s - 1 : s - 1 + max_tokens] for s in starts]


def test_chunk_documents_matches_python_rule(spark):
    from electrician_spark.operators.packing import chunk_documents

    docs = [
        (1, " ".join(f"t{i}" for i in range(10))),
        (2, "a b c"),
        (3, ""),
        (4, " ".join(f"w{i}" for i in range(13))),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    for max_tokens, overlap in ((8, 4), (8, 0), (4, 1), (3, 2)):
        out = chunk_documents(df, max_tokens, overlap)
        got = {}
        for r in out.collect():
            got.setdefault(r["doc_id"], []).append(
                (r["chunk_id"], r["chunk_text"].split(), r["n_chunks"], r["chunk_tokens"])
            )
        for doc_id, text in docs:
            want = _py_chunks(text, max_tokens, overlap)
            rows = sorted(got.get(doc_id, []))
            assert len(rows) == len(want), (doc_id, max_tokens, overlap)
            for (cid, ctoks, n_chunks, ctn), (i, wtoks) in zip(rows, enumerate(want)):
                assert cid == i and ctoks == wtoks and ctn == len(wtoks)
                assert n_chunks == len(want)


def test_chunk_documents_covers_every_token_and_no_dup_tail(spark):
    from electrician_spark.operators.packing import chunk_documents

    text = " ".join(f"x{i}" for i in range(50))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    out = chunk_documents(df, 8, 3).collect()
    seen = set()
    for r in out:
        seen.update(r["chunk_text"].split())
    assert seen == set(text.split())  # full coverage incl. the tail
    # last chunk reaches the final token; no chunk is a subset of another
    spans = sorted(
        (r["chunk_id"], r["chunk_text"].split()[0], r["chunk_text"].split()[-1])
        for r in out
    )
    assert spans[-1][2] == "x49"
    token_lists = [r["chunk_text"].split() for r in sorted(out, key=lambda r: r["chunk_id"])]
    for a, b in zip(token_lists, token_lists[1:]):
        assert not set(b) <= set(a)


def test_chunk_documents_zero_overlap_partitions_exactly(spark):
    from electrician_spark.operators.packing import chunk_documents

    text = " ".join(f"x{i}" for i in range(10))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    out = sorted(chunk_documents(df, 4, 0).collect(), key=lambda r: r["chunk_id"])
    assert [r["chunk_tokens"] for r in out] == [4, 4, 2]
    assert " ".join(r["chunk_text"] for r in out) == text


def test_chunk_documents_validates_args(spark):
    import pytest
    from electrician_spark.operators.packing import chunk_documents

    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(df, 0)
    with pytest.raises(ValueError):
        chunk_documents(df, 4, overlap=4)


def test_chunk_documents_plan_single_evaluation_no_shuffle(spark):
    """The tokenize+chunk expression must appear ONCE in the physical
    plan: a non-outer posexplode makes Catalyst infer a size filter
    below the defining Project, re-evaluating the whole interpreted
    expression per row (the reason chunk_documents uses
    posexplode_outer). Also pins: no exchange, no Python."""
    from electrician_spark.operators.packing import chunk_documents

    df = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    plan = chunk_documents(df, 4, 1)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("transform(array(filter") == 1
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


# --- best-fit (no-split) packing -------------------------------------------


def _bfd_reference(rows, budget):
    """Plain-Python Best-Fit-Decreasing over (id, tokens) rows: the
    assignment pack_best_fit must reproduce per shard."""
    import bisect

    order = sorted(rows, key=lambda r: (-r[1], r[0]))
    rem, next_pack, out = [], 0, {}
    for doc_id, size in order:
        i = bisect.bisect_left(rem, (size, -1))
        if i < len(rem):
            r, pid = rem.pop(i)
            bisect.insort(rem, (r - size, pid))
            out[doc_id] = pid
        else:
            out[doc_id] = next_pack
            left = budget - size
            if left > 0:
                bisect.insort(rem, (left, next_pack))
            next_pack += 1
    return out


def test_pack_best_fit_matches_reference_and_respects_budget(spark):
    import hashlib

    budget, n_shards = 100, 4
    rows = [(i, (i * 37) % 130 + 1) for i in range(1, 201)]  # some oversized (>100)
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    packed = packing.pack_best_fit(df, "n_tokens", budget, n_shards=n_shards)
    got = packed.collect()
    assert len(got) == len(rows)  # every doc assigned exactly once

    # shard key replay + per-shard reference equality
    def shard_of(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % n_shards

    by_shard: dict = {}
    for doc_id, size in rows:
        by_shard.setdefault(shard_of(doc_id), []).append((doc_id, size))
    want = {}
    for sh, shard_rows in by_shard.items():
        ref = _bfd_reference(shard_rows, budget)
        for doc_id, pid in ref.items():
            want[doc_id] = (sh, pid)
    assert {r.doc_id: (r.shard, r.pack_id) for r in got} == want

    # no pack exceeds the budget except single-oversized-doc packs
    fills: dict = {}
    sizes = dict(rows)
    for r in got:
        fills.setdefault((r.shard, r.pack_id), []).append(sizes[r.doc_id])
    for members in fills.values():
        assert sum(members) <= budget or len(members) == 1

    # determinism across runs
    again = {r.doc_id: (r.shard, r.pack_id) for r in
             packing.pack_best_fit(df, "n_tokens", budget, n_shards=n_shards).collect()}
    assert again == {r.doc_id: (r.shard, r.pack_id) for r in got}


def test_pack_best_fit_beats_sequential_padding(spark):
    # BFD must waste no more padding than arrival-order packing on a
    # padding-heavy mix (the reason to use it).
    rows = [(i, 60 if i % 2 else 45) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    packed = packing.pack_best_fit(df, "n_tokens", 100, n_shards=1)
    stats = packing.packing_stats(packed, "n_tokens", 100).collect()
    frac = stats[0].corpus_padding_frac
    n_packs = len(stats)
    # sequential arrival order alternates 60/45 → one doc per pack (105 > 100)
    # = 100 packs at 0.475 padding; BFD pairs the 45s (45+45) → exactly
    # 50 + 25 = 75 packs at 0.3 padding
    assert n_packs == 75
    assert abs(frac - 0.3) < 1e-9
    # stats invariants
    for r in stats:
        assert r.used_tokens + r.padding >= 100 or r.n_docs == 1


def test_pack_best_fit_validates_args(spark):
    df = spark.createDataFrame([(1, 5)], "doc_id long, n_tokens long")
    with pytest.raises(ValueError):
        packing.pack_best_fit(df, "n_tokens", 0)
    with pytest.raises(ValueError):
        packing.pack_best_fit(df, "n_tokens", 10, n_shards=0)


# --- length-grouped batching (r8) --------------------------------------------


def _py_length_batches(rows, batch_size, n_shards, seed=0):
    """Plain-Python replay: md5 shard + (len desc, md5 key, id) order."""
    import hashlib

    def skey(did):
        return int(hashlib.md5(str(did).encode()).hexdigest()[:8], 16)

    def kkey(did):
        return int(hashlib.md5(f"{seed}:{did}".encode()).hexdigest()[:8], 16)

    out = {}
    by_shard = {}
    for did, ln in rows:
        by_shard.setdefault(skey(did) % n_shards, []).append((did, ln))
    for sh, docs in by_shard.items():
        docs.sort(key=lambda t: (-t[1], kkey(t[0]), t[0]))
        for i, (did, _ln) in enumerate(docs):
            out[did] = (sh, i // batch_size, i % batch_size)
    return out


def test_length_batches_matches_python_replay(spark):
    rows = [(i, 10 + (i * 37) % 90) for i in range(1, 301)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r.doc_id: (r.shard, r.batch_id, r.pos)
        for r in packing.length_batches(
            df, batch_size=8, len_col="n_tokens", n_shards=4, seed=3
        ).collect()
    }
    assert got == _py_length_batches(rows, 8, 4, seed=3)


def test_length_batches_cut_padding_vs_random_batching(spark):
    # the operator's reason to exist: on a wide length mix, grouped
    # batches waste far less padding than id-order batching
    rows = [(i, 5 + (i * 97) % 500) for i in range(1, 1001)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    batched = packing.length_batches(df, 16, "n_tokens", n_shards=2)
    stats = packing.length_batch_stats(batched, "n_tokens").collect()
    grouped_waste = sum(r.n * r.max_len - r.sum_len for r in stats)
    # id-order batching baseline (same shards, order by id)
    import hashlib

    by_shard = {}
    for did, ln in rows:
        sh = int(hashlib.md5(str(did).encode()).hexdigest()[:8], 16) % 2
        by_shard.setdefault(sh, []).append((did, ln))
    base_waste = 0
    for docs in by_shard.values():
        docs.sort()
        for i in range(0, len(docs), 16):
            chunk = [ln for _, ln in docs[i : i + 16]]
            base_waste += len(chunk) * max(chunk) - sum(chunk)
    assert grouped_waste < base_waste / 3  # big, not marginal, win
    # full batches are exactly batch_size; only per-shard tails short
    sizes = sorted(r.n for r in stats)
    assert sizes.count(16) >= len(sizes) - 2


def test_length_batches_deterministic_and_seed_sensitive(spark):
    rows = [(i, 50) for i in range(1, 101)]  # all-equal lengths
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    a = {r.doc_id: (r.shard, r.batch_id, r.pos) for r in
         packing.length_batches(df, 8, "n_tokens", n_shards=2, seed=1).collect()}
    b = {r.doc_id: (r.shard, r.batch_id, r.pos) for r in
         packing.length_batches(df, 8, "n_tokens", n_shards=2, seed=1).collect()}
    assert a == b
    c = {r.doc_id: (r.shard, r.batch_id, r.pos) for r in
         packing.length_batches(df, 8, "n_tokens", n_shards=2, seed=2).collect()}
    assert a != c  # equal lengths: the md5 tiebreak is the order
    import pytest as _pt

    with _pt.raises(ValueError):
        packing.length_batches(df, 0, "n_tokens")


def test_length_batches_plan_one_exchange_no_python(spark):
    rows = [(i, 10 + i % 30) for i in range(1, 201)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    plan = (
        packing.length_batches(df, 8, "n_tokens", n_shards=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1  # the shard key
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "SortMergeJoin" not in plan
