"""Scalar quantization: code range, reconstruction error bound,
degenerate dimensions, and the no-vector-shuffle plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from electrician_spark.operators import quantize


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (i, [float(i % 7) - 3.0, float(i % 11) / 10.0, 5.0]) for i in range(200)
    ]
    return spark.createDataFrame(rows, ["vec_id", "v"])


def test_bounds(spark, vecs):
    b = {r["dim"]: r for r in quantize.quantization_bounds(vecs, "v").collect()}
    assert b[0]["lo"] == -3.0 and b[0]["hi"] == 3.0
    assert b[2]["lo"] == 5.0 and b[2]["hi"] == 5.0  # degenerate


def test_codes_in_range_and_degenerate_zero(spark, vecs):
    out = quantize.quantize_embeddings(vecs, "v", bits=8).collect()
    for r in out:
        assert all(0 <= c <= 255 for c in r["v_q"])
        assert r["v_q"][2] == 0  # zero-span dim encodes 0, no NaN


def test_roundtrip_error_within_half_bucket(spark, vecs):
    bits = 8
    coded = quantize.quantize_embeddings(vecs, "v", bits=bits)
    bounds = quantize._bounds_row(quantize.quantization_bounds(vecs, "v"))
    recon = coded.crossJoin(F.broadcast(bounds)).select(
        "v",
        quantize.dequantize(
            F.col("v_q"), F.col("_q_lo"), F.col("_q_hi"), bits
        ).alias("r"),
    )
    for row in recon.collect():
        for orig, back in zip(row["v"][:2], row["r"][:2]):  # skip degenerate dim
            assert abs(orig - back) <= 6.0 / (1 << bits) / 2 + 1e-9


def test_more_bits_refines(spark, vecs):
    c4 = quantize.quantize_embeddings(vecs, "v", bits=4).collect()
    assert all(max(r["v_q"]) <= 15 for r in c4)
    with pytest.raises(ValueError):
        quantize.quantize_embeddings(vecs, "v", bits=0)


def test_vectors_never_shuffle(spark, vecs):
    plan = (
        quantize.quantize_embeddings(vecs, "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # The only exchanges belong to the d-row bounds aggregate / its
    # single-row collapse; the vector side joins by broadcast.
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


# --- product quantization ---------------------------------------------------


@pytest.fixture(scope="module")
def emb(spark):
    from electrician_spark.io import read_table

    return read_table(spark, "/root/testdata/sf0.001", "embeddings")


def test_pq_train_shapes_and_determinism(spark, emb):
    books = quantize.pq_train(emb, m=4, k=8, iters=2)
    assert len(books) == 4
    assert all(len(sub) == 8 for sub in books)
    assert all(len(c) == 16 for sub in books for c in sub)  # 64/4 dims
    again = quantize.pq_train(emb, m=4, k=8, iters=2)
    assert books == again  # fully deterministic, no RNG


def test_pq_encode_codes_and_nulls(spark, emb):
    books = quantize.pq_train(emb, m=4, k=8, iters=1)
    coded = quantize.pq_encode(emb, books)
    rows = coded.select("vec_id", "pq_code").collect()
    assert all(len(r.pq_code) == 4 for r in rows)
    assert all(0 <= c < 8 for r in rows for c in r.pq_code)
    # NULL vector propagates
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(vec_id=1, embedding=None)],
        "vec_id long, embedding array<float>",
    )
    assert quantize.pq_encode(df, books).first().pq_code is None


def test_pq_adc_identity_with_reconstruction(spark, emb):
    # ADC distance must equal the exact L2^2 between the query and the
    # centroid-reconstructed corpus vector.
    import numpy as np

    books = quantize.pq_train(emb, m=4, k=8, iters=2)
    coded = quantize.pq_encode(emb, books)
    queries = emb.filter(F.col("vec_id") < 3)
    out = quantize.pq_topk(coded, queries, books, k=5)
    rows = {(r.query_id, r.neighbor_id): r.dist for r in out.collect()}
    codes = {r.vec_id: r.pq_code for r in coded.select("vec_id", "pq_code").collect()}
    qvecs = {r.vec_id: np.asarray(list(r.embedding), float)
             for r in queries.select("vec_id", "embedding").collect()}
    for (qid, nid), dist in rows.items():
        rec = np.concatenate([np.asarray(books[s][codes[nid][s]]) for s in range(4)])
        want = float(((qvecs[qid] - rec) ** 2).sum())
        assert abs(dist - round(want, 6)) < 1e-9, (qid, nid)


def test_pq_lossless_when_codebook_covers_corpus(spark):
    # Every subspace has <= k distinct subvectors -> k-means seeds+means
    # reproduce them exactly -> reconstruction is lossless -> ADC top-k
    # == brute-force L2 top-k.
    import itertools
    import numpy as np
    from pyspark.sql import Row

    base = [[0.0, 1.0], [2.0, -1.0], [-3.0, 0.5]]
    rows = []
    for i, (a, b) in enumerate(itertools.product(base, base)):
        rows.append(Row(vec_id=i, embedding=[float(x) for x in a + b]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = quantize.pq_train(df, m=2, k=4, iters=3)
    coded = quantize.pq_encode(df, books)
    queries = df.filter(F.col("vec_id") < 2)
    got = {(r.query_id, r.rank): r.neighbor_id
           for r in quantize.pq_topk(coded, queries, books, k=3).collect()}
    V = {r.vec_id: np.asarray(list(r.embedding)) for r in df.collect()}
    for qid in (0, 1):
        dists = sorted(
            (round(float(((V[qid] - v) ** 2).sum()), 6), nid)
            for nid, v in V.items() if nid != qid
        )
        for rank, (_, nid) in enumerate(dists[:3], start=1):
            assert got[(qid, rank)] == nid, (qid, rank)


def test_pq_validates_dims(spark, emb):
    with pytest.raises(ValueError):
        quantize.pq_train(emb, m=7)  # 64 % 7 != 0


def test_ivfpq_subset_of_pq_and_exhaustive_probe_equal(spark, emb):
    # nprobe = all cells must equal plain ADC top-k; nprobe=1 results
    # are a subset of it per query with identical distances.
    books = quantize.pq_train(emb, m=4, k=8, iters=2)
    coded = quantize.pq_encode(emb, books)  # embeddings carries `label`
    queries = emb.filter(F.col("vec_id") < 5)
    n_cells = emb.select("label").distinct().count()
    full = quantize.pq_topk(coded, queries, books, k=5)
    allprobe = quantize.ivfpq_topk(coded, queries, books, k=5, nprobe=n_cells)
    want = {(r.query_id, r.rank): (r.neighbor_id, r.dist) for r in full.collect()}
    got = {(r.query_id, r.rank): (r.neighbor_id, r.dist) for r in allprobe.collect()}
    assert got == want

    one = quantize.ivfpq_topk(coded, queries, books, k=5, nprobe=1)
    full_d = {(r.query_id, r.neighbor_id): r.dist for r in full.collect()}
    for r in one.collect():
        # every probed result carries the true ADC distance
        got_full = full_d.get((r.query_id, r.neighbor_id))
        if got_full is not None:
            assert got_full == r.dist


def test_random_projection_reference_and_jl(spark):
    import hashlib

    import numpy as np

    from electrician_spark.operators.quantize import random_projection

    rng = np.random.default_rng(5)
    d, k, n = 48, 24, 200
    vecs = rng.normal(size=(n, d))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).repartition(7)  # matrix must be identical across partitions

    got = {
        r["vec_id"]: np.array(r["projected"])
        for r in random_projection(df, out_dim=k, seed=3).collect()
    }
    assert len(got) == n and all(v.shape == (k,) for v in got.values())

    # plain-Python replay of the md5 counter-mode matrix
    need = d * k
    raw = bytearray()
    ctr = 0
    while len(raw) < need:
        raw += hashlib.md5(f"3:rp:{ctr}".encode()).digest()
        ctr += 1
    b = np.frombuffer(bytes(raw[:need]), dtype=np.uint8).reshape(d, k)
    r = np.zeros((d, k))
    r[b < 42] = 1.0
    r[b >= 213] = -1.0
    r *= np.sqrt(3.0 / k)
    want = np.round(vecs @ r, 6)
    for i in range(n):
        assert np.array_equal(got[i], want[i]), i

    # JL sanity: mean squared-norm ratio ≈ 1 (E||Rx||² = ||x||²)
    ratios = [
        float(np.dot(got[i], got[i]) / np.dot(vecs[i], vecs[i])) for i in range(n)
    ]
    assert 0.8 < float(np.mean(ratios)) < 1.2

    # determinism: same seed same output; different seed differs
    again = {
        r["vec_id"]: np.array(r["projected"])
        for r in random_projection(df, out_dim=k, seed=3).collect()
    }
    assert all(np.array_equal(got[i], again[i]) for i in range(n))
    other = random_projection(df, out_dim=k, seed=4).first()["projected"]
    assert not np.array_equal(np.array(other), got[0])

    # mixed widths raise
    import pytest as _pt
    from py4j.protocol import Py4JJavaError

    bad = spark.createDataFrame(
        [(1, [1.0] * 8), (2, [1.0] * 9)], "vec_id long, embedding array<double>"
    ).coalesce(1)
    with _pt.raises(Exception):
        random_projection(bad, out_dim=4).collect()


# --- binary (sign-bit) quantization + hamming ANN (r8) ------------------------


def test_binary_quantize_matches_python_sign_bits(spark):
    import numpy as np

    rng = [
        (i, [float(((i * 37 + j * 11) % 13) - 6) for j in range(100)])
        for i in range(1, 41)
    ]
    df = spark.createDataFrame(rng, "vec_id long, embedding array<double>")
    got = {
        r.vec_id: list(r.embedding_b)
        for r in quantize.binary_quantize(df, "embedding", d=100).collect()
    }

    def py_words(vec):
        words = []
        for w in range(0, 100, 64):
            val = 0
            for j in range(min(64, 100 - w)):
                if vec[w + j] > 0:
                    val |= 1 << j
            if val >= 1 << 63:
                val -= 1 << 64
            words.append(val)
        return words

    for vid, vec in rng:
        assert got[vid] == py_words(vec), vid
    # 100 dims -> 2 words; second word uses 36 bits
    assert all(len(w) == 2 for w in got.values())


def test_binary_quantize_bit63_sign_convention(spark):
    # a vector whose ONLY positive dim is 63 must quantize to the
    # single negative word -(2^63) — the signed-BIGINT convention
    vec = [0.0] * 64
    vec[63] = 1.0
    df = spark.createDataFrame([(1, vec)], "vec_id long, embedding array<double>")
    (r,) = quantize.binary_quantize(df, "embedding", d=64).collect()
    assert list(r.embedding_b) == [-(1 << 63)]
    import pytest as _pt

    with _pt.raises(ValueError):
        quantize.binary_quantize(df, "embedding", d=0)


def test_hamming_topk_matches_python_replay(spark):
    rows = [
        (i, [float(((i * 29 + j * 7) % 11) - 5) for j in range(64)])
        for i in range(1, 31)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.filter(F.col("vec_id") <= 3)
    got = [
        (r.query_id, r.neighbor_id, r.hamming, r.rank)
        for r in quantize.hamming_topk(df, queries, d=64, k=4)
        .orderBy("query_id", "rank")
        .collect()
    ]

    def bits(vec):
        return [1 if x > 0 else 0 for x in vec]

    want = []
    by_id = dict(rows)
    for qid in (1, 2, 3):
        qb = bits(by_id[qid])
        scored = sorted(
            (sum(a != b for a, b in zip(qb, bits(v))), nid)
            for nid, v in rows
            if nid != qid
        )
        for rank, (hm, nid) in enumerate(scored[:4], 1):
            want.append((qid, nid, hm, rank))
    assert got == want


def test_hamming_topk_plan_broadcast_no_python(spark):
    rows = [(i, [float(i + j) for j in range(64)]) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    plan = (
        quantize.hamming_topk(df, df.filter(F.col("vec_id") <= 2), d=64, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_hamming_rerank_surface_and_subset(spark):
    """The tier stack returns the cosine_topk surface; its results are
    exact-cosine over the hamming candidate band, so with a prefilter
    wide enough to cover the corpus it EQUALS brute-force cosine_topk."""
    from electrician_spark.operators import similarity as sim

    rows = [
        (i, [float(((i * 31 + j * 13) % 17) - 8) for j in range(64)])
        for i in range(1, 25)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") <= 2)
    # prefilter_factor*k >= corpus size: must equal exact brute force
    wide = [
        (r.query_id, r.neighbor_id, r.cos, r.rank)
        for r in quantize.hamming_rerank_topk(df, q, d=64, k=3, prefilter_factor=10)
        .orderBy("query_id", "rank").collect()
    ]
    exact = [
        (r.query_id, r.neighbor_id, r.cos, r.rank)
        for r in sim.cosine_topk(df, q, k=3).orderBy("query_id", "rank").collect()
    ]
    assert wide == exact
    # narrow band: still k rows per query, cos descending, hamming-band subset
    narrow = quantize.hamming_rerank_topk(df, q, d=64, k=3, prefilter_factor=1).collect()
    per_q = {}
    for r in narrow:
        per_q.setdefault(r.query_id, []).append(r)
    band = {
        (r.query_id, r.neighbor_id)
        for r in quantize.hamming_topk(df, q, d=64, k=3).collect()
    }
    for qid, rs in per_q.items():
        assert len(rs) == 3
        coss = [r.cos for r in sorted(rs, key=lambda r: r.rank)]
        assert coss == sorted(coss, reverse=True)
        assert all((r.query_id, r.neighbor_id) in band for r in rs)
    import pytest as _pt

    with _pt.raises(ValueError):
        quantize.hamming_rerank_topk(df, q, d=64, k=3, prefilter_factor=0)


def test_binary_quantize_word_boundaries(spark):
    """Dim counts straddling the 64-bit word boundaries (63/64/65,
    127/128/129) must pack/round-trip exactly — the off-by-one zone
    of the plan-time unrolling."""
    for d in (63, 64, 65, 127, 128, 129):
        vec = [1.0 if (i * 7) % 3 == 0 else -1.0 for i in range(d)]
        df = spark.createDataFrame([(1, vec)], "vec_id long, embedding array<double>")
        (r,) = quantize.binary_quantize(df, "embedding", d=d).collect()
        words = list(r.embedding_b)
        assert len(words) == (d + 63) // 64
        back = []
        for wi, word in enumerate(words):
            u = word + (1 << 64) if word < 0 else word
            for j in range(min(64, d - wi * 64)):
                back.append(bool(u >> j & 1))
        assert back == [x > 0 for x in vec], d


def test_pq_codebooks_round_trip(spark, tmp_path):
    """Reloaded codebooks must encode and ADC-search bit-identically —
    the train-once/reuse-everywhere contract for PQ."""
    import pytest as _pt

    emb = spark.createDataFrame(
        [(i, [float(((i * 13 + j * 7) % 19) - 9) for j in range(16)]) for i in range(1, 41)],
        "vec_id long, embedding array<double>",
    )
    books = quantize.pq_train(emb, vec_col="embedding", m=4, k=4, iters=1, id_col="vec_id")
    p = str(tmp_path / "books.json")
    quantize.save_codebooks(p, books)
    back = quantize.load_codebooks(p)
    assert back == books  # exact float round-trip
    q = emb.filter(F.col("vec_id") <= 2)
    a = [(r.query_id, r.neighbor_id, r.rank) for r in
         quantize.pq_topk(quantize.pq_encode(emb, books), q, books, k=3)
         .orderBy("query_id", "rank").collect()]
    b = [(r.query_id, r.neighbor_id, r.rank) for r in
         quantize.pq_topk(quantize.pq_encode(emb, back), q, back, k=3)
         .orderBy("query_id", "rank").collect()]
    assert a == b
    (tmp_path / "bad.json").write_text('{"type": "other", "data": []}')
    with _pt.raises(ValueError):
        quantize.load_codebooks(str(tmp_path / "bad.json"))


def _toy_labeled_emb(spark, n=60, d=16, cells=3):
    rows = [
        (i, [float(((i * 13 + j * 7) % 19) - 9) for j in range(d)], i % cells)
        for i in range(1, n + 1)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")


def test_hamming_topk_ivf_full_probe_equals_brute(spark):
    """nprobe = n_cells probes every cell — the bucketed form must then
    recover brute-force hamming_topk exactly (same pairs, same ranks)."""
    emb = _toy_labeled_emb(spark)
    q = emb.filter(F.col("vec_id") <= 5)
    brute = [(r.query_id, r.neighbor_id, r.hamming, r.rank) for r in
             quantize.hamming_topk(emb, q, d=16, k=4)
             .orderBy("query_id", "rank").collect()]
    full = [(r.query_id, r.neighbor_id, r.hamming, r.rank) for r in
            quantize.hamming_topk_ivf(emb, q, d=16, k=4, nprobe=3)
            .orderBy("query_id", "rank").collect()]
    assert brute == full


def test_hamming_topk_ivf_partial_probe_subset_and_bounded(spark):
    """nprobe=1 scores only the routed cell: every returned neighbor
    belongs to a probed cell, hamming values match the brute scores for
    those pairs (the router changes WHICH pairs, never their distance),
    and per-query result count is bounded by k."""
    emb = _toy_labeled_emb(spark)
    q = emb.filter(F.col("vec_id") <= 5)
    brute = {(r.query_id, r.neighbor_id): r.hamming for r in
             quantize.hamming_topk(emb, q, d=16, k=60).collect()}
    part = quantize.hamming_topk_ivf(emb, q, d=16, k=4, nprobe=1).collect()
    labels = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    per_q: dict = {}
    for r in part:
        assert brute[(r.query_id, r.neighbor_id)] == r.hamming
        per_q.setdefault(r.query_id, set()).add(labels[r.neighbor_id])
    for cells in per_q.values():
        assert len(cells) == 1  # nprobe=1 -> one cell per query


def test_hamming_topk_auto_routes_on_query_count(spark):
    """Below the threshold auto == brute; above it auto == the ivf
    form (same parameters) — the measured-crossover routing rule."""
    emb = _toy_labeled_emb(spark)
    small_q = emb.filter(F.col("vec_id") <= 3)
    a = [(r.query_id, r.neighbor_id, r.rank) for r in
         quantize.hamming_topk_auto(emb, small_q, d=16, k=4, max_brute_queries=5)
         .orderBy("query_id", "rank").collect()]
    b = [(r.query_id, r.neighbor_id, r.rank) for r in
         quantize.hamming_topk(emb, small_q, d=16, k=4)
         .orderBy("query_id", "rank").collect()]
    assert a == b
    big_q = emb.filter(F.col("vec_id") <= 10)
    c = [(r.query_id, r.neighbor_id, r.rank) for r in
         quantize.hamming_topk_auto(emb, big_q, d=16, k=4, nprobe=2,
                                    max_brute_queries=5)
         .orderBy("query_id", "rank").collect()]
    d_ = [(r.query_id, r.neighbor_id, r.rank) for r in
          quantize.hamming_topk_ivf(emb, big_q, d=16, k=4, nprobe=2)
          .orderBy("query_id", "rank").collect()]
    assert c == d_


def test_hamming_topk_auto_unlabeled_corpus_falls_back_to_brute(spark):
    """With the default label_col='label' but NO label column in the
    corpus, auto must route to the exact brute plan even above the
    query-count threshold — never raise from inside hamming_topk_ivf
    (r9 advice: the docstring promised the fallback, the code didn't)."""
    emb = _toy_labeled_emb(spark).drop("label")
    big_q = emb.filter(F.col("vec_id") <= 10)
    a = [(r.query_id, r.neighbor_id, r.rank) for r in
         quantize.hamming_topk_auto(emb, big_q, d=16, k=4,
                                    max_brute_queries=5)
         .orderBy("query_id", "rank").collect()]
    b = [(r.query_id, r.neighbor_id, r.rank) for r in
         quantize.hamming_topk(emb, big_q, d=16, k=4)
         .orderBy("query_id", "rank").collect()]
    assert a == b


def test_hamming_topk_auto_explicit_missing_label_col_raises(spark):
    """A typo'd EXPLICIT label_col must raise, not silently disable the
    IVF tier and run the O(|corpus|x|queries|) brute plan (r10 advice);
    only the DEFAULT 'label' falls back silently."""
    import pytest

    emb = _toy_labeled_emb(spark)
    big_q = emb.filter(F.col("vec_id") <= 10)
    with pytest.raises(ValueError, match="labell"):
        quantize.hamming_topk_auto(
            emb, big_q, d=16, k=4, label_col="labell", max_brute_queries=5
        )


def test_hamming_topk_ivf_plan_no_sort_merge_no_python(spark):
    emb = _toy_labeled_emb(spark)
    q = emb.filter(F.col("vec_id") <= 3)
    plan = (
        quantize.hamming_topk_ivf(emb, q, d=16, k=4, nprobe=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan
