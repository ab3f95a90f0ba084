"""DSIR importance resampling (operators/dsir.py) — pinned against an
independent plain-Python (hashlib) replay of the estimator."""

import hashlib
import math

from pyspark.sql import functions as F

from electrician_spark.operators import dsir

B = 512  # small bucket count: forces hash collisions into the pin too


def _py_buckets(text: str) -> list[int]:
    toks = text.strip().lower().split()
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return [
        int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B for g in grams
    ]


def _py_counts(texts: dict[int, str]) -> dict[int, int]:
    c: dict[int, int] = {}
    for t in texts.values():
        for b in _py_buckets(t):
            c[b] = c.get(b, 0) + 1
    return c


def _py_log_weights(
    raw: dict[int, str], target: dict[int, str]
) -> dict[int, float]:
    ct, cr = _py_counts(target), _py_counts(raw)
    lt = math.log(sum(ct.values()) + B)
    lr = math.log(sum(cr.values()) + B)
    out = {}
    for did, t in raw.items():
        w = 0.0
        for b in _py_buckets(t):
            w += (
                math.log(ct.get(b, 0) + 1)
                - lt
                - math.log(cr.get(b, 0) + 1)
                + lr
            )
        out[did] = w
    return out


TARGET = {
    100 + i: s
    for i, s in enumerate(
        [
            "the cat sat on the mat",
            "a cat and a dog sat together",
            "the dog chased the cat around",
            "cats and dogs are pets",
        ]
    )
}
RAW = {
    0: "the cat sat quietly near the dog",
    1: "stock market prices fell sharply today",
    2: "a dog and a cat sat on the mat",
    3: "quarterly earnings exceeded analyst expectations",
    4: "the cat the cat the cat",  # repetition: bag (not set) semantics
    5: "dogs sat",
    6: "",  # empty doc: zero grams, weight 0.0
    7: "mergers and acquisitions dominate headlines",
}


def _df(spark, texts):
    return spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )


def test_log_weights_match_python_replay(spark):
    raw_df, target_df = _df(spark, RAW), _df(spark, TARGET)
    tc = dsir.fit_hashed_ngram_counts(target_df, n_buckets=B)
    rc = dsir.fit_hashed_ngram_counts(raw_df, n_buckets=B)
    llr, default_llr = dsir.log_ratio_table(tc, rc, n_buckets=B)
    rows = dsir.dsir_log_weights(raw_df, llr, default_llr, n_buckets=B).collect()
    got = {r.doc_id: r.log_w for r in rows}
    want = _py_log_weights(RAW, TARGET)
    # EVERY input id appears exactly once — 0-gram doc 6 is restored
    # via the left join with log_w 0.0 / n_grams 0 (ADVICE r7)
    assert set(got) == set(RAW) and len(rows) == len(RAW)
    by_id = {r.doc_id: r for r in rows}
    assert by_id[6].log_w == 0.0 and by_id[6].n_grams == 0
    for did, w in got.items():
        assert abs(w - round(want[did], 6)) < 1e-6, (did, w, want[did])


def test_target_like_docs_outscore_off_domain(spark):
    raw_df, target_df = _df(spark, RAW), _df(spark, TARGET)
    tc = dsir.fit_hashed_ngram_counts(target_df, n_buckets=B)
    rc = dsir.fit_hashed_ngram_counts(raw_df, n_buckets=B)
    llr, default_llr = dsir.log_ratio_table(tc, rc, n_buckets=B)
    w = {
        r.doc_id: r.log_w
        for r in dsir.dsir_log_weights(
            raw_df, llr, default_llr, n_buckets=B
        ).collect()
    }
    # every cat/dog doc beats every finance doc
    assert min(w[0], w[2], w[5]) > max(w[1], w[3], w[7])


def test_select_matches_python_gumbel_replay(spark):
    raw_df, target_df = _df(spark, RAW), _df(spark, TARGET)
    out = dsir.dsir_select(raw_df, target_df, k=3, n_buckets=B, seed=7).collect()
    assert len(out) == 3
    want_w = _py_log_weights(RAW, TARGET)
    keys = {}
    for did in RAW:  # 0-gram docs participate with weight 0.0 (ADVICE r7)
        h = hashlib.md5(f"7:{did}".encode()).hexdigest()[:8]
        u = (int(h, 16) + 0.5) / 2**32
        keys[did] = round(round(want_w[did], 6) - math.log(-math.log(u)), 6)
    want = sorted(keys, key=lambda d: (-keys[d], d))[:3]
    assert [r.doc_id for r in out] == want
    for r in out:
        assert abs(r.gumbel_key - keys[r.doc_id]) < 1e-6


def test_select_deterministic_and_seed_sensitive(spark):
    raw_df, target_df = _df(spark, RAW), _df(spark, TARGET)
    a = [r.doc_id for r in dsir.dsir_select(raw_df, target_df, 3, n_buckets=B, seed=1).collect()]
    b = [r.doc_id for r in dsir.dsir_select(raw_df, target_df, 3, n_buckets=B, seed=1).collect()]
    assert a == b
    seen = {tuple(a)}
    for s in range(2, 8):
        seen.add(
            tuple(
                r.doc_id
                for r in dsir.dsir_select(
                    raw_df, target_df, 3, n_buckets=B, seed=s
                ).collect()
            )
        )
    assert len(seen) > 1  # different seeds really do move the draw


def test_scoring_plan_is_jvm_only_with_broadcast(spark):
    raw_df, target_df = _df(spark, RAW), _df(spark, TARGET)
    tc = dsir.fit_hashed_ngram_counts(target_df, n_buckets=B)
    rc = dsir.fit_hashed_ngram_counts(raw_df, n_buckets=B)
    llr, default_llr = dsir.log_ratio_table(tc, rc, n_buckets=B)
    plan = dsir.dsir_log_weights(
        raw_df, llr, default_llr, n_buckets=B
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # llr table broadcasts
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_sum" in plan or "partial" in plan.lower()  # map-side combine
    # 0-gram docs ride the scan via explode_outer — restoring them must
    # NOT cost a corpus-wide join (two exchanges at 100 TB); the only
    # sanctioned SMJ is the FullOuter over the two bounded count tables
    # inside log_ratio_table.
    assert "SortMergeJoin LeftOuter" not in plan
