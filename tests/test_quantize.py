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
