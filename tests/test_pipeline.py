"""Pipeline facade tests — mirrors the reference's conduit tests
(/root/reference/pkg/internal/conduit/conduit_test.go): the Feedback
pipeline (plug → classify/tag transforms → collect), chained conduits,
fan-in, DLQ divert, and immutability panics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from electrician_spark.functions import scalar as sf
from electrician_spark.pipeline import Conduit, FrozenPipelineError, Pipeline, Wire

FEEDBACK = [
    ("c1", "the delivery was terrible and slow"),
    ("c2", "love the product quality"),
    ("c3", "support was great"),
    ("c4", "just a note"),
]


def _source(spark):
    return spark.createDataFrame(FEEDBACK, "customer_id string, content string")


def test_feedback_pipeline_classify_and_tag(spark):
    """The canonical reference example (conduit_example/chain/main.go):
    negative filter flag + keyword classifier + sentiment tags."""
    classify_wire = (
        Wire("classify")
        .with_column(
            "is_negative",
            sf.contains_any(F.col("content"), ["bad", "terrible", "horrible", "worst"]),
        )
        .with_column(
            "category",
            sf.classify(
                F.col("content"),
                [("delivery", "Delivery"), ("product", "Product Quality"), ("support", "Customer Support")],
            ),
        )
    )
    tag_wire = (
        Wire("tags")
        .with_column("tags", F.array().cast("array<string>"))
        .with_column(
            "tags",
            sf.tag_when(
                F.col("tags"), sf.contains_any(F.col("content"), ["love", "great"]), "positive"
            ),
        )
    )
    rows = (
        Pipeline("feedback")
        .source(_source)
        .wire(classify_wire)
        .wire(tag_wire)
        .collect(spark)
    )
    by_id = {r.customer_id: r for r in rows}
    assert by_id["c1"].is_negative and by_id["c1"].category == "Delivery"
    assert by_id["c2"].category == "Product Quality" and by_id["c2"].tags == ["positive"]
    assert by_id["c3"].tags == ["positive"]
    assert by_id["c4"].category == "General" and by_id["c4"].tags == []


def test_chained_conduits_compose(spark):
    c1 = Conduit(Wire().with_column("x2", F.col("value") * 2))
    c2 = Conduit(Wire().with_column("x4", F.col("x2") * 2))
    chained = c1.then(c2)
    df = spark.createDataFrame([(1,), (2,)], "value int")
    out = {r.value: r.x4 for r in chained.apply(df).collect()}
    assert out == {1: 4, 2: 8}


def test_fan_in_union(spark):
    p = (
        Pipeline("fanin")
        .source_union(
            lambda s: s.createDataFrame([(1,)], "v int"),
            lambda s: s.createDataFrame([(2,)], "v int"),
            lambda s: s.createDataFrame([(3,)], "v int"),
        )
    )
    assert sorted(r.v for r in p.collect(spark)) == [1, 2, 3]


def test_dlq_divert(spark):
    """Error rows leave the main path and reach the DLQ sink (C5/C6)."""
    dlq_rows: list = []
    p = (
        Pipeline("dlq")
        .source(_source)
        .dlq(F.col("content").contains("terrible"), sink=lambda df: dlq_rows.extend(df.collect()))
    )
    good = p.collect(spark)
    assert {r.customer_id for r in good} == {"c2", "c3", "c4"}
    assert [r.customer_id for r in dlq_rows] == ["c1"]


def test_fan_out_sinks(spark):
    a: list = []
    b: list = []
    (
        Pipeline("fanout")
        .source(lambda s: s.createDataFrame([(1,), (2,)], "v int"))
        .sink(lambda df: a.extend(df.collect()))
        .sink(lambda df: b.extend(df.collect()))
        .run(spark)
    )
    assert len(a) == 2 and len(b) == 2


def test_immutability_after_start(spark):
    """Reference: mutation after Start panics (wire/immutability.go:6)."""
    p = Pipeline("frozen").source(lambda s: s.createDataFrame([(1,)], "v int"))
    p.run(spark)
    with pytest.raises(FrozenPipelineError):
        p.filter(F.col("v") > 0)
    w = Wire()
    w.apply(spark.createDataFrame([(1,)], "v int"))
    with pytest.raises(FrozenPipelineError):
        w.with_column("y", F.lit(1))


def test_map_batches_arrow_path(spark):
    """Transformer-factory analog: pandas-batch transform (T7)."""
    def double(pdf):
        pdf = pdf.copy()
        pdf["v"] = pdf["v"] * 2
        return pdf

    rows = (
        Pipeline("arrow")
        .source(lambda s: s.createDataFrame([(1,), (2,)], "v int"))
        .wire(Wire().map_batches(double, "v int"))
        .collect(spark)
    )
    assert sorted(r.v for r in rows) == [2, 4]
