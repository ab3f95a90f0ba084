"""Training-objective prep (operators/objectives.py): T5 span
corruption — plain-Python md5 replay equality, determinism, density,
round-trip reconstruction, empty/edge docs — and ChatML rendering —
span offsets exact over the rendered text, mask-role selection,
list_reduce DuckDB replay of the fold."""

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from electrician_spark.operators import objectives as obj


def _h32(seed, did, i, tag):
    key = f"{seed}:{did}:{i}:{tag}"
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16)


def _ref_span_corrupt(did, text, noise=0.15, mean_len=3, seed=0):
    toks = [t for t in text.split() if t]
    n = len(toks)
    p_thr = int(noise / mean_len * (1 << 32))
    width = 2 * mean_len - 1
    starts = [i for i in range(n) if _h32(seed, did, i, "s") < p_thr]
    length = {s: 1 + _h32(seed, did, s, "l") % width for s in starts}
    masked = [
        any(s <= i < s + length[s] for s in starts) for i in range(n)
    ]
    inp, tgt, k = [], [], -1
    for i in range(n):
        if not masked[i]:
            inp.append(toks[i])
        elif i == 0 or not masked[i - 1]:
            k += 1
            inp.append(f"<extra_id_{k}>")
            tgt.append(f"<extra_id_{k}> {toks[i]}")
        else:
            tgt.append(toks[i])
    n_spans = k + 1
    target = " ".join(tgt) + (f" <extra_id_{n_spans}>" if n_spans else "")
    return " ".join(inp), target if n_spans else "", n_spans, sum(masked)


@pytest.fixture(scope="module")
def corpus(spark):
    from electrician_spark.io import read_table
    from tests.conftest import SF_SMOKE

    return read_table(spark, SF_SMOKE, "documents").select("doc_id", "text").limit(80)


def test_span_corrupt_reference_equality(spark, corpus):
    got = {
        r.doc_id: r
        for r in obj.span_corrupt(corpus).select(
            "doc_id", "input_text", "target_text", "n_spans", "n_masked"
        ).collect()
    }
    for r in corpus.collect():
        inp, tgt, n_spans, n_masked = _ref_span_corrupt(r.doc_id, r.text)
        g = got[r.doc_id]
        assert g.input_text == inp, r.doc_id
        assert g.target_text == tgt, r.doc_id
        assert (g.n_spans, g.n_masked) == (n_spans, n_masked), r.doc_id
    # the corpus really exercises the operator
    assert sum(g.n_spans for g in got.values()) > 0


def test_span_corrupt_density_and_determinism(spark, corpus):
    out = obj.span_corrupt(corpus, noise_density=0.15, mean_span_len=3)
    tot = out.select(
        F.sum("n_masked").alias("m"),
        F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("n"),
    ).collect()[0]
    assert 0.08 <= tot.m / tot.n <= 0.25  # ≈ noise_density
    a = {(r.doc_id, r.input_text) for r in out.collect()}
    b = {(r.doc_id, r.input_text) for r in obj.span_corrupt(corpus).collect()}
    assert a == b  # same seed → identical masking
    c = obj.span_corrupt(corpus, seed=1).collect()
    assert {(r.doc_id, r.input_text) for r in c} != a  # new seed reshuffles


def test_span_corrupt_roundtrip_reconstruction(spark, corpus):
    """input + target reassemble the original token stream — the
    property the training objective depends on."""
    for r in obj.span_corrupt(corpus).collect():
        orig = " ".join(r.text.split())
        parts = r.input_text.split()
        fills = {}
        cur = None
        for t in r.target_text.split():
            if t.startswith("<extra_id_"):
                cur = t
                fills[cur] = []
            else:
                fills[cur].append(t)
        rebuilt = []
        for t in parts:
            rebuilt.extend(fills.get(t, [t]) if t.startswith("<extra_id_") else [t])
        assert " ".join(rebuilt) == orig, r.doc_id


def test_span_corrupt_edge_docs(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "one")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in obj.span_corrupt(df).collect()}
    for did in (1, 2):
        assert got[did].input_text == "" and got[did].target_text == ""
        assert got[did].n_spans == 0 and got[did].n_masked == 0
    assert got[3].n_masked in (0, 1)


_MSG_SCHEMA = StructType(
    [
        StructField("conv_id", LongType()),
        StructField(
            "messages",
            ArrayType(
                StructType(
                    [
                        StructField("role", StringType()),
                        StructField("content", StringType()),
                    ]
                )
            ),
        ),
    ]
)

_CONVS = [
    (
        1,
        [
            ("system", "You are terse."),
            ("user", "2+2?"),
            ("assistant", "4"),
            ("user", "and 3+3?"),
            ("assistant", "6, obviously"),
        ],
    ),
    (2, [("user", "hi")]),  # no assistant turn at all
    (3, []),  # empty conversation
]


def test_render_chat_spans_exact(spark):
    df = spark.createDataFrame(_CONVS, _MSG_SCHEMA)
    got = {r.conv_id: r for r in obj.render_chat(df).collect()}
    r = got[1]
    assert r.n_turns == 5 and r.n_loss_turns == 2
    # every loss span slices exactly the assistant content
    contents = [c for role, c in _CONVS[0][1] if role == "assistant"]
    for span, want in zip(r.loss_spans, contents):
        assert r.chat_text[span.start : span.end] == want
    # rendered framing is the ChatML shape
    assert r.chat_text.startswith("<|im_start|>system\nYou are terse.<|im_end|>\n")
    assert r.chat_text.count("<|im_start|>") == 5
    assert got[2].n_loss_turns == 0 and got[2].loss_spans == []
    assert got[3].chat_text == "" and got[3].n_turns == 0


def test_render_chat_mask_roles(spark):
    df = spark.createDataFrame(_CONVS[:1], _MSG_SCHEMA)
    r = obj.render_chat(df, mask_roles=("user", "assistant")).collect()[0]
    assert r.n_loss_turns == 4
    for span in r.loss_spans:
        assert "<|im_" not in r.chat_text[span.start : span.end]


def test_render_chat_duckdb_list_reduce_replay(spark):
    """The fold replays in DuckDB — the precondition for an r8 oracle
    row (list_reduce over the same struct accumulator)."""
    df = spark.createDataFrame(_CONVS[:2], _MSG_SCHEMA)
    got = {r.conv_id: r.chat_text for r in obj.render_chat(df).collect()}
    sql = """
    SELECT conv_id,
           list_reduce(
             list_prepend('', [concat('<|im_start|>', m.role, chr(10),
                                      m.content, '<|im_end|>', chr(10))
                               for m in messages]),
             (a, b) -> a || b) AS chat_text
    FROM conv
    """
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE conv(conv_id BIGINT, "
        "messages STRUCT(role VARCHAR, content VARCHAR)[])"
    )
    for cid, msgs in _CONVS[:2]:
        con.execute(
            "INSERT INTO conv VALUES (?, ?)",
            [cid, [{"role": a, "content": b} for a, b in msgs]],
        )
    for cid, text in con.execute(sql).fetchall():
        assert got[cid] == text, cid


def _ref_fim(did, text, rate=0.5, mode="psm", seed=0):
    if text is None or len(text) == 0:
        return text, False
    if _h32(seed, did, 0, "f") >= int(rate * (1 << 32)):
        return text, False
    n = len(text)
    u1 = _h32(seed, did, 0, "a") % (n + 1)
    u2 = _h32(seed, did, 0, "b") % (n + 1)
    c1, c2 = min(u1, u2), max(u1, u2)
    p, m, s = text[:c1], text[c1:c2], text[c2:]
    if mode == "psm":
        out = f"<|fim_prefix|>{p}<|fim_suffix|>{s}<|fim_middle|>{m}"
    else:
        out = f"<|fim_prefix|><|fim_suffix|>{s}<|fim_middle|>{p}{m}"
    return out, True


@pytest.mark.parametrize("mode", ["psm", "spm"])
def test_fim_reference_equality(spark, corpus, mode):
    got = {
        r["doc_id"]: (r["fim_text"], r["fim_applied"])
        for r in obj.fim_transform(corpus, mode=mode, seed=7).collect()
    }
    src = {r["doc_id"]: r["text"] for r in corpus.collect()}
    assert got.keys() == src.keys()
    applied = 0
    for did, text in src.items():
        want = _ref_fim(str(did), text, mode=mode, seed=7)
        assert got[did] == want, did
        applied += want[1]
    # fim_rate=0.5 over 80 md5-uniform draws: a generous band.
    assert 20 <= applied <= 60


def test_fim_psm_reconstructs_original(spark, corpus):
    out = obj.fim_transform(corpus, mode="psm", seed=3).filter("fim_applied")
    for r in out.collect():
        body = r["fim_text"]
        assert body.startswith("<|fim_prefix|>")
        rest = body[len("<|fim_prefix|>") :]
        p, rest = rest.split("<|fim_suffix|>", 1)
        s, m = rest.split("<|fim_middle|>", 1)
        assert p + m + s == r["text"]


def test_fim_edge_docs_and_mode_validation(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "x")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: (r["fim_text"], r["fim_applied"])
        for r in obj.fim_transform(df, fim_rate=1.0, seed=0).collect()
    }
    assert rows[1] == (None, False)
    assert rows[2] == ("", False)
    assert rows[3][1] is True and "<|fim_middle|>" in rows[3][0]
    with pytest.raises(ValueError):
        obj.fim_transform(df, mode="mps")


def test_fim_duckdb_replay(spark, corpus):
    pdf = corpus.toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    want = con.execute(
        """
        WITH h AS (
          SELECT doc_id, text, length(text) AS n,
            CAST('0x' || substr(md5(concat_ws(':', '7', CAST(doc_id AS VARCHAR), '0', 'f')), 1, 8) AS BIGINT) AS hf,
            CAST('0x' || substr(md5(concat_ws(':', '7', CAST(doc_id AS VARCHAR), '0', 'a')), 1, 8) AS BIGINT) AS ha,
            CAST('0x' || substr(md5(concat_ws(':', '7', CAST(doc_id AS VARCHAR), '0', 'b')), 1, 8) AS BIGINT) AS hb
          FROM docs),
        c AS (
          SELECT doc_id, text, n,
            text IS NOT NULL AND n > 0 AND hf < CAST(0.5 * 4294967296 AS BIGINT) AS sel,
            least(ha % (n + 1), hb % (n + 1)) AS c1,
            greatest(ha % (n + 1), hb % (n + 1)) AS c2
          FROM h)
        SELECT doc_id,
          CASE WHEN sel THEN concat('<|fim_prefix|>', substr(text, 1, c1),
            '<|fim_suffix|>', substr(text, c2 + 1, n - c2),
            '<|fim_middle|>', substr(text, c1 + 1, c2 - c1))
          ELSE text END AS fim_text
        FROM c ORDER BY doc_id
        """
    ).fetchall()
    got = (
        obj.fim_transform(spark.createDataFrame(pdf), mode="psm", seed=7)
        .select("doc_id", "fim_text")
        .orderBy("doc_id")
        .collect()
    )
    assert [(r["doc_id"], r["fim_text"]) for r in got] == want


def test_preference_pairs(spark):
    import duckdb as _dd

    from electrician_spark.operators.objectives import preference_pairs

    rows = [
        ("p1", "bad answer", 0.1),
        ("p1", "great answer", 0.9),
        ("p1", "ok answer", 0.5),
        ("p2", "only answer", 0.7),          # single response → dropped
        ("p3", "tie a", 0.4), ("p3", "tie b", 0.4),  # margin 0, distinct text
        ("p4", "same", 0.2), ("p4", "same", 0.8),    # chosen == rejected → dropped
    ]
    df = spark.createDataFrame(rows, "prompt string, response string, score double")
    got = {r["prompt"]: r.asDict() for r in preference_pairs(df).collect()}
    assert got["p1"]["chosen"] == "great answer"
    assert got["p1"]["rejected"] == "bad answer"
    assert got["p1"]["margin"] == 0.8
    assert "p2" not in got and "p4" not in got
    # margin-0 tie survives min_margin=0 with deterministic ordering
    assert got["p3"]["chosen"] == "tie b" and got["p3"]["rejected"] == "tie a"
    assert not {
        r["prompt"]
        for r in preference_pairs(df, min_margin=0.1).collect()
    } & {"p3"}

    # DuckDB replay over the same (score, response) total ordering
    con = _dd.connect()
    con.register("t", df.toPandas())
    want = con.execute(
        """
        WITH r AS (
          SELECT prompt, response, score,
            row_number() OVER (PARTITION BY prompt
                               ORDER BY score DESC, response DESC) AS rb,
            row_number() OVER (PARTITION BY prompt
                               ORDER BY score ASC, response ASC) AS rw
          FROM t)
        SELECT b.prompt, b.response AS chosen, w.response AS rejected,
               round(b.score - w.score, 6) AS margin
        FROM r b JOIN r w ON b.prompt = w.prompt AND b.rb = 1 AND w.rw = 1
        WHERE b.response <> w.response ORDER BY b.prompt
        """
    ).fetchall()
    got2 = sorted(
        (r["prompt"], r["chosen"], r["rejected"], r["margin"])
        for r in preference_pairs(df).collect()
    )
    assert got2 == sorted(want)
