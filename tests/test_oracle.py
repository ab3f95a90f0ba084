"""Every declared query must hash-match its DuckDB oracle at sf0.01 —
the same comparison the driver runs (CORRECTNESS gate)."""

from __future__ import annotations

import pytest

from electrician_spark.queries import REGISTRY
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare, duckdb_conn

_WITH_ORACLE = [n for n, q in REGISTRY.items() if q.oracle is not None]


@pytest.fixture(scope="module")
def duck():
    con = duckdb_conn(SF_ORACLE)
    yield con
    con.close()


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_query_matches_oracle(spark, duck, name):
    qd = REGISTRY[name]
    oracle_pdf = duck.execute(qd.oracle).fetchdf()
    res = compare(name, qd.spark(spark, SF_ORACLE), oracle_pdf)
    assert res.ok, res.detail


def test_driver_window_covers_every_operator_family():
    """The external gate checks only the first 50 REGISTRY entries; pin that
    every operator family (and every query never driver-checked in round 1)
    sits inside that window."""
    first50 = set(list(REGISTRY)[:50])
    required = {
        # round-1 never-checked tail — must stay inside the driver window
        "q_d4_simhash", "q_d5_embedding_near_dup", "q_d7_canonical_docs",
        "q_d8_decontaminate", "q_sm1_stratified_sample", "q_sm2_hash_sample",
        "q_n1_ann_bruteforce", "q_n2_ann_ivf", "q_k1_parquet_roundtrip",
        "q_k2_ndjson_roundtrip", "q_k4_upsert_idempotent",
        "q_r1_resequenced_replay", "q_p1_signal_energy", "q_p2_snr",
        "q_p3_wave_roundtrip", "q_sk1_salted_agg", "q_m1_media_features",
        # one representative per family
        "q_s1_full_scan", "q_t1_revenue_projection", "q_a1_pricing_summary",
        "q_j1_broadcast_inner", "q_o1_global_topk", "q_w1_tumbling_hour",
        "q_wf1_rank", "q_u1_union_all", "q_f1_string", "q_x1_token_stats",
        "q_d1_exact_dedup", "q_d2_ngram_jaccard", "q_d3_minhash_lsh",
        "q_d6_dup_clusters",
    }
    missing = required - first50
    assert not missing, f"driver window misses: {sorted(missing)}"
