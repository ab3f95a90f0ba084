"""Link-graph centrality (operators/linkgraph.py): plain-Python power
iteration replay equality, rank-mass conservation with dangling
nodes, known-graph ordering, DuckDB chained-CTE replay, and the
domain_authority URL composition."""

import duckdb
import pytest

from electrician_spark.operators import linkgraph as lg


def _ref_pagerank(edges, damping=0.85, iterations=10):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    deg = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    base = (1.0 - damping) / n
    for _ in range(iterations):
        d_mass = sum(rank[v] for v in nodes if v not in deg)
        inflow = {v: 0.0 for v in nodes}
        for u, v in edges:
            inflow[v] += rank[u] / deg[u]
        rank = {
            v: base + damping * (inflow[v] + d_mass / n) for v in nodes
        }
    return {v: round(r, 6) for v, r in rank.items()}


# A graph with a hub (everyone → a), a dangling node (d has no
# out-edges), a 2-cycle, and a duplicate edge (multiplicity counts).
_EDGES = [
    ("b", "a"),
    ("c", "a"),
    ("d0", "a"),
    ("a", "b"),
    ("b", "c"),
    ("c", "b"),
    ("c", "d"),
    ("c", "d"),
]


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(_EDGES, "src string, dst string")


def test_pagerank_reference_equality(spark, edges_df):
    got = {
        r["node"]: r["rank"]
        for r in lg.pagerank(edges_df, iterations=10).collect()
    }
    assert got == _ref_pagerank(_EDGES, iterations=10)


def test_pagerank_mass_conserved_and_hub_wins(spark, edges_df):
    rows = lg.pagerank(edges_df, iterations=20).collect()
    total = sum(r["rank"] for r in rows)
    assert abs(total - 1.0) < 1e-4  # dangling mass redistributed
    ranks = {r["node"]: r["rank"] for r in rows}
    # Ordering matches the plain-Python power iteration ("b" ends on
    # top here: it inherits the hub's entire rank each round); the
    # pure sink ("d") still sits above the teleport floor.
    ref = _ref_pagerank(_EDGES, iterations=20)
    assert sorted(ranks, key=ranks.get) == sorted(ref, key=ref.get)
    n = len(ranks)
    assert ranks["d"] > (1 - 0.85) / n


def test_pagerank_no_edges_and_validation(spark):
    empty = spark.createDataFrame([], "src string, dst string")
    assert lg.pagerank(empty, iterations=2).count() == 0
    with pytest.raises(ValueError):
        lg.pagerank(empty, iterations=0)


def test_pagerank_duckdb_replay(spark, edges_df):
    # 3 iterations as chained CTEs — the closed-form oracle shape an
    # r8 registry row would use.
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e AS SELECT * FROM (VALUES "
        + ", ".join(f"('{u}', '{v}')" for u, v in _EDGES)
        + ") t(src, dst)"
    )
    it_cte = """
    {out} AS (
      SELECT n.node,
        (1 - 0.85) / (SELECT count(*) FROM nodes)
        + 0.85 * (
            coalesce((SELECT sum(r.rank / dg.deg) FROM e
                      JOIN {inp} r ON r.node = e.src
                      JOIN deg dg ON dg.node = e.src
                      WHERE e.dst = n.node), 0)
            + (SELECT coalesce(sum(r.rank), 0) FROM {inp} r
               WHERE r.node NOT IN (SELECT node FROM deg))
              / (SELECT count(*) FROM nodes)
          ) AS rank
      FROM nodes n)
    """
    sql = (
        "WITH nodes AS (SELECT DISTINCT src AS node FROM e "
        "UNION SELECT DISTINCT dst FROM e), "
        "deg AS (SELECT src AS node, count(*) AS deg FROM e GROUP BY src), "
        "r0 AS (SELECT node, 1.0 / (SELECT count(*) FROM nodes) AS rank FROM nodes), "
        + ", ".join(
            it_cte.format(out=f"r{i+1}", inp=f"r{i}") for i in range(3)
        )
        + " SELECT node, round(rank, 6) AS rank FROM r3 ORDER BY node"
    )
    want = dict(con.execute(sql).fetchall())
    got = {
        r["node"]: r["rank"]
        for r in lg.pagerank(edges_df, iterations=3).collect()
    }
    assert got == pytest.approx(want, abs=2e-6)


def test_domain_authority_composition(spark):
    pages = spark.createDataFrame(
        [
            ("https://blog.alpha.com/post/1", "https://www.hub.org/x"),
            ("https://alpha.com/post/2", "https://www.hub.org/y"),
            ("https://beta.co.uk/a", "https://hub.org/z"),
            ("https://hub.org/out", "https://alpha.com/"),
            # self-loop after domain-ification — dropped
            ("https://www.hub.org/a", "https://hub.org/b"),
            # unparsable src — dropped
            ("not a url", "https://alpha.com/"),
        ],
        "url string, href string",
    )
    rows = lg.domain_authority(pages, iterations=5).collect()
    ranks = {r["domain"]: r["rank"] for r in rows}
    assert set(ranks) == {"alpha.com", "beta.co.uk", "hub.org"}
    assert ranks["hub.org"] == max(ranks.values())
    assert abs(sum(ranks.values()) - 1.0) < 1e-4
