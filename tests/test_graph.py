"""Fixed-point PageRank: differential vs a Python loop."""

from pyspark.sql import functions as F

from mcp_crawl4ai_rag_spark.operators.graph import PR_SCALE, pagerank


def _py_pagerank(n_ids, edges, iters, scale=PR_SCALE):
    from collections import Counter, defaultdict

    deg = Counter(s for s, _ in edges)
    pr = {v: scale for v in n_ids}
    base = (15 * scale) // 100
    for _ in range(iters):
        s = defaultdict(int)
        for a, b in edges:
            s[b] += pr[a] // deg[a]
        pr = {v: base + (85 * s.get(v, 0)) // 100 for v in n_ids}
    return pr


def _run(spark, ids, edges, iters):
    e = spark.createDataFrame(edges, "src long, dst long")
    v = spark.createDataFrame([(i,) for i in ids], "id long")
    return {r["id"]: r["pr"] for r in pagerank(e, v, iters=iters).collect()}


def test_pagerank_matches_python(spark):
    ids = list(range(8))
    edges = [
        (0, 1), (1, 2), (2, 0), (3, 0), (3, 1), (4, 5), (5, 4),
        (6, 0), (6, 0),  # parallel edge: double contribution
        # 7 is dangling (no out-edges) and has no in-edges
    ]
    got = _run(spark, ids, edges, iters=5)
    assert got == _py_pagerank(ids, edges, 5)
    # the 0->1->2 cycle holds the mass (1 gets 0's full rank each round);
    # isolated node 7 sits at the base (1-d) mass
    assert got[1] == max(got.values())
    assert got[7] == (15 * PR_SCALE) // 100


def test_pagerank_ring_uniform(spark):
    # symmetric ring: every node keeps identical rank
    ids = list(range(5))
    edges = [(i, (i + 1) % 5) for i in ids]
    got = _run(spark, ids, edges, iters=4)
    assert len(set(got.values())) == 1


def test_pagerank_formula_graph_matches_python(spark):
    # the synthetic corpus link graph: t_j(i) = (31 i + 7 j + 1) mod n
    n = 200
    ids = list(range(n))
    edges = [(i, (31 * i + 7 * j + 1) % n) for i in ids for j in range(3)]
    got = _run(spark, ids, edges, iters=5)
    assert got == _py_pagerank(ids, edges, 5)
