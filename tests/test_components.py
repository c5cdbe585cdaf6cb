"""Connected components + canonical selection (dedup cluster formation)."""

import random

import pytest
from pyspark.sql import functions as F

from mcp_crawl4ai_rag_spark.operators.components import (
    canonical_docs,
    connected_components,
)


def _cc(spark, edges, vertices=None, **kw):
    e = spark.createDataFrame(edges or [(0, 0)], "id_a long, id_b long")
    if not edges:
        e = e.limit(0)
    v = (
        spark.createDataFrame([(x,) for x in vertices], "doc_id long")
        if vertices is not None
        else None
    )
    out = connected_components(e, v, **kw).collect()
    return {r["doc_id"]: r["component_id"] for r in out}


def test_path_graph_diameter_gt_one(spark):
    # 1-2-3-4-5 chain: min label must propagate 4 hops
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_two_components_and_singleton(spark):
    got = _cc(spark, [(10, 11), (11, 12), (20, 21)], vertices=[10, 11, 12, 20, 21, 99])
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 99: 99}


def test_ring(spark):
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
    assert set(got.values()) == {1}


def test_duplicate_and_reversed_edges(spark):
    got = _cc(spark, [(2, 1), (1, 2), (2, 3), (3, 2)])
    assert got == {1: 1, 2: 1, 3: 1}


def _union_find(n_ids, edges):
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min id per root's component
    comp = {}
    for i in n_ids:
        comp.setdefault(find(i), []).append(i)
    return {i: min(members) for members in comp.values() for i in members}


def test_differential_vs_union_find(spark):
    rng = random.Random(42)
    ids = list(range(200))
    edges = [
        (rng.choice(ids), rng.choice(ids)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    expected = _union_find(ids, edges)
    got = _cc(spark, edges, vertices=ids)
    assert got == expected


def test_canonical_docs(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(6)], "doc_id long, text string"
    )
    comp = spark.createDataFrame(
        # cluster {0,3,5} canonical 0; cluster {1,4} canonical 1; doc 2 isolated
        [(0, 0), (3, 0), (5, 0), (1, 1), (4, 1)],
        "doc_id long, component_id long",
    )
    kept = sorted(
        r["doc_id"] for r in canonical_docs(docs, comp).select("doc_id").collect()
    )
    assert kept == [0, 1, 2]


def test_empty_edges_all_singletons(spark):
    got = _cc(spark, [], vertices=[7, 8])
    assert got == {7: 7, 8: 8}


def test_long_path_pointer_jumping_converges_fast(spark):
    # 0-1-2-...-300 path: hash-min alone extends reach by 1 hop/round, so
    # 12 rounds cannot finish; pointer jumping doubles reach per round
    edges = [(i, i + 1) for i in range(300)]
    got = _cc(spark, edges, max_rounds=12)
    assert set(got.values()) == {0}


def test_long_path_without_acceleration_needs_diameter_rounds(spark):
    edges = [(i, i + 1) for i in range(300)]
    got = _cc(spark, edges, max_rounds=12, accelerate=False)
    assert set(got.values()) != {0}  # provably unconverged at 12 rounds


def test_best_member_keep_quality_rule(spark):
    """Each component keeps exactly its highest-quality member (ties →
    lowest id); isolated vertices keep themselves; partition-invariant."""
    from mcp_crawl4ai_rag_spark.operators.components import (
        best_member_keep,
        connected_components,
    )

    # components: {1,2,3} (chain), {10,11} (tie on quality), {20} isolated
    docs = spark.createDataFrame(
        [
            (1, "a b c"),          # 3 tokens
            (2, "a b c d e"),      # 5 tokens — best of comp 1
            (3, "a"),              # 1 token
            (10, "x y"),           # tie with 11 → lower id wins
            (11, "p q"),
            (20, "solo doc"),
        ],
        "doc_id long, text string",
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    comps = connected_components(edges, vertices=docs.select("doc_id"))
    out = best_member_keep(
        docs, comps, F.size(F.split("text", " ")).cast("long")
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert {i for i, r in rows.items() if r["kept"]} == {2, 10, 20}
    assert rows[1]["component_id"] == rows[2]["component_id"] == rows[3]["component_id"]
    assert rows[10]["quality"] == rows[11]["quality"] == 2

    out7 = best_member_keep(
        docs.repartition(5), comps, F.size(F.split("text", " ")).cast("long")
    )
    assert {r["doc_id"]: r["kept"] for r in out7.collect()} == {
        i: r["kept"] for i, r in rows.items()
    }
