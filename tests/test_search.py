"""BM25 keyword search + reciprocal-rank fusion."""

import math

import pytest
from pyspark.sql import functions as F

from mcp_crawl4ai_rag_spark.operators.search import bm25_search, rrf_fuse

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "a quick brown cat sleeps all day"),
    (3, "the dog barks at the quick red fox"),
    (4, "completely unrelated text about spark partitions"),
    (5, "fox fox fox den"),
]


def _py_bm25(query, corpus, k1=1.2, b=0.75):
    docs = {i: t.lower().split() for i, t in corpus}
    n = len(docs)
    avgdl = sum(len(w) for w in docs.values()) / n
    q_terms = sorted(set(query.lower().split()))
    scores = {}
    for t in q_terms:
        df = sum(1 for w in docs.values() if t in w)
        if df == 0:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for i, w in docs.items():
            tf = w.count(t)
            if tf == 0:
                continue
            s = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(w) / avgdl))
            scores[i] = scores.get(i, 0.0) + s
    return {i: round(s, 4) for i, s in scores.items()}


@pytest.fixture(scope="module")
def chunks(spark):
    return spark.createDataFrame(CORPUS, "chunk_id long, content string")


def test_bm25_matches_python_reference(chunks):
    got = {r["chunk_id"]: r["score"] for r in bm25_search(chunks, "quick fox", topk=10).collect()}
    assert got == _py_bm25("quick fox", CORPUS)


def test_bm25_ranking_and_topk(chunks):
    rows = bm25_search(chunks, "fox", topk=2).collect()
    ids = [r["chunk_id"] for r in rows]
    assert len(ids) == 2
    assert ids[0] == 5  # highest tf for 'fox'
    assert rows[0]["score"] > rows[1]["score"]


def test_bm25_no_match_terms_ignored(chunks):
    got = {r["chunk_id"]: r["score"] for r in bm25_search(chunks, "fox zzz", topk=10).collect()}
    assert got == _py_bm25("fox zzz", CORPUS)


def test_bm25_empty_query_raises(chunks):
    with pytest.raises(ValueError):
        bm25_search(chunks, "   ")


def test_rrf_fuse(spark):
    a = spark.createDataFrame(
        [(1, 5.0), (2, 4.0), (3, 3.0)], "chunk_id long, score double"
    )
    b = spark.createDataFrame(
        [(3, 0.9), (4, 0.8)], "chunk_id long, score double"
    )
    rows = rrf_fuse(a, b, topk=4, k=60).collect()
    got = {r["chunk_id"]: r["rrf_score"] for r in rows}
    assert got == {
        1: round(1 / 61, 6),
        2: round(1 / 62, 6),
        3: round(1 / 63 + 1 / 61, 6),
        4: round(1 / 62, 6),
    }
    # doc 3 appears in both lists -> highest fused score
    assert rows[0]["chunk_id"] == 3
    # tie between 2 and 4 (both 1/62) broken by id
    ids = [r["chunk_id"] for r in rows]
    assert ids.index(2) < ids.index(4)


def test_bm25_indexed_equals_on_the_fly(spark, chunks, tmp_path):
    from mcp_crawl4ai_rag_spark.operators.search import bm25_search, bm25_write_stats

    idx = str(tmp_path / "bm25_stats")
    bm25_write_stats(chunks, idx)
    direct = bm25_search(chunks, "quick fox dog", topk=10).collect()
    indexed = bm25_search(chunks, "quick fox dog", topk=10, stats_path=idx).collect()
    assert [(r["chunk_id"], r["score"]) for r in direct] == [
        (r["chunk_id"], r["score"]) for r in indexed
    ]
    # absent query terms neither crash nor contribute
    assert bm25_search(chunks, "zzz", topk=5, stats_path=idx).count() == 0
