"""Aesthetic linear head over image embeddings (operators/similarity.py).

The LAION-aesthetic shape: a tiny linear head over image embeddings scores
every image, the corpus keeps rows above a threshold. The training is the
exact-normal-equations probe, so the central contract here is bit-identity
with the pure-Python twin and invariance to partitioning — the properties
the DuckDB oracle leg (caption_alignment 'aesthetic') relies on.
"""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from mcp_crawl4ai_rag_spark.operators.corpus_ops import py_train_linear_probe
from mcp_crawl4ai_rag_spark.operators.similarity import (
    AESTHETIC_DIMS,
    AESTHETIC_SCALE,
    aesthetic_probe,
    aesthetic_scores,
    py_aesthetic_features,
    train_aesthetic_head,
)

N = 120
DIM = 24


def _vecs():
    rng = np.random.default_rng(4242)
    v = rng.standard_normal((N, DIM)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v


def _labels():
    # weakly embedding-correlated 0/1 label: sign of the first component
    # plus a deterministic flip every 7th row (noise the head can't fit)
    v = _vecs()
    return [
        int((v[i, 0] > 0) != (i % 7 == 0))
        for i in range(N)
    ]


@pytest.fixture(scope="module")
def embs(spark):
    v = _vecs()
    y = _labels()
    return spark.createDataFrame(
        [(i, [float(x) for x in v[i]], y[i]) for i in range(N)],
        "vec_id long, embedding array<float>, label int",
    )


def _twin_weights():
    v = _vecs()
    y = _labels()
    rows = [tuple(py_aesthetic_features(v[i])) + (y[i],) for i in range(N)]
    return py_train_linear_probe(rows, AESTHETIC_DIMS)


def test_fixedpoint_features_match_python_twin(embs):
    from mcp_crawl4ai_rag_spark.operators.similarity import (
        aesthetic_feature_expr,
    )

    got = (
        embs.select(
            "vec_id",
            *[
                aesthetic_feature_expr("embedding", i).alias(f"f{i}")
                for i in range(AESTHETIC_DIMS)
            ],
        )
        .orderBy("vec_id")
        .collect()
    )
    v = _vecs()
    for r in got:
        want = py_aesthetic_features(v[r["vec_id"]])
        assert [r[f"f{i}"] for i in range(AESTHETIC_DIMS)] == want


def test_trained_weights_bit_identical_to_twin(embs):
    w = train_aesthetic_head(embs, F.col("label").cast("long"))
    tw = _twin_weights()
    assert w == tw  # exact float equality — rational solve on both sides


def test_training_invariant_to_partitioning(embs):
    w1 = train_aesthetic_head(embs, F.col("label").cast("long"))
    w2 = train_aesthetic_head(
        embs.repartition(7, "vec_id"), F.col("label").cast("long")
    )
    w3 = train_aesthetic_head(embs.coalesce(1), F.col("label").cast("long"))
    assert w1 == w2 == w3


def test_scores_match_twin_fold_and_threshold(embs):
    w = _twin_weights()
    out = {
        r["vec_id"]: (r["score"], r["keep"])
        for r in aesthetic_scores(embs, w, threshold=0.5).collect()
    }
    v = _vecs()
    assert len(out) == N
    for i in range(N):
        feats = py_aesthetic_features(v[i])
        s = w[0]
        for wi, fi in zip(w[1:], feats):
            s += float(fi) * wi
        want = round(s, 4)
        assert math.isclose(out[i][0], want, abs_tol=0.0), (i, out[i][0], want)
        assert out[i][1] == (want >= 0.5)


def test_probe_end_to_end_separates_the_learnable_label(embs):
    out = aesthetic_probe(embs, F.col("label").cast("long")).collect()
    y = _labels()
    # the head must beat chance on its own weak label (it is near-linear)
    acc = sum(1 for r in out if int(r["keep"]) == y[r["vec_id"]]) / N
    assert acc >= 0.75, acc
    # and kept rows score strictly above dropped rows on average
    kept = [r["score"] for r in out if r["keep"]]
    drop = [r["score"] for r in out if not r["keep"]]
    assert kept and drop and min(kept) >= max(
        s for s in drop
    ) - 1e-9  # threshold partitions the rounded scores


def test_scoring_plan_is_zero_shuffle(embs):
    w = _twin_weights()
    plan = (
        aesthetic_scores(embs, w)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
