"""Similarity search over an ``array<float>`` embedding column.

Covers the reference's vector top-k (pgvector ``ORDER BY embedding <=>
query LIMIT k``, crawled_pages.sql:49-61) plus the scale-path additions:

- :func:`brute_topk` — exact cosine top-k. Spark plans it as
  TakeOrderedAndProject: each partition keeps only its local top-k, the
  driver merges k×partitions rows — no global sort, no full shuffle.
- :func:`lsh_bucket_ann` — random-hyperplane LSH: ±1 hyperplanes (shared
  constants from md5, reproducible in any engine), signature = sign
  pattern of the dot products, search only the query's bucket. At 10^10
  vectors the bucket join prunes the scan by ~2^n_planes.
- :func:`cosine_pairs` — near-duplicate pairs by embedding cosine.

Exact arithmetic notes: all dot products fold left-to-right in float64 via
``F.aggregate`` so the DuckDB oracle (list_sum over list_zip, same order)
reproduces every sum bit-for-bit; similarities are rounded to 4dp at the
output boundary only.

The wide-scan fast path (one BLAS GEMV per Arrow batch) is
functions/vectors.cosine_udf; these builders default to the pure-Catalyst
expression so the whole plan stays in codegen at oracle-testable scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import py_md5int64
from ..functions.vectors import cosine_expr

DEFAULT_LSH_PLANES = 8


def hyperplane(p: int, dim: int) -> list[int]:
    """Deterministic ±1 hyperplane p — shared with the SQL oracle."""
    return [1 if py_md5int64(f"hp{p}:{d}") & 1 else -1 for d in range(dim)]


def _dot_plane(vec_col, plane: list[int]):
    """Σ ±v_d as a left fold in float64 (order-stable across engines)."""
    arr = F.array(*[F.lit(float(x)) for x in plane])
    return F.aggregate(
        F.zip_with(vec_col, arr, lambda v, w: v.cast("double") * w),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def bucket_expr(vec_col, dim: int, n_planes: int = DEFAULT_LSH_PLANES):
    """LSH bucket id in [0, 2^n_planes): bit p = (v · plane_p) > 0."""
    out = F.lit(0)
    for p in range(n_planes):
        out = out + F.when(
            _dot_plane(vec_col, hyperplane(p, dim)) > 0, F.lit(1 << p)
        ).otherwise(F.lit(0))
    return out.cast("int")


def brute_topk(
    embs: DataFrame,
    query_vec: list[float],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k vs a fixed query vector: (id, sim). Deterministic
    tie-break on id. The reference's T1 operator (SURVEY.md §2.5)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        embs.select(
            F.col(id_col),
            F.round(cosine_expr(F.col(vec_col), q), 4).alias("sim"),
        )
        .orderBy(F.desc("sim"), F.col(id_col).asc())
        .limit(k)
    )


def lsh_bucket_ann(
    embs: DataFrame,
    query_vec: list[float],
    k: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = DEFAULT_LSH_PLANES,
) -> DataFrame:
    """Approximate top-k: exact cosine restricted to the query's LSH bucket.

    The bucket column is computable at write time and usable as a partition
    key, turning ANN lookup into partition-pruned scan + local top-k.
    """
    import numpy as np

    qv = np.asarray(query_vec, dtype=np.float64)
    q_bucket = 0
    for p in range(n_planes):
        if float(qv @ np.asarray(hyperplane(p, dim), dtype=np.float64)) > 0:
            q_bucket |= 1 << p

    bucketed = embs.withColumn("__bucket", bucket_expr(F.col(vec_col), dim, n_planes))
    return brute_topk(
        bucketed.where(F.col("__bucket") == q_bucket), query_vec, k, id_col, vec_col
    )


def l2sq_expr(a, b):
    """Squared L2 distance as a left fold in float64 (order-stable)."""
    return F.aggregate(
        F.zip_with(
            a, b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def ivf_assign(
    embs: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid (squared-L2 argmin, ties
    broken by lowest centroid id): (id, vec, cid).

    ``centroids``: (cid, ce) — the codebook, O(K×dim) small by construction,
    collected to the driver and inlined as literals. The argmin is then a
    single per-row projection: an array of K distances + ``array_position``
    of its min — zero shuffle, zero data movement beyond the scan itself
    (the earlier crossJoin+window shape moved N×K full vectors through an
    exchange; at 10^9 vectors × 1024 centroids that plan is dead). At write
    time the assignment becomes a partition column → IVF probe =
    partition-pruned scan of n_probe inverted lists, never a full-corpus
    pass."""
    rows = sorted(
        centroids.select("cid", "ce").collect(), key=lambda r: r["cid"]
    )
    dists = F.array(
        *[
            l2sq_expr(
                F.col(vec_col), F.array(*[F.lit(float(x)) for x in r["ce"]])
            )
            for r in rows
        ]
    )
    cid_arr = F.array(*[F.lit(r["cid"]) for r in rows])
    # cids sorted ascending → array_position's first match IS the lowest-cid
    # tie winner; min compares the exact doubles the array holds.
    idx = F.array_position(dists, F.array_min(dists)).cast("int")
    return embs.select(
        id_col, vec_col, F.element_at(cid_arr, idx).alias("cid")
    )


def ivf_topk(
    embs: DataFrame,
    centroids: DataFrame,
    query_vec: list[float],
    k: int,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: probe the ``n_probe`` centroids nearest the
    query, exact cosine only within their inverted lists. ``centroids`` is
    the trained codebook — deterministic here (tests/oracles pass fixed
    rows); at scale it comes from k-means over a sample."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probe = (
        centroids.withColumn("__d", l2sq_expr(F.col("ce"), q))
        .orderBy(F.col("__d").asc(), F.col("cid").asc())
        .limit(n_probe)
        .select("cid")
    )
    assigned = ivf_assign(embs, centroids, id_col, vec_col)
    survivors = assigned.join(F.broadcast(probe), "cid").select(id_col, vec_col)
    return brute_topk(survivors, query_vec, k, id_col, vec_col)


def cosine_pairs(
    embs: DataFrame,
    min_sim: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_dim: int | None = None,
    n_planes: int = DEFAULT_LSH_PLANES,
) -> DataFrame:
    """(id_a, id_b, sim): embedding near-dup pairs with sim ≥ min_sim.

    With ``block_dim`` set, candidate pairs are BLOCKED on the LSH bucket
    (same algebra as dedup.simhash_pairs banding): only same-bucket pairs
    get an exact cosine — an equi-join instead of a cross join, which is the
    only shape that survives 10^9 vectors. High-sim pairs land in the same
    bucket with prob ≈ (1 - θ/π)^n_planes (θ = angle); exact duplicates
    always do. Without ``block_dim`` it is the exact brute-force cross join.
    """
    a = embs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = embs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    if block_dim is not None:
        bk = bucket_expr(F.col(vec_col), block_dim, n_planes)
        a = embs.select(
            F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), bk.alias("__bk")
        )
        b = embs.select(
            F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), bk.alias("__bk")
        )
        cand = a.join(b, "__bk").where(F.col("id_a") < F.col("id_b")).drop("__bk")
    else:
        cand = a.join(b, F.col("id_a") < F.col("id_b"))
    return cand.select(
        "id_a",
        "id_b",
        F.round(cosine_expr(F.col("va"), F.col("vb")), 4).alias("sim"),
    ).where(F.col("sim") >= min_sim)
