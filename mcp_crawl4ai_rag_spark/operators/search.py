"""Keyword (BM25) search and hybrid rank fusion.

The reference retrieves by embedding cosine only (match_documents RPC,
src/utils.py:560-586); upstream crawl4ai-rag forks pair that with a keyword
leg and fuse the two. This module provides both legs' missing half as pure
DataFrame compositions: Okapi BM25 over the chunk corpus and reciprocal-rank
fusion (RRF) of any two ranked lists — SURVEY.md retrieval additions.

Scale shape
-----------
- BM25: the per-(doc, term) explode is filtered to QUERY terms before the
  shuffle (array_intersect at the scan), so the aggregate sees |query| rows
  per matching doc, not the whole posting list. Corpus stats (N, avgdl) are
  scalar aggregates; per-term document frequencies are a tiny table joined
  broadcast. Top-k ends in TakeOrderedAndProject.
- At 100 TB the df/avgdl statistics are precomputed once per corpus
  snapshot (:func:`bm25_write_stats`) and served from the persisted index
  via ``bm25_search(..., stats_path=...)``, falling back to computing them
  from the corpus when no index exists.
- RRF is a full-outer join of two small top-k lists — driver-scale inputs,
  never corpus-scale.

Every formula uses ln and 4dp rounding so the DuckDB oracle reproduces the
scores bit-for-bit (both engines use IEEE doubles and natural log).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import words_expr

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_write_stats(
    chunks: DataFrame,
    path: str,
    id_col: str = "chunk_id",
    text_col: str = "content",
    mode: str = "overwrite",
) -> None:
    """Persist the BM25 corpus statistics: ``path/df`` holds the full
    vocabulary's document frequencies, ``path/corpus`` the scalar
    (n_docs, avgdl) row. Computed once per corpus snapshot so the serving
    path never re-aggregates the corpus per query."""
    from .. import local_ckpt

    # tokenized once for BOTH writes: the df and (n_docs, avgdl) outputs
    # each consume `toks`, and without pinning it the second write re-scans
    # and re-tokenizes the whole corpus — a full redundant pass per
    # snapshot at corpus scale. Keep only (id, dl, distinct terms): the
    # text column itself never enters the checkpoint.
    toks = local_ckpt(
        chunks.select(
            F.col(id_col),
            F.array_distinct(words_expr(F.col(text_col))).alias("__t"),
            F.size(words_expr(F.col(text_col))).alias("dl"),
        )
    )
    # (id, term) rows are unique after array_distinct+explode, so a plain
    # count(*) equals countDistinct(id) without the extra dedup aggregate
    toks.select(
        F.col(id_col), F.explode("__t").alias("term")
    ).groupBy("term").agg(
        F.count("*").cast("long").alias("df")
    ).write.mode(mode).parquet(path + "/df")
    toks.select("dl").agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    ).write.mode(mode).parquet(path + "/corpus")


def bm25_search(
    chunks: DataFrame,
    query: str,
    topk: int = 10,
    id_col: str = "chunk_id",
    text_col: str = "content",
    k1: float = BM25_K1,
    b: float = BM25_B,
    stats_path: str | None = None,
) -> DataFrame:
    """(id, score): Okapi BM25 top-k for a whitespace-tokenized query.

    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5));
    score(d) = Σ_t idf·tf·(k1+1)/(tf + k1·(1 - b + b·dl/avgdl)).
    Scores rounded to 4dp; ties broken by id for determinism.

    With ``stats_path`` (written by :func:`bm25_write_stats`) the per-term
    document frequencies and corpus stats come from the persisted index —
    the df read prunes to the query's terms at the parquet scan — instead
    of re-aggregating the corpus per query (the serving-path shape).
    """
    q_terms = sorted(set(query.lower().split()))
    if not q_terms:
        raise ValueError("empty query")
    q_lit = F.array(*[F.lit(t) for t in q_terms])

    toks = chunks.select(
        F.col(id_col),
        words_expr(F.col(text_col)).alias("__w"),
    ).select(
        F.col(id_col),
        F.size("__w").alias("dl"),
        F.array_intersect(
            F.col("__w"), q_lit
        ).alias("__hit_terms"),
        F.col("__w"),
    )

    # per-(doc, query-term) term frequency; explode ONLY matching terms
    tf = (
        toks.where(F.size("__hit_terms") > 0)
        .select(
            F.col(id_col),
            "dl",
            F.explode("__hit_terms").alias("term"),
            "__w",
        )
        .select(
            F.col(id_col),
            "dl",
            "term",
            F.size(F.filter("__w", lambda w: w == F.col("term"))).alias("tf"),
        )
    )

    if stats_path is not None:
        spark = chunks.sparkSession
        stats = spark.read.parquet(stats_path + "/corpus")
        df_t = spark.read.parquet(stats_path + "/df").where(
            F.col("term").isin(q_terms)
        )
    else:
        # corpus stats: one scalar row (N, avgdl) — broadcast by construction
        stats = toks.agg(
            F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
        )
        # document frequency per query term — ≤ |query| rows, broadcast
        df_t = tf.groupBy("term").agg(F.countDistinct(id_col).alias("df"))

    scored = (
        tf.join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.col("avgdl")
                    )
                )
            ).alias("__s"),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("__s"), 4).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(topk)


RRF_K = 60  # the standard reciprocal-rank-fusion damping constant


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    id_col: str = "chunk_id",
    score_col: str = "score",
    topk: int = 10,
    k: int = RRF_K,
) -> DataFrame:
    """(id, rrf_score): reciprocal-rank fusion of two ranked lists
    (e.g. BM25 and embedding-cosine top-k): Σ 1/(k + rank), ranks assigned
    by (score desc, id asc) within each list; absent → no contribution.
    Inputs are top-k lists (driver-scale); the windows run over those tiny
    frames, not the corpus."""
    from pyspark.sql import Window

    def ranked(df: DataFrame, tag: str) -> DataFrame:
        w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        return df.select(
            F.col(id_col), F.row_number().over(w).alias(f"rank_{tag}")
        )

    a = ranked(ranked_a, "a")
    bdf = ranked(ranked_b, "b")
    contrib = (
        a.join(bdf, id_col, "full_outer")
        .select(
            F.col(id_col),
            (
                F.coalesce(
                    F.lit(1.0) / (F.lit(k) + F.col("rank_a")), F.lit(0.0)
                )
                + F.coalesce(
                    F.lit(1.0) / (F.lit(k) + F.col("rank_b")), F.lit(0.0)
                )
            ).alias("__r"),
        )
        .select(F.col(id_col), F.round(F.col("__r"), 6).alias("rrf_score"))
    )
    return contrib.orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    ).limit(topk)
