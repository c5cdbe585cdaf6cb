"""Distributed global rank (operators/ordering.py): equality with the
single-task window on a total order, offset handling, and path equivalence
inside CrawlEngine._assign_seq."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mcp_crawl4ai_rag_spark.operators.ordering import distributed_rank


def _sample(spark, n=5000, parts=16):
    # unordered input with a unique tie-breaker column
    return spark.range(0, n, 1, parts).select(
        (F.col("id") * 2654435761 % 1000).alias("k1"),
        (F.col("id") % 7).alias("k2"),
        F.concat(F.lit("u"), F.col("id")).alias("uid"),
    )


def test_matches_window_rank(spark):
    df = _sample(spark)
    order = ["k1", "k2", "uid"]
    w = Window.orderBy(*[F.col(c).asc() for c in order])
    expected = {
        r["uid"]: r["rk"]
        for r in df.withColumn("rk", F.row_number().over(w) - 1).collect()
    }
    got = {
        r["uid"]: r["rank"]
        for r in distributed_rank(df, order, num_partitions=8).collect()
    }
    assert got == expected


def test_offset_and_stability(spark):
    df = _sample(spark, n=1000, parts=7)
    order = ["k1", "k2", "uid"]
    a = {r["uid"]: r["rank"] for r in distributed_rank(df, order, offset=100).collect()}
    b = {r["uid"]: r["rank"] for r in distributed_rank(df, order, offset=100).collect()}
    assert a == b  # deterministic across runs
    assert min(a.values()) == 100 and max(a.values()) == 100 + 999


def test_assign_seq_paths_agree(spark):
    from mcp_crawl4ai_rag_spark.plans.crawl import CrawlEngine

    eng = CrawlEngine(spark, pages=None)
    disc = spark.range(0, 3000, 1, 8).select(
        F.concat(F.lit("https://h"), (F.col("id") % 5), F.lit(".x/p/"), F.col("id")).alias("canonical_url"),
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
        F.concat(F.lit("h"), (F.col("id") % 5)).alias("host"),
        F.concat(F.lit("/p/"), F.col("id")).alias("path"),
        F.lit(1).alias("depth"),
        F.lit(0).alias("priority"),
        (F.col("id") % 11).alias("__disc_seq"),
        (F.col("id") % 3).alias("__disc_pos"),
    )
    small = {
        r["canonical_url"]: r["seq"]
        for r in eng._assign_seq(disc, 41, n_rows=10).collect()  # window path
    }
    big = {
        r["canonical_url"]: r["seq"]
        for r in eng._assign_seq(disc, 41, n_rows=10**9).collect()  # distributed
    }
    assert small == big


def test_seed_df_paths_agree(spark):
    """smart._seed_df: the >threshold distributed-rank path must produce the
    exact seq the small-batch window path produces (mirrors _assign_seq)."""
    from mcp_crawl4ai_rag_spark.plans.smart import _seed_df

    urls = spark.range(0, 2000, 1, 8).select(
        F.concat(
            F.lit("https://h"), (F.col("id") * 2654435761 % 97),
            F.lit(".x/s/"), F.col("id"),
        ).alias("url")
    )
    small = {r["url"]: r["seq"] for r in _seed_df(spark, urls, n_rows=5).collect()}
    big = {r["url"]: r["seq"] for r in _seed_df(spark, urls, n_rows=10**9).collect()}
    assert small == big
    assert sorted(small.values()) == list(range(2000))


def test_distributed_cumsum_matches_python(spark):
    import random

    from mcp_crawl4ai_rag_spark.operators.ordering import distributed_cumsum

    rng = random.Random(7)
    rows = [(i, rng.randint(0, 50)) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(7)
    got = {
        r["k"]: r["c"]
        for r in distributed_cumsum(df, ["k"], "v", out_col="c", num_partitions=5).collect()
    }
    acc = 0
    for k, v in rows:  # rows already in k order
        assert got[k] == acc, k
        acc += v
