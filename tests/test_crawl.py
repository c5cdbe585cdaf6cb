"""Crawl-engine differential tests vs the Python reference oracle
(SURVEY.md §5.2): identical visited set, identical per-depth fetch sets,
politeness budget enforcement, robots denials, checkpoint/resume identity."""

import pytest
from pyspark.sql import functions as F

from mcp_crawl4ai_rag_spark.plans.crawl import CrawlEngine
from mcp_crawl4ai_rag_spark.sources.corpus import (
    SEED_IDS,
    gen_pages,
    gen_robots,
    gen_seeds,
)
from tests.oracle_crawl import reference_crawl

N = 300
DEPTH = 4


@pytest.fixture(scope="module")
def corpus(spark):
    pages = gen_pages(spark, N, partitions=8).cache()
    pages.count()
    return pages


def test_url_seen_matches_oracle(spark, corpus):
    eng = CrawlEngine(
        spark, corpus, robots=gen_robots(spark), allowed_host_suffix=".example.com"
    )
    res = eng.run(gen_seeds(spark, N), max_depth=DEPTH)
    got = {
        r["canonical_url"]: r["depth"] for r in res.url_seen.collect()
    }
    want, want_fetched = reference_crawl(N, SEED_IDS, DEPTH)
    assert got == want, (
        f"engine={len(got)} oracle={len(want)} "
        f"missing={set(want) - set(got)} extra={set(got) - set(want)}"
    )
    got_fetched = {
        (r["canonical_url"], r["depth"]) for r in res.fetched.collect()
    }
    assert got_fetched == set(want_fetched)


def test_pop_impl_knob_engine_identical(spark, corpus):
    """The engine's pop_impl knob ("twophase" default vs "threshold", the
    stored-frontier/cluster shape) must be a pure physical choice: same
    visited set, same (url, depth, seq) tuples, same lineage counters."""
    seeds = gen_seeds(spark, N)
    robots = gen_robots(spark)
    a = CrawlEngine(
        spark, corpus, robots=robots, allowed_host_suffix=".example.com",
        epoch_seconds=30.0, pop_impl="twophase",
    ).run(seeds, max_depth=3)
    b = CrawlEngine(
        spark, corpus, robots=robots, allowed_host_suffix=".example.com",
        epoch_seconds=30.0, pop_impl="threshold",
    ).run(seeds, max_depth=3)
    sa = {(r["canonical_url"], r["depth"], r["seq"]) for r in a.url_seen.collect()}
    sb = {(r["canonical_url"], r["depth"], r["seq"]) for r in b.url_seen.collect()}
    assert sa == sb
    la = [tuple(r) for r in a.lineage.orderBy("epoch").collect()]
    lb = [tuple(r) for r in b.lineage.orderBy("epoch").collect()]
    assert la == lb
    with pytest.raises(ValueError):
        CrawlEngine(spark, corpus, pop_impl="bogus")


def test_bloom_and_exact_paths_agree(spark, corpus):
    seeds = gen_seeds(spark, N)
    robots = gen_robots(spark)
    a = CrawlEngine(
        spark, corpus, robots=robots, allowed_host_suffix=".example.com", use_bloom=True
    ).run(seeds, max_depth=3)
    b = CrawlEngine(
        spark, corpus, robots=robots, allowed_host_suffix=".example.com", use_bloom=False
    ).run(seeds, max_depth=3)
    sa = {(r["canonical_url"], r["depth"], r["seq"]) for r in a.url_seen.collect()}
    sb = {(r["canonical_url"], r["depth"], r["seq"]) for r in b.url_seen.collect()}
    assert sa == sb


def test_ordering_contract_deterministic(spark, corpus):
    """seq is a total order, stable across runs (SURVEY.md §7.0)."""
    seeds = gen_seeds(spark, N)
    robots = gen_robots(spark)

    def seqs():
        res = CrawlEngine(
            spark, corpus, robots=robots, allowed_host_suffix=".example.com"
        ).run(seeds, max_depth=3)
        rows = res.url_seen.orderBy("seq").collect()
        return [(r["canonical_url"], r["depth"], r["seq"]) for r in rows]

    a, b = seqs(), seqs()
    assert a == b
    seq_vals = [s for _, _, s in a]
    assert len(seq_vals) == len(set(seq_vals)), "seq must be unique"
    # depth is monotone in discovery: a URL's seq grows with depth order
    by_depth = {}
    for u, d, s in a:
        by_depth.setdefault(d, []).append(s)
    for d in sorted(by_depth)[:-1]:
        assert max(by_depth[d]) < min(by_depth[d + 1]), "level-ordered seq"


def test_robots_denials_counted(spark, corpus):
    eng = CrawlEngine(
        spark, corpus, robots=gen_robots(spark), allowed_host_suffix=".example.com"
    )
    res = eng.run(gen_seeds(spark, N), max_depth=DEPTH)
    lineage = res.lineage.agg(F.sum("robots_denials")).collect()[0][0]
    want, _ = reference_crawl(N, SEED_IDS, DEPTH)
    denied_in_oracle = sum(1 for u in want if "/private/" in u)
    assert lineage == denied_in_oracle
    assert lineage > 0, "corpus must exercise robots"


def test_politeness_budget_enforced_and_set_preserved(spark, corpus):
    """With budgets the crawl takes more epochs but converges to the same
    visited membership; per-epoch per-host scheduling respects the budget."""
    seeds = gen_seeds(spark, N)
    robots = gen_robots(spark)
    free = CrawlEngine(
        spark, corpus, robots=robots, allowed_host_suffix=".example.com"
    ).run(seeds, max_depth=3)
    polite = CrawlEngine(
        spark,
        corpus,
        robots=robots,
        allowed_host_suffix=".example.com",
        epoch_seconds=10.0,  # delay 2.0 default → budget 5/host/epoch
    ).run(seeds, max_depth=3, politeness=True, max_epochs=40)

    free_set = {r["canonical_url"] for r in free.url_seen.collect()}
    polite_set = {r["canonical_url"] for r in polite.url_seen.collect()}
    assert free_set == polite_set

    per_epoch_host = (
        polite.url_seen.groupBy("epoch_seen", "host")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert per_epoch_host <= 15  # budget * backoff headroom (h1 crawl_delay)
    deferrals = polite.lineage.agg(F.sum("politeness_deferrals")).collect()[0][0]
    assert deferrals > 0
    assert polite.epochs_run > free.epochs_run


def test_checkpoint_resume_bit_identical(spark, corpus, tmp_path):
    seeds = gen_seeds(spark, N)
    robots = gen_robots(spark)
    full = CrawlEngine(
        spark, corpus, robots=robots, allowed_host_suffix=".example.com",
        checkpoint_dir=str(tmp_path / "full"),
    ).run(seeds, max_depth=DEPTH)

    # interrupted run: stop after 2 epochs ("kill"), then resume
    part_dir = str(tmp_path / "part")
    CrawlEngine(
        spark, corpus, robots=robots, allowed_host_suffix=".example.com",
        checkpoint_dir=part_dir,
    ).run(seeds, max_depth=DEPTH, max_epochs=2)
    resumed = CrawlEngine(
        spark, corpus, robots=robots, allowed_host_suffix=".example.com",
        checkpoint_dir=part_dir,
    ).resume(max_epochs=DEPTH)

    def key(df):
        return sorted(
            (r["canonical_url"], r["depth"], r["seq"], r["epoch_seen"])
            for r in df.collect()
        )

    assert key(full.url_seen) == key(resumed.url_seen)
    f1 = sorted((r["canonical_url"], r["epoch"]) for r in full.fetched.collect())
    f2 = sorted((r["canonical_url"], r["epoch"]) for r in resumed.fetched.collect())
    assert f1 == f2


def test_lineage_schema_and_counts(spark, corpus):
    res = CrawlEngine(
        spark, corpus, robots=gen_robots(spark), allowed_host_suffix=".example.com"
    ).run(gen_seeds(spark, N), max_depth=3)
    rows = res.lineage.orderBy("epoch").collect()
    assert [r["epoch"] for r in rows] == list(range(res.epochs_run))
    total_sched = sum(r["urls_scheduled"] for r in rows)
    assert total_sched == res.url_seen.count()


def test_observed_fetch_metrics_match_lineage(spark, corpus):
    """D6: the Observation on the fetch stage must agree with the lineage
    counters — fetch_succeeded == pages_fetched and fetch_attempted ==
    urls_scheduled - robots_denials, every epoch."""
    eng = CrawlEngine(
        spark, corpus, robots=gen_robots(spark), allowed_host_suffix=".example.com"
    )
    res = eng.run(gen_seeds(spark, N), max_depth=DEPTH)
    lin = {r["epoch"]: r for r in res.lineage.collect()}
    obs = res.stats["observed_fetch"]
    assert set(obs) == set(lin) and len(obs) == res.epochs_run
    for ep, m in obs.items():
        assert m["fetch_succeeded"] == lin[ep]["pages_fetched"]
        assert (
            m["fetch_attempted"]
            == lin[ep]["urls_scheduled"] - lin[ep]["robots_denials"]
        )


def test_crawl_report_shape(spark, corpus):
    """C6/T3/A5: JSON report — preview capped at 5 + '...', success rate."""
    import json

    from mcp_crawl4ai_rag_spark.plans.crawl import crawl_report

    eng = CrawlEngine(
        spark, corpus, robots=gen_robots(spark), allowed_host_suffix=".example.com"
    )
    res = eng.run(gen_seeds(spark, N), max_depth=DEPTH)
    n_fetched = res.fetched.count()
    rep = json.loads(
        crawl_report(
            "https://h0.example.com/", "webpage", res.fetched, 100, 97,
            storage_errors=3, failed_batches=1, total_batches=11,
        ).collect()[0]["report"]
    )
    assert rep["success"] is True and rep["pages_crawled"] == n_fetched
    assert rep["urls_crawled"][-1] == "..." and len(rep["urls_crawled"]) == 6
    first5 = [
        r["canonical_url"]
        for r in res.fetched.orderBy("depth", "seq").limit(5).collect()
    ]
    assert rep["urls_crawled"][:5] == first5
    assert rep["partial_failures"]["success_rate"] == "97.0%"


def test_attach_budgets_equals_compute_budgets_path(spark, corpus):
    """The zero-shuffle per-row budget attach must pop the exact same
    (popped, deferred) split as the distinct-hosts compute_budgets path."""
    from pyspark.sql import functions as F

    from mcp_crawl4ai_rag_spark.operators.politeness import (
        attach_budgets,
        compute_budgets,
        pop_per_host,
    )

    frontier = spark.range(0, 4000, 1, 8).select(
        F.concat(F.lit("https://h"), (F.col("id") % 7), F.lit(".x/p/"), F.col("id")).alias("canonical_url"),
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
        F.concat(F.lit("h"), (F.col("id") % 7), F.lit(".x")).alias("host"),
        F.concat(F.lit("/p/"), F.col("id")).alias("path"),
        (F.col("id") % 3).cast("int").alias("depth"),
        F.lit(0).alias("priority"),
        F.col("id").alias("seq"),
    )
    robots = spark.createDataFrame(
        [(f"h{h}.x", [], float(1 + h)) for h in range(5)],
        "host string, disallow_prefixes array<string>, crawl_delay double",
    )
    backoff = spark.createDataFrame(
        [(f"h{h}.x", h % 3) for h in range(7)],
        "host string, backoff_level int",
    )
    budgets = compute_budgets(frontier, robots, backoff, epoch_seconds=300.0)
    p_old, d_old = pop_per_host(frontier, budgets)
    with_b = attach_budgets(frontier, robots, backoff, epoch_seconds=300.0)
    p_new, d_new = pop_per_host(with_b, None)
    assert sorted(p_new.columns) == sorted(p_old.columns)
    key = lambda df: sorted(r["canonical_url"] for r in df.collect())
    assert key(p_new) == key(p_old)
    assert key(d_new) == key(d_old)


def test_pop_per_host_matches_python_reference(spark):
    """Salted two-phase pop vs a plain-Python per-host top-B reference over
    randomized frontiers: identical popped sets, exact budget enforcement,
    nothing lost."""
    import random

    from mcp_crawl4ai_rag_spark.operators.politeness import pop_per_host

    for seed in (1, 7, 42):
        rng = random.Random(seed)
        rows = []
        for i in range(800):
            host = f"h{rng.randint(0, 9)}.x"
            rows.append(
                (f"https://{host}/p/{i}", rng.getrandbits(62), host,
                 f"/p/{i}", rng.randint(0, 3), rng.randint(0, 1), i)
            )
        budgets = [(f"h{h}.x", rng.randint(1, 40)) for h in range(8)]  # h8,h9 unlimited
        fr = spark.createDataFrame(
            rows,
            "canonical_url string, url_hash long, host string, path string, "
            "depth int, priority int, seq long",
        ).repartition(7)
        bd = spark.createDataFrame(budgets, "host string, budget int")
        popped, deferred = pop_per_host(fr, bd, salt_lanes=4)
        got_p = {r["canonical_url"] for r in popped.collect()}
        got_d = {r["canonical_url"] for r in deferred.collect()}
        assert got_p | got_d == {r[0] for r in rows} and not (got_p & got_d)

        bmap = dict(budgets)
        by_host: dict = {}
        for r in rows:
            by_host.setdefault(r[2], []).append(r)
        want_p = set()
        for host, hrows in by_host.items():
            hrows.sort(key=lambda r: (r[4], r[5], r[6]))
            b = bmap.get(host)
            want_p |= {r[0] for r in (hrows if b is None else hrows[:b])}
        assert got_p == want_p, f"seed {seed}"


def test_pop_threshold_equals_two_phase(spark):
    """pop_per_host_threshold (zero-wide-shuffle broadcast-threshold pop)
    must produce the exact (popped, deferred) split of pop_per_host on
    randomized skewed frontiers with unique order tuples — including
    unlimited hosts (budget NULL) and a degenerate budget-0 host."""
    import random

    from mcp_crawl4ai_rag_spark.operators.politeness import (
        pop_per_host,
        pop_per_host_threshold,
    )

    for seed in (3, 11):
        rng = random.Random(seed)
        rows = []
        for i in range(900):
            # h0 is hot (~40% of rows) to exercise the salted lanes
            host = "h0.x" if rng.random() < 0.4 else f"h{rng.randint(1, 9)}.x"
            rows.append(
                (f"https://{host}/p/{i}", rng.getrandbits(62), host,
                 f"/p/{i}", rng.randint(0, 3), rng.randint(0, 1), i)
            )
        budgets = [(f"h{h}.x", rng.randint(1, 40)) for h in range(7)]
        budgets.append(("h7.x", 0))  # degenerate: defers everything
        fr = spark.createDataFrame(
            rows,
            "canonical_url string, url_hash long, host string, path string, "
            "depth int, priority int, seq long",
        ).repartition(7)
        bd = spark.createDataFrame(budgets, "host string, budget int")
        p_a, d_a = pop_per_host(fr, bd, salt_lanes=4)
        p_b, d_b = pop_per_host_threshold(fr, bd, salt_lanes=4)
        assert sorted(p_b.columns) == sorted(p_a.columns)
        key = lambda df: sorted(r["canonical_url"] for r in df.collect())
        assert key(p_b) == key(p_a), f"seed {seed}"
        assert key(d_b) == key(d_a), f"seed {seed}"
        # nothing lost or duplicated across the split
        assert sorted(key(p_b) + key(d_b)) == sorted(r[0] for r in rows)


def test_pop_threshold_attach_budgets_path(spark):
    """Threshold pop over the attach_budgets (budget-column) input shape,
    pinned against the two-phase pop on the same input."""
    from pyspark.sql import functions as F

    from mcp_crawl4ai_rag_spark.operators.politeness import (
        attach_budgets,
        pop_per_host,
        pop_per_host_threshold,
    )

    frontier = spark.range(0, 3000, 1, 8).select(
        F.concat(F.lit("https://h"), (F.col("id") % 5), F.lit(".x/p/"), F.col("id")).alias("canonical_url"),
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
        F.concat(F.lit("h"), (F.col("id") % 5), F.lit(".x")).alias("host"),
        F.concat(F.lit("/p/"), F.col("id")).alias("path"),
        (F.col("id") % 3).cast("int").alias("depth"),
        F.lit(0).alias("priority"),
        F.col("id").alias("seq"),
    )
    robots = spark.createDataFrame(
        [(f"h{h}.x", [], float(1 + h)) for h in range(4)],
        "host string, disallow_prefixes array<string>, crawl_delay double",
    )
    with_b = attach_budgets(frontier, robots, None, epoch_seconds=200.0)
    p_a, d_a = pop_per_host(with_b, None)
    p_b, d_b = pop_per_host_threshold(with_b, None)
    key = lambda df: sorted(r["canonical_url"] for r in df.collect())
    assert key(p_b) == key(p_a)
    assert key(d_b) == key(d_a)


def test_checkpoint_resume_politeness_bit_identical(spark, corpus, tmp_path):
    """Kill/resume under politeness budgets + backoff: the resumed run must
    reproduce the uninterrupted schedule exactly, including which epoch each
    URL was popped in (backoff levels are part of the persisted state)."""
    seeds = gen_seeds(spark, N)
    robots = gen_robots(spark)
    # budget = floor(6/2) = 3 per host per epoch → deferrals are guaranteed,
    # so the resume must reproduce a genuinely multi-epoch drain schedule
    kw = dict(
        robots=robots, allowed_host_suffix=".example.com", epoch_seconds=6.0
    )
    full = CrawlEngine(
        spark, corpus, checkpoint_dir=str(tmp_path / "pf"), **kw
    ).run(seeds, max_depth=DEPTH, politeness=True, max_epochs=6)

    part_dir = str(tmp_path / "pp")
    CrawlEngine(spark, corpus, checkpoint_dir=part_dir, **kw).run(
        seeds, max_depth=DEPTH, politeness=True, max_epochs=2
    )
    resumed = CrawlEngine(spark, corpus, checkpoint_dir=part_dir, **kw).resume(
        max_epochs=6
    )

    def key(df):
        return sorted(
            (r["canonical_url"], r["depth"], r["seq"], r["epoch_seen"])
            for r in df.collect()
        )

    assert full.epochs_run == resumed.epochs_run
    assert full.lineage.where(F.col("politeness_deferrals") > 0).count() > 0
    assert key(full.url_seen) == key(resumed.url_seen)
    f1 = sorted((r["canonical_url"], r["epoch"]) for r in full.fetched.collect())
    f2 = sorted((r["canonical_url"], r["epoch"]) for r in resumed.fetched.collect())
    assert f1 == f2
    l1 = sorted(tuple(r) for r in full.lineage.collect())
    l2 = sorted(tuple(r) for r in resumed.lineage.collect())
    assert l1 == l2


def test_crawl_e2e_gate_pop_respects_pagerank_budgets(spark):
    """crawl_e2e composition gate (__spark_entry__.q_crawl_e2e): the popped
    set must be, per host, exactly the budget-sized head of the FRESH
    (non-seen) URLs ordered by (pagerank desc, id) — i.e. the PageRank
    priorities survive the bloom+anti-join dedup into the pop ordering."""
    import __spark_entry__ as E

    sf_dir = "/root/testdata/sf0.001"
    popped = E.q_crawl_e2e(spark, sf_dir).collect()

    # independent expectation: pagerank ranks + closed-form host/seen layout
    pr = {r["id"]: r["pr"] for r in E._pagerank_link_df(spark, sf_dir).collect()}
    n = len(pr)
    from mcp_crawl4ai_rag_spark.sources import corpus as C

    by_host: dict[int, list[tuple[int, int]]] = {}
    for i in range(n):
        if i % 3 == 0:  # seen
            continue
        h = 0 if i % C.HOT_HOST_MOD == 0 else i % C.N_HOSTS
        by_host.setdefault(h, []).append((-pr[i], i))
    expected = set()
    for h, rows in by_host.items():
        for negpr, i in sorted(rows)[:15]:  # budget floor(30/2.0)=15
            path = "/private/p/" if i % C.PRIVATE_MOD == 0 else "/p/"
            expected.add((f"https://h{h}.example.com{path}{i}", pr[i]))
    got = {(r["canonical_url"], r["pr"]) for r in popped}
    assert got == expected


def test_incremental_recrawl_composition(spark, corpus):
    """Crawl → fingerprint index → recrawl with change detection: only the
    docs whose content changed between crawls reach the re-chunk/re-embed
    stage, and advancing the index converges to all-unchanged. This is the
    end-to-end contract behind plans/rag.doc_change_status — a recrawl at
    corpus scale must not re-embed unchanged pages."""
    from mcp_crawl4ai_rag_spark.plans.rag import (
        doc_change_status,
        update_fingerprint_index,
    )

    eng = CrawlEngine(
        spark, corpus, robots=gen_robots(spark), allowed_host_suffix=".example.com"
    )
    res = eng.run(gen_seeds(spark, N), max_depth=2)
    docs = res.fetched.select(F.col("canonical_url").alias("url"), "markdown")
    n_docs = docs.count()
    assert n_docs > 10

    fps = docs.select("url", F.md5("markdown").alias("fp"))
    idx = update_fingerprint_index(None, fps)

    # second crawl of the same frontier: ~1/3 of pages changed content
    refetch = docs.withColumn(
        "markdown",
        F.when(
            F.xxhash64("url") % 3 == 0,
            F.concat(F.col("markdown"), F.lit(" UPDATED")),
        ).otherwise(F.col("markdown")),
    )
    new_fps = refetch.select("url", F.md5("markdown").alias("fp"))
    status = doc_change_status(idx, new_fps)
    counts = {
        r["change_kind"]: r["n"]
        for r in status.groupBy("change_kind").agg(F.count("*").alias("n")).collect()
    }
    assert set(counts) == {"changed", "unchanged"}  # same URL set → nothing "new"
    assert counts["changed"] + counts["unchanged"] == n_docs
    # the planted change rate is ~1/3 — the gate must pass only those through
    changed = refetch.join(
        status.where(F.col("change_kind") != "unchanged").select("url"),
        "url",
        "left_semi",
    )
    assert changed.count() == counts["changed"] < n_docs

    # advancing the index and re-detecting the same fetch → all unchanged
    idx2 = update_fingerprint_index(idx, new_fps)
    assert {
        r["change_kind"] for r in doc_change_status(idx2, new_fps).collect()
    } == {"unchanged"}


def test_recrawl_schedule_drives_pop_order(spark):
    """Freshness policy → frontier priority → politeness pop: with one
    host and budget B, the popped set is exactly the B most-stale-volatile
    URLs by recrawl_schedule's milli-priority (ties on seq)."""
    from mcp_crawl4ai_rag_spark.operators.politeness import pop_per_host
    from mcp_crawl4ai_rag_spark.plans.rag import recrawl_schedule
    from mcp_crawl4ai_rag_spark.functions.urls import url_hash

    rows = []
    for u in range(30):
        # u%3 volatility classes; last crawl at seq u%4+1
        for seq in range(1, (u % 4) + 2):
            rows.append((f"https://h.example.com/p/{u}", seq,
                         "changed" if (u + seq) % 3 == 0 else "unchanged"))
    log = spark.createDataFrame(
        rows, "url string, crawl_seq int, change_kind string"
    )
    sched = recrawl_schedule(log, now_seq=9)
    frontier = sched.select(
        F.col("url").alias("canonical_url"),
        url_hash(F.col("url")).alias("url_hash"),
        F.lit("h.example.com").alias("host"),
        F.lit(0).alias("depth"),
        (-F.col("prio_milli")).alias("priority"),
        F.regexp_extract("url", r"/p/(\d+)$", 1).cast("long").alias("seq"),
        "prio_milli",
    )
    budgets = spark.createDataFrame([("h.example.com", 8)], "host string, budget int")
    popped, deferred = pop_per_host(frontier, budgets)
    got = {r["canonical_url"] for r in popped.collect()}

    want_rank = sorted(
        [(r["prio_milli"], r["seq"], r["canonical_url"]) for r in frontier.collect()],
        key=lambda t: (-t[0], t[1]),
    )[:8]
    assert got == {u for _, _, u in want_rank}
    assert popped.count() + deferred.count() == 30


def test_host_quality_prior_exact_integer_mean_and_pop_order(spark):
    """The quality prior is an exact integer per-host mean, and feeding it
    through apply_host_prior reorders the politeness pop: the high-quality
    host's URLs pop before the low-quality host's at a shared budget."""
    from pyspark.sql import functions as F

    from mcp_crawl4ai_rag_spark.operators.politeness import (
        apply_host_prior,
        attach_budgets,
        host_quality_prior,
        pop_per_host,
    )

    docs = spark.createDataFrame(
        [("good.example.com", 0.91), ("good.example.com", 0.93),
         ("bad.example.com", 0.12), ("bad.example.com", 0.10),
         ("bad.example.com", 0.14)],
        "host string, quality double",
    )
    prior = {r["host"]: r for r in host_quality_prior(docs).collect()}
    # exact fixed-point means: (9100+9300) DIV 2, (1200+1000+1400) DIV 3
    assert prior["good.example.com"]["mean_q4"] == 9200
    assert prior["bad.example.com"]["mean_q4"] == 1200
    assert prior["good.example.com"]["prio"] == -9200
    assert prior["bad.example.com"]["prio"] == -1200
    assert prior["good.example.com"]["n_docs"] == 2

    frontier = spark.createDataFrame(
        [
            (f"https://{h}/p/{i}", i * 131 + len(h), h, f"/p/{i}", 1, 0, i)
            for h in ("good.example.com", "bad.example.com", "new.example.com")
            for i in range(4)
        ],
        "canonical_url string, url_hash long, host string, path string, "
        "depth int, priority int, seq long",
    )
    prio_df = host_quality_prior(docs)
    adjusted = apply_host_prior(frontier, prio_df)
    got = {
        r["host"]: r["priority"]
        for r in adjusted.select("host", "priority").distinct().collect()
    }
    # unknown host keeps its base priority
    assert got == {
        "good.example.com": -9200,
        "bad.example.com": -1200,
        "new.example.com": 0,
    }
    # the pop respects the prior through the normal (depth, priority) order:
    # with a global budget of 2 per host, all hosts still pop 2 URLs, but a
    # priority-threshold pop (top-k overall) would take good first — assert
    # the ordering contract directly on the pop's rank columns instead
    budgeted = attach_budgets(adjusted, None, None, epoch_seconds=4.0)
    popped, deferred = pop_per_host(budgeted, None)
    # budget 2/host at the default midpoint delay: 2 popped per host
    per_host = {
        r["host"]: r["n"]
        for r in popped.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    assert per_host == {h: 2 for h in got}
    # within the whole popped set, good's rows carry the lowest priority —
    # a priority-ordered frontier drain consumes them first
    rows = popped.select("host", "priority").collect()
    best = min(r["priority"] for r in rows)
    assert all(
        r["priority"] == best for r in rows if r["host"] == "good.example.com"
    )


def test_max_pages_truncates_in_crawl_order(spark, corpus):
    """max_pages (crawl4ai's deep-crawl page budget) caps the visited set at
    exactly the first M rows of the UNCAPPED run's schedule order
    (epoch_seen asc, then depth/priority/seq within the truncated epoch),
    and earlier epochs are bit-identical."""
    seeds = gen_seeds(spark, N)
    robots = gen_robots(spark)

    def eng():
        return CrawlEngine(
            spark, corpus, robots=robots, allowed_host_suffix=".example.com"
        )

    full = eng().run(seeds, max_depth=DEPTH)
    rows = full.url_seen.select(
        "canonical_url", "depth", "seq", "epoch_seen"
    ).collect()
    order = sorted(rows, key=lambda r: (r["epoch_seen"], r["depth"], r["seq"]))
    total = len(order)
    # pick an M that cuts mid-epoch: strictly inside the last epoch's batch
    last_epoch = order[-1]["epoch_seen"]
    first_of_last = next(
        i for i, r in enumerate(order) if r["epoch_seen"] == last_epoch
    )
    m = first_of_last + max(1, (total - first_of_last) // 2)
    assert first_of_last < m < total, "cap must bite mid-epoch"

    capped = eng().run(seeds, max_depth=DEPTH, max_pages=m)
    got = {
        (r["canonical_url"], r["depth"], r["seq"], r["epoch_seen"])
        for r in capped.url_seen.collect()
    }
    want = {
        (r["canonical_url"], r["depth"], r["seq"], r["epoch_seen"])
        for r in order[:m]
    }
    assert got == want
    # budget accounting: scheduled totals M, leftovers become deferrals
    lin = capped.lineage.orderBy("epoch").collect()
    assert sum(r["urls_scheduled"] for r in lin) == m
    # truncated-epoch deferrals = the whole uncapped batch minus the budget
    # remainder (no politeness in this run, so cap deferrals are all of them)
    assert lin[-1]["politeness_deferrals"] == total - m
    # the squeezed-out URLs stay poppable: frontier_remaining ⊇ leftovers
    leftover_urls = {r["canonical_url"] for r in order[m:]}
    frontier_urls = {
        r["canonical_url"] for r in capped.frontier_remaining.collect()
    }
    assert leftover_urls <= frontier_urls


def test_max_pages_level_boundary_and_zero_remaining(spark, corpus):
    """A cap at an exact level boundary equals truncating whole levels, and
    a later run epoch never starts once the budget is exhausted."""
    seeds = gen_seeds(spark, N)
    full = CrawlEngine(
        spark, corpus, robots=gen_robots(spark),
        allowed_host_suffix=".example.com",
    ).run(seeds, max_depth=DEPTH)
    by_epoch = sorted(
        full.url_seen.groupBy("epoch_seen").count().collect(),
        key=lambda r: r["epoch_seen"],
    )
    m = by_epoch[0]["count"] + by_epoch[1]["count"]  # exactly 2 levels
    capped = CrawlEngine(
        spark, corpus, robots=gen_robots(spark),
        allowed_host_suffix=".example.com",
    ).run(seeds, max_depth=DEPTH, max_pages=m)
    assert capped.url_seen.count() == m
    assert capped.url_seen.agg(F.max("epoch_seen")).head()[0] == 1
    assert capped.epochs_run == 2


def test_url_scorer_hook_best_first_scheduling(spark, corpus):
    """The engine's url_scorer hook scores every DISCOVERED URL into the
    frontier's priority, and a max_pages cut then prefers high-scoring
    (low-priority) URLs within the truncated epoch — the crawl4ai
    best-first strategy end-to-end."""
    from mcp_crawl4ai_rag_spark.functions.urls import (
        best_first_priority,
        py_keyword_relevance_milli,
    )

    kws = ["private", "p/1"]
    seeds = gen_seeds(spark, N)

    def eng():
        return CrawlEngine(
            spark, corpus, robots=gen_robots(spark),
            allowed_host_suffix=".example.com",
            url_scorer=lambda u: best_first_priority(u, kws),
        )

    full = eng().run(seeds, max_depth=3)
    # url_seen drops the priority column; the scorer is a deterministic
    # function of the URL, so reconstruct each discovered row's priority
    # via the twin (seeds keep their caller priority, 0 in gen_seeds)
    def prio(r):
        return (
            -py_keyword_relevance_milli(r["canonical_url"], kws)
            if r["depth"] > 0
            else 0
        )

    order = sorted(
        full.url_seen.select(
            "canonical_url", "depth", "seq", "epoch_seen"
        ).collect(),
        key=lambda r: (r["epoch_seen"], r["depth"], prio(r), r["seq"]),
    )
    # non-vacuity: the scorer must actually differentiate discovered URLs
    assert len({prio(r) for r in order if r["depth"] > 0}) > 1
    last_epoch = order[-1]["epoch_seen"]
    first_of_last = next(
        i for i, r in enumerate(order) if r["epoch_seen"] == last_epoch
    )
    m = first_of_last + max(1, (len(order) - first_of_last) // 3)
    capped = eng().run(seeds, max_depth=3, max_pages=m)
    got = {r["canonical_url"] for r in capped.url_seen.collect()}
    want = {r["canonical_url"] for r in order[:m]}
    assert got == want


def test_max_pages_per_host_quota(spark, corpus, tmp_path):
    """Domain quota: no host exceeds its cap, quota'd pops take each
    host's schedule-order prefix, the run ends at the first no-progress
    epoch, and a kill/resume under quota is bit-identical."""
    seeds = gen_seeds(spark, N)
    robots = gen_robots(spark)
    q = 5
    full = CrawlEngine(
        spark, corpus, robots=robots, allowed_host_suffix=".example.com",
        checkpoint_dir=str(tmp_path / "qf"),
    ).run(seeds, max_depth=DEPTH, max_pages_per_host=q)
    rows = full.url_seen.collect()
    per_host = {}
    for r in rows:
        per_host.setdefault(r["host"], []).append(r)
    assert max(len(v) for v in per_host.values()) <= q
    # vs the unlimited run: each host's quota'd set is a PREFIX of its
    # unlimited schedule order (epoch, depth, seq) — the quota never
    # reorders, only truncates
    unlimited = CrawlEngine(
        spark, corpus, robots=robots, allowed_host_suffix=".example.com"
    ).run(seeds, max_depth=DEPTH)
    un_rows = {}
    for r in unlimited.url_seen.collect():
        un_rows.setdefault(r["host"], []).append(r)
    for host, got in per_host.items():
        got_set = {x["canonical_url"] for x in got}
        order = sorted(
            un_rows.get(host, []),
            key=lambda x: (x["epoch_seen"], x["depth"], x["seq"]),
        )
        # every quota'd pop is a URL the unlimited run also scheduled for
        # this host (the quota truncates the same schedule, never invents)
        assert got_set <= {x["canonical_url"] for x in order}, host

    # kill/resume identity under quota
    part = str(tmp_path / "qp")
    CrawlEngine(
        spark, corpus, robots=robots, allowed_host_suffix=".example.com",
        checkpoint_dir=part,
    ).run(seeds, max_depth=DEPTH, max_pages_per_host=q, max_epochs=2)
    resumed = CrawlEngine(
        spark, corpus, robots=robots, allowed_host_suffix=".example.com",
        checkpoint_dir=part,
    ).resume(max_epochs=DEPTH)
    def key(df):
        return sorted(
            (r["canonical_url"], r["depth"], r["seq"], r["epoch_seen"])
            for r in df.collect()
        )
    assert key(full.url_seen) == key(resumed.url_seen)


def test_host_quota_no_progress_terminates_early(spark, corpus):
    """A frontier whose every host is quota-blocked must end the run at
    the first zero-pop epoch, not spin to max_epochs."""
    seeds = gen_seeds(spark, N)
    res = CrawlEngine(
        spark, corpus, robots=gen_robots(spark),
        allowed_host_suffix=".example.com", epoch_seconds=10.0,
    ).run(
        seeds, max_depth=3, politeness=True, max_epochs=40,
        max_pages_per_host=2,
    )
    assert res.url_seen.groupBy("host").count().agg(
        F.max("count")
    ).head()[0] <= 2
    assert res.epochs_run < 40


def test_link_filter_hook_trap_guard(spark):
    """The engine's link_filter hook (crawl4ai FilterChain's seat) prunes
    discovered URLs: with ~is_crawl_trap as the filter the crawl equals the
    unfiltered crawl on the trap-free corpus (no false drops), and a glob
    filter provably narrows it; kill/resume replays the filter
    bit-identically."""
    from pyspark.sql import functions as F

    from mcp_crawl4ai_rag_spark.functions.urls import (
        filter_chain,
        is_crawl_trap,
        url_pattern_match,
    )
    from mcp_crawl4ai_rag_spark.plans.crawl import CrawlEngine
    from mcp_crawl4ai_rag_spark.sources.corpus import gen_pages, gen_seeds

    n = 300
    pages = gen_pages(spark, n)
    seeds = gen_seeds(spark, n)
    base = CrawlEngine(
        spark, pages, allowed_host_suffix=".example.com"
    ).run(seeds, max_depth=4)
    guarded = CrawlEngine(
        spark, pages, allowed_host_suffix=".example.com",
        link_filter=lambda u: ~is_crawl_trap(u),
    ).run(seeds, max_depth=4)
    base_seen = {(r["canonical_url"], r["seq"]) for r in base.url_seen.collect()}
    assert {
        (r["canonical_url"], r["seq"]) for r in guarded.url_seen.collect()
    } == base_seen  # corpus has no trap URLs: the guard must drop nothing

    narrowed = CrawlEngine(
        spark, pages, allowed_host_suffix=".example.com",
        link_filter=lambda u: filter_chain(
            [~is_crawl_trap(u), ~url_pattern_match(u, ["*/private/*"])]
        ),
    ).run(seeds, max_depth=4)  # depth 4: the first non-seed /private
    # URLs enter the frontier (probed: 2 at n=300), so narrowing is
    # non-vacuous
    nseen = {r["canonical_url"] for r in narrowed.url_seen.collect()}
    bseen = {u for u, _ in base_seen}
    # discovered /private links are pruned; seeds are not link-filtered
    seed_urls = {r["url"] for r in seeds.collect()}
    assert all("/private/" not in u or u in seed_urls for u in nseen)
    assert nseen < bseen


def test_redirects_match_twin(spark):
    """CrawlEngine(redirects=gen_redirects) visited set+depths == the
    sequential twin py_crawl_with_redirects — same closed-form map, robots
    respected; and the map is non-vacuous (redirects actually fired)."""
    from mcp_crawl4ai_rag_spark.plans.crawl import (
        CrawlEngine,
        py_crawl_with_redirects,
    )
    from mcp_crawl4ai_rag_spark.sources.corpus import (
        SEED_IDS,
        gen_pages,
        gen_redirects,
        gen_robots,
        gen_seeds,
        redirect_of,
    )

    n, depth = 300, 4
    res = CrawlEngine(
        spark,
        gen_pages(spark, n),
        robots=gen_robots(spark),
        allowed_host_suffix=".example.com",
        redirects=gen_redirects(spark, n),
    ).run(gen_seeds(spark, n), max_depth=depth)
    got = {r["canonical_url"]: r["depth"] for r in res.url_seen.collect()}
    want = py_crawl_with_redirects(
        n, list(SEED_IDS), depth, lambda i: redirect_of(i, n)
    )
    assert got == want
    # non-vacuous: the no-redirect crawl differs
    base = CrawlEngine(
        spark,
        gen_pages(spark, n),
        robots=gen_robots(spark),
        allowed_host_suffix=".example.com",
    ).run(gen_seeds(spark, n), max_depth=depth)
    base_set = {r["canonical_url"] for r in base.url_seen.collect()}
    assert set(got) != base_set


def test_redirect_chain_loop_and_depth(spark):
    """A 2-hop chain lands at the SAME depth across two epochs; a redirect
    loop terminates via the visited set; the redirected-away source is
    never fetched."""
    from pyspark.sql import functions as F

    from mcp_crawl4ai_rag_spark.plans.crawl import CrawlEngine

    # tiny literal corpus: seed s links to a; a 301-> b 301-> c; x<->y loop
    def page(url, links):
        return (url, url.split("://")[1].split("/")[0], "/" + url.split("/", 3)[3],
                "# page\n\nbody text here", links, [], 200, True)

    pages = spark.createDataFrame(
        [
            page("https://h.example.com/s", ["https://h.example.com/a",
                                             "https://h.example.com/x"]),
            page("https://h.example.com/a", []),
            page("https://h.example.com/b", []),
            page("https://h.example.com/c", []),
            page("https://h.example.com/x", []),
            page("https://h.example.com/y", []),
        ],
        "url string, host string, path string, markdown string, "
        "out_links array<string>, image_ids array<string>, "
        "status int, success boolean",
    )
    redirects = spark.createDataFrame(
        [
            ("https://h.example.com/a", "https://h.example.com/b"),
            ("https://h.example.com/b", "https://h.example.com/c"),
            ("https://h.example.com/x", "https://h.example.com/y"),
            ("https://h.example.com/y", "https://h.example.com/x"),
        ],
        "from_url string, to_url string",
    )
    seeds = spark.createDataFrame(
        [("https://h.example.com/s", 0, 0, 0)],
        "url string, priority int, depth int, seq long",
    )
    res = CrawlEngine(
        spark, pages, allowed_host_suffix=".example.com", redirects=redirects
    ).run(seeds, max_depth=4)
    seen = {r["canonical_url"]: r["depth"] for r in res.url_seen.collect()}
    # chain: a scheduled depth 1; b and c follow at the SAME depth 1
    assert seen["https://h.example.com/a"] == 1
    assert seen["https://h.example.com/b"] == 1
    assert seen["https://h.example.com/c"] == 1
    # loop: x and y each visited once, then the loop closes
    assert seen["https://h.example.com/x"] == 1
    assert seen["https://h.example.com/y"] == 1
    fetched = {r["canonical_url"] for r in res.fetched.collect()}
    # redirect sources are consumed without fetch; only terminal pages fetch
    assert "https://h.example.com/a" not in fetched
    assert "https://h.example.com/b" not in fetched
    assert "https://h.example.com/c" in fetched
    # lineage: redirect consumption is not misattributed to robots denials
    assert sum(r["robots_denials"] for r in res.lineage.collect()) == 0


def test_redirect_twin_degenerates_to_reference_crawl():
    """With an empty redirect map the redirect twin's visited set equals
    the reference BFS oracle — the two sequential twins cannot drift
    (pure Python, no Spark)."""
    from mcp_crawl4ai_rag_spark.plans.crawl import py_crawl_with_redirects
    from mcp_crawl4ai_rag_spark.sources.corpus import SEED_IDS

    for n, depth in [(120, 3), (300, 4), (500, 5)]:
        want, _fetched = reference_crawl(n, list(SEED_IDS), depth)
        got = py_crawl_with_redirects(n, list(SEED_IDS), depth, lambda i: None)
        assert got == want, (n, depth)


def test_template_guard_cap_stops_mill_midcrawl(spark):
    """The in-crawl trap-family guard: a session-id mill that explodes
    DURING the crawl is cut off once its family count passes the cap,
    while the benign chain keeps crawling; a huge cap is a no-op."""
    from pyspark.sql import functions as F

    from mcp_crawl4ai_rag_spark.plans.crawl import CrawlEngine

    # mill: /sess/<hex>/view pages, each linking 2 more mill pages;
    # benign: /docs/a -> /docs/b -> /docs/c chain
    def hexid(i):
        return f"{0xA0000000 + i:08x}"

    rows = []

    def page(url, links):
        rows.append(
            (url, "h.example.com", "/" + url.split("/", 3)[3],
             "# page\n\nbody text here", links, [], 200, True)
        )

    for i in range(40):
        page(
            f"https://h.example.com/sess/{hexid(i)}/view",
            [
                f"https://h.example.com/sess/{hexid(2 * i + 40)}/view",
                f"https://h.example.com/sess/{hexid(2 * i + 41)}/view",
            ],
        )
    for i in range(40, 200):
        page(f"https://h.example.com/sess/{hexid(i)}/view", [])
    page("https://h.example.com/docs/a", ["https://h.example.com/docs/b"])
    page("https://h.example.com/docs/b", ["https://h.example.com/docs/c"])
    page("https://h.example.com/docs/c", [])
    page(
        "https://h.example.com/start",
        ["https://h.example.com/docs/a",
         f"https://h.example.com/sess/{hexid(0)}/view",
         f"https://h.example.com/sess/{hexid(1)}/view"],
    )
    pages = spark.createDataFrame(
        rows,
        "url string, host string, path string, markdown string, "
        "out_links array<string>, image_ids array<string>, "
        "status int, success boolean",
    )
    seeds = spark.createDataFrame(
        [("https://h.example.com/start", 0, 0, 0)],
        "url string, priority int, depth int, seq long",
    )

    capped = CrawlEngine(
        spark, pages, allowed_host_suffix=".example.com",
        template_guard_cap=2,
    ).run(seeds, max_depth=5)
    seen = [r["canonical_url"] for r in capped.url_seen.collect()]
    mill_seen = [u for u in seen if "/sess/" in u]
    # the family closes once its SCHEDULED count exceeds 2: after the two
    # depth-1 mill pages pop the count is exactly 2 (not >2), so their
    # children still enter; the next epoch pops those 4 (count 6 > 2) and
    # every later discovery in the family is guarded off
    assert len(mill_seen) < 12, mill_seen
    assert "https://h.example.com/docs/c" in seen  # benign chain unharmed

    uncapped = CrawlEngine(
        spark, pages, allowed_host_suffix=".example.com",
        template_guard_cap=10_000,
    ).run(seeds, max_depth=5)
    base = CrawlEngine(
        spark, pages, allowed_host_suffix=".example.com",
    ).run(seeds, max_depth=5)
    assert {
        (r["canonical_url"], r["seq"]) for r in uncapped.url_seen.collect()
    } == {(r["canonical_url"], r["seq"]) for r in base.url_seen.collect()}


def test_stored_frontier_engine_bit_identical(spark, corpus, tmp_path):
    """The stored-frontier mode (frontier persisted per epoch as a
    host-bucketed parquet table; threshold pop popping FROM the table) is
    a pure physical choice: across a multi-epoch politeness crawl the
    visited set, schedule epochs, seq order, and lineage counters are
    bit-identical to the in-memory twophase run — the 10^10 cluster shape
    (plans/crawl.py:214 claim) executed end-to-end."""
    seeds = gen_seeds(spark, N)
    robots = gen_robots(spark)
    base = CrawlEngine(
        spark, corpus, robots=robots, allowed_host_suffix=".example.com",
        epoch_seconds=30.0, pop_impl="twophase",
    ).run(seeds, max_depth=3, politeness=True)
    stored = CrawlEngine(
        spark, corpus, robots=robots, allowed_host_suffix=".example.com",
        epoch_seconds=30.0, pop_impl="threshold",
        frontier_store_dir=str(tmp_path / "frontier"),
    ).run(seeds, max_depth=3, politeness=True)
    assert stored.epochs_run >= 3, "the stored shape must span >=3 epochs"
    key = lambda res: {  # noqa: E731
        (r["canonical_url"], r["depth"], r["seq"], r["epoch_seen"])
        for r in res.url_seen.collect()
    }
    assert key(stored) == key(base)
    assert [tuple(r) for r in stored.lineage.orderBy("epoch").collect()] == [
        tuple(r) for r in base.lineage.orderBy("epoch").collect()
    ]
    # the frontier tables actually exist on disk, one per popped epoch
    eps = sorted(p.name for p in (tmp_path / "frontier").iterdir())
    assert eps and eps[0] == "ep0" and len(eps) >= stored.epochs_run


def test_stored_frontier_resume_identity(spark, corpus, tmp_path):
    """Kill/resume over a stored-frontier politeness crawl: resuming from
    the checkpoint reproduces the uninterrupted run bit-identically with
    the store active on both sides."""
    seeds = gen_seeds(spark, N)
    robots = gen_robots(spark)

    def eng(store, ckpt):
        return CrawlEngine(
            spark, corpus, robots=robots, allowed_host_suffix=".example.com",
            epoch_seconds=30.0, pop_impl="threshold",
            frontier_store_dir=str(tmp_path / store), checkpoint_dir=str(tmp_path / ckpt),
        )

    full = eng("f_full", "c_full").run(seeds, max_depth=3, politeness=True)
    # killed run: stop after 2 epochs, then resume to completion
    eng("f_kill", "c_kill").run(seeds, max_depth=3, politeness=True, max_epochs=2)
    resumed = eng("f_kill", "c_kill").resume(max_epochs=full.epochs_run)
    key = lambda res: {  # noqa: E731
        (r["canonical_url"], r["depth"], r["seq"], r["epoch_seen"])
        for r in res.url_seen.collect()
    }
    assert key(resumed) == key(full)


def test_stored_frontier_threshold_pop_zero_exchange(spark, tmp_path):
    """Popping from the stored host-bucketed frontier is EXCHANGE-FREE:
    the scan's HashPartitioning(host) satisfies both pop windows and the
    threshold groupBy, and the dual read is two column-pruned scans (the
    narrow ranking branch never reads canonical_url/path). This is the
    'Iceberg scan = free materialization' claim, plan-pinned."""
    from mcp_crawl4ai_rag_spark.operators.politeness import (
        pop_per_host_threshold,
    )

    fr = spark.range(0, 5000, 1, 8).select(
        F.concat(F.lit("https://h"), F.col("id") % 7, F.lit(".example.com/p"), F.col("id")).alias("canonical_url"),
        F.xxhash64(F.col("id")).alias("url_hash"),
        F.concat(F.lit("h"), F.col("id") % 7).alias("host"),
        F.concat(F.lit("/p"), F.col("id")).alias("path"),
        F.lit(0).alias("depth"),
        F.lit(0).alias("priority"),
        F.col("id").alias("seq"),
    )
    eng = CrawlEngine(
        spark, fr.limit(0), frontier_store_dir=str(tmp_path / "fr"),
        pop_impl="threshold",
    )
    stored = eng._store_frontier(0, fr)
    with_b = stored.withColumn("budget", F.lit(100))
    popped, deferred = pop_per_host_threshold(with_b, None, materialize=False)
    plan = popped._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan[:1500]
    scans = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert any("canonical_url" not in ln for ln in scans), scans
    assert any("canonical_url" in ln for ln in scans), scans
    # and the pop is still exact: per host (5000/7 rows each) the 100
    # smallest (depth, priority, seq) pop
    got = popped.groupBy("host").count().collect()
    assert {r["count"] for r in got} == {100}
    n_def = deferred.count()
    assert n_def == 5000 - 700


def _hazard_engine(spark, m, tmp_path, store=None, ckpt=None, **over):
    from mcp_crawl4ai_rag_spark.functions.urls import is_crawl_trap
    from mcp_crawl4ai_rag_spark.sources import hazard as HZ

    kw = dict(
        robots=HZ.gen_hazard_robots(spark),
        allowed_host_suffix=None,
        use_bloom=True,
        pop_impl="threshold",
        politeness_grain="domain",
        epoch_seconds=HZ.HAZ_EPOCH_SECONDS,
        redirects=HZ.gen_hazard_redirects(spark, m),
        link_filter=lambda u: ~is_crawl_trap(u),
        template_guard_cap=HZ.HAZ_TEMPLATE_CAP,
    )
    if store:
        kw["frontier_store_dir"] = str(tmp_path / store)
    if ckpt:
        kw["checkpoint_dir"] = str(tmp_path / ckpt)
    kw.update(over)
    return CrawlEngine(spark, HZ.gen_hazard_pages(spark, m), **kw)


def test_hardened_composed_crawl_matches_twin(spark, tmp_path):
    """ONE engine run with EVERY hardening guard active — redirects +
    trap link_filter + in-crawl template guard + wildcard robots (query
    target) + eTLD+1 politeness with backoff + max_pages + threshold pop
    from a STORED frontier — against the hazard corpus planting all the
    hazards; the sequential twin must reproduce the full ordering
    contract (depth, epoch_seen, seq) URL-for-URL."""
    from mcp_crawl4ai_rag_spark.plans.crawl import py_crawl_hardened
    from mcp_crawl4ai_rag_spark.sources import hazard as HZ

    m, max_pages = 300, HZ.HAZ_MAX_PAGES
    res = _hazard_engine(spark, m, tmp_path, store="fr").run(
        HZ.gen_hazard_seeds(spark).select("url", "priority", "depth", "seq"),
        max_depth=HZ.HAZ_MAX_DEPTH,
        politeness=True,
        max_epochs=HZ.HAZ_MAX_EPOCHS,
        max_pages=max_pages,
    )
    got = {
        r["canonical_url"]: (r["depth"], r["epoch_seen"], r["seq"])
        for r in res.url_seen.collect()
    }
    want = py_crawl_hardened(
        HZ.py_hazard_graph(m),
        [HZ.hz_url(i) for i in range(HZ.HAZ_SEED_COUNT)],
        max_depth=HZ.HAZ_MAX_DEPTH,
        max_epochs=HZ.HAZ_MAX_EPOCHS,
        epoch_seconds=HZ.HAZ_EPOCH_SECONDS,
        max_pages=max_pages,
        template_guard_cap=HZ.HAZ_TEMPLATE_CAP,
        robots_disallow=list(HZ.HAZ_ROBOTS_DISALLOW),
        robots_allow=list(HZ.HAZ_ROBOTS_ALLOW),
    )
    assert len(got) == len(want) and got == want, (
        f"engine={len(got)} twin={len(want)} "
        f"missing={set(want) - set(got)} extra={set(got) - set(want)} "
        f"diff={ {u: (got[u], want[u]) for u in got if u in want and got[u] != want[u]} }"
    )
    # every hazard class provably present in the schedule
    assert got, "empty crawl"
    assert any("/sess/" in u for u in got), "mill URLs never scheduled"
    assert any("/private/s" in u for u in got), "denied URLs never scheduled"
    assert any("?sid=" in u for u in got), "query-denied URLs never scheduled"
    assert any("/private/ok" in u for u in got), "Allow override never scheduled"
    assert not any("/x/x/x" in u for u in got), "trap URLs escaped the filter"
    assert len(got) == max_pages, "max_pages did not bite"
    # budgets BIND: many pops land later than their BFS depth level
    assert sum(1 for d, e, _s in got.values() if e > d) > 50
    # the template guard bites: strictly fewer mill URLs than a guard-less
    # twin of the same crawl schedules
    unguarded = py_crawl_hardened(
        HZ.py_hazard_graph(m),
        [HZ.hz_url(i) for i in range(HZ.HAZ_SEED_COUNT)],
        max_depth=HZ.HAZ_MAX_DEPTH,
        max_epochs=HZ.HAZ_MAX_EPOCHS,
        epoch_seconds=HZ.HAZ_EPOCH_SECONDS,
        max_pages=None,
        template_guard_cap=None,
        robots_disallow=list(HZ.HAZ_ROBOTS_DISALLOW),
        robots_allow=list(HZ.HAZ_ROBOTS_ALLOW),
    )
    n_mill_g = sum(1 for u in want if "/sess/" in u)
    n_mill_u = sum(1 for u in unguarded if "/sess/" in u)
    assert 0 < n_mill_g < n_mill_u, (n_mill_g, n_mill_u)


def test_hardened_composed_kill_resume_identity(spark, tmp_path):
    """Kill/resume with ALL guards active: resuming a checkpointed
    hardened run reproduces the uninterrupted one bit-identically
    (backoff, template counters, max_pages remaining, stored frontier
    all rebuilt/reloaded correctly)."""
    from mcp_crawl4ai_rag_spark.sources import hazard as HZ

    m, max_pages = 300, HZ.HAZ_MAX_PAGES
    seeds = HZ.gen_hazard_seeds(spark)
    full = _hazard_engine(spark, m, tmp_path, store="f1", ckpt="c1").run(
        seeds, max_depth=HZ.HAZ_MAX_DEPTH, politeness=True,
        max_epochs=HZ.HAZ_MAX_EPOCHS, max_pages=max_pages,
    )
    _hazard_engine(spark, m, tmp_path, store="f2", ckpt="c2").run(
        seeds, max_depth=HZ.HAZ_MAX_DEPTH, politeness=True,
        max_epochs=2, max_pages=max_pages,
    )
    resumed = _hazard_engine(spark, m, tmp_path, store="f2", ckpt="c2").resume(
        max_epochs=HZ.HAZ_MAX_EPOCHS
    )
    key = lambda res: {  # noqa: E731
        (r["canonical_url"], r["depth"], r["seq"], r["epoch_seen"])
        for r in res.url_seen.collect()
    }
    assert key(resumed) == key(full)


def test_quota_follows_politeness_grain(spark):
    """max_pages_per_host under politeness_grain="domain" clamps per
    registrable DOMAIN (counter fold, clamp join, and pop rows all key by
    domain — a grain mismatch would silently never clamp); under the
    default host grain the same corpus yields the per-hostname quota."""
    urls = [
        f"https://{sub}.shop-x.com/p{k}"
        for sub in ("a", "b") for k in range(8)
    ]
    pages = spark.createDataFrame(
        [
            (u, u.split("/")[2], "/" + u.split("/", 3)[3], f"# {u}", [], [], 200, True)
            for u in urls
        ],
        "url string, host string, path string, markdown string, "
        "out_links array<string>, image_ids array<string>, "
        "status int, success boolean",
    )
    seeds = spark.createDataFrame(
        [(u, 0, 0, k) for k, u in enumerate(urls)],
        "url string, priority int, depth int, seq long",
    )

    def run(grain):
        res = CrawlEngine(
            spark, pages, politeness_grain=grain,
        ).run(seeds, max_depth=1, max_pages_per_host=5, max_epochs=4)
        from collections import Counter
        return Counter(r["host"] for r in res.url_seen.collect())

    by_host = run("host")
    assert by_host == {"a.shop-x.com": 5, "b.shop-x.com": 5}
    by_dom = run("domain")
    # one shared domain budget: exactly 5 TOTAL across both subdomains
    assert sum(by_dom.values()) == 5
    with pytest.raises(ValueError):
        CrawlEngine(spark, pages, politeness_grain="bogus")
