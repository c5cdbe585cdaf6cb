"""Corpus-prep operators: hash split, vocab top-k, contamination check."""

import hashlib

from pyspark.sql import functions as F

from mcp_crawl4ai_rag_spark.operators.corpus_ops import (
    _HASH_SPACE,
    contamination_pairs,
    hash_split,
    vocab_topk,
)


def _py_frac(salt, i):
    return int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:15], 16) / _HASH_SPACE


def test_hash_split_matches_python_twin_and_is_stable(spark):
    docs = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs, w, salt="s1").collect()
    }

    def expect(i):
        f = _py_frac("s1", i)
        if f < 0.8:
            return "train"
        if f < 0.9:
            return "val"
        return "test"

    assert got == {i: expect(i) for i in range(500)}
    # roughly proportional
    n_train = sum(1 for v in got.values() if v == "train")
    assert 350 < n_train < 450
    # re-running and repartitioning does not move rows between splits
    got2 = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs.repartition(7), w, salt="s1").collect()
    }
    assert got2 == got
    # a different salt re-rolls assignments
    got3 = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs, w, salt="s2").collect()
    }
    assert got3 != got


def test_vocab_topk_counts_and_tiebreak(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "apple"),
        ],
        "doc_id long, text string",
    )
    rows = vocab_topk(docs, k=2).collect()
    assert [(r["token"], r["tf"], r["df"]) for r in rows] == [
        ("apple", 3, 2),
        ("banana", 2, 2),
    ]


def test_vocab_topk_tie_broken_by_token(spark):
    docs = spark.createDataFrame([(1, "zeta alpha")], "doc_id long, text string")
    rows = vocab_topk(docs, k=1).collect()
    assert rows[0]["token"] == "alpha"


def test_contamination_detects_planted_overlap(spark):
    train = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(30))),
            (2, " ".join(f"x{i}" for i in range(30))),
        ],
        "doc_id long, text string",
    )
    # eval doc 10 copies tokens w5..w24 from train doc 1 => contaminated;
    # eval doc 11 is fresh text => clean
    ev = spark.createDataFrame(
        [
            (10, " ".join(f"w{i}" for i in range(5, 25))),
            (11, " ".join(f"z{i}" for i in range(30))),
        ],
        "doc_id long, text string",
    )
    rows = contamination_pairs(train, ev, shingle_k=13).collect()
    assert len(rows) == 1
    r = rows[0]
    # eval doc 10 has 20 tokens -> 8 distinct 13-shingles, all present in train 1
    assert (r["eval_id"], r["train_id"]) == (10, 1)
    assert r["n_common"] == 8 and r["eval_shingles"] == 8
    assert r["overlap_frac"] == 1.0


def test_contamination_min_overlap_filters(spark):
    train = spark.createDataFrame(
        [(1, "a b c d e f g h i j k l m n")], "doc_id long, text string"
    )
    ev = spark.createDataFrame(
        # shares exactly the one shingle "a..m" window? tokens a..m = 13 toks
        [(10, "a b c d e f g h i j k l m zz")],
        "doc_id long, text string",
    )
    assert contamination_pairs(train, ev, min_overlap=2).count() == 0
    assert contamination_pairs(train, ev, min_overlap=1).count() == 1


def test_repetition_stats_and_gopher_pass(spark):
    from mcp_crawl4ai_rag_spark.functions.text import (
        gopher_pass_expr,
        repetition_stats_expr,
    )

    good = " ".join(["solid prose with normal words"] * 12)  # 60 words
    bullety = "\n".join(["- item one", "- item two", "- item three"])
    dupy = "\n".join(["same line here"] * 10)
    docs = spark.createDataFrame(
        [(1, good), (2, bullety), (3, dupy)], "doc_id long, text string"
    )
    st = repetition_stats_expr(F.col("text"))
    rows = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id", st.alias("s"), gopher_pass_expr(st).alias("keep")
        ).collect()
    }
    assert rows[1]["s"]["n_words"] == 60
    assert rows[1]["s"]["dup_line_frac"] == 0.0
    assert rows[1]["keep"] is True
    assert rows[2]["s"]["bullet_frac"] == 1.0
    assert rows[2]["keep"] is False  # all-bullet + too few words
    assert rows[3]["s"]["dup_line_frac"] == 0.9
    assert rows[3]["keep"] is False


def test_pack_sequences_schedule(spark):
    from mcp_crawl4ai_rag_spark.operators.corpus_ops import pack_sequences
    from mcp_crawl4ai_rag_spark.functions.text import token_count_bpe

    docs = spark.createDataFrame(
        [(i, " ".join(f"tok{j}" for j in range((i * 13) % 40 + 1))) for i in range(30)],
        "doc_id long, text string",
    )
    L = 64
    sched = pack_sequences(docs, L, num_partitions=4).collect()
    toks = {
        r["doc_id"]: r["t"]
        for r in docs.select(
            "doc_id", token_count_bpe(F.col("text")).alias("t")
        ).collect()
    }
    # every doc's slices tile [0, tok)
    by_doc = {}
    for r in sched:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d, pieces in by_doc.items():
        pieces.sort(key=lambda r: r["slice_start"])
        assert pieces[0]["slice_start"] == 0
        end = 0
        for p in pieces:
            assert p["slice_start"] == end
            assert p["slice_len"] > 0
            end += p["slice_len"]
        assert end == toks[d]
    # every pack except the last is exactly full, pieces tile [0, L)
    by_pack = {}
    for r in sched:
        by_pack.setdefault(r["pack_id"], []).append(r)
    last_pack = max(by_pack)
    for pk, pieces in by_pack.items():
        pieces.sort(key=lambda r: r["pack_pos"])
        pos = 0
        for p in pieces:
            assert p["pack_pos"] == pos
            pos += p["slice_len"]
        if pk != last_pack:
            assert pos == L
        else:
            assert 0 < pos <= L
    # total tokens conserved
    assert sum(toks.values()) == sum(r["slice_len"] for r in sched)


def test_pack_shards_schedule(spark):
    from mcp_crawl4ai_rag_spark.operators.corpus_ops import pack_shards

    sizes = [(f"it_{i:04d}", (i * 37) % 900 + 1) for i in range(200)]
    items = spark.createDataFrame(sizes, "image_id string, item_bytes long")
    B = 4096
    out = pack_shards(items, B).collect()
    # python twin: exclusive prefix sum in id order, first-byte assignment
    cum = 0
    expect = {}
    for iid, sz in sizes:  # already in id order
        expect[iid] = (cum // B, cum % B, sz)
        cum += sz
    assert len(out) == len(sizes)
    for r in out:
        assert (r["shard_id"], r["pos_bytes"], r["item_bytes"]) == expect[
            r["image_id"]
        ]
    # items never split: each id appears exactly once; pos within budget;
    # shard ids contiguous from 0
    assert len({r["image_id"] for r in out}) == len(sizes)
    shards = sorted({r["shard_id"] for r in out})
    assert shards == list(range(shards[-1] + 1))
    assert all(0 <= r["pos_bytes"] < B for r in out)
    # overrun bound: a shard's span exceeds B by less than its last item
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard_id"], []).append(r)
    for pieces in by_shard.values():
        pieces.sort(key=lambda r: r["pos_bytes"])
        span = pieces[-1]["pos_bytes"] + pieces[-1]["item_bytes"]
        assert span < B + pieces[-1]["item_bytes"]


def test_pack_shards_partition_invariant_and_drops_empty(spark):
    from mcp_crawl4ai_rag_spark.operators.corpus_ops import pack_shards

    rows = [(f"it_{i:04d}", (i * 11) % 300) for i in range(150)]  # some 0s
    items = spark.createDataFrame(rows, "image_id string, item_bytes long")
    a = sorted(
        map(tuple, pack_shards(items, 1024, num_partitions=2).collect())
    )
    b = sorted(
        map(tuple, pack_shards(items, 1024, num_partitions=13).collect())
    )
    assert a == b
    n_pos = sum(1 for _, s in rows if s > 0)
    assert len(a) == n_pos  # zero-byte payloads dropped


def test_redact_pii(spark):
    from mcp_crawl4ai_rag_spark.functions.text import redact_pii_expr

    docs = spark.createDataFrame(
        [
            (1, "mail a.b-c_d@foo-bar.org or 555-123-4567 now"),
            (2, "server at 192.168.0.1 and 10.0.0.254 no phone"),
            (3, "clean text only"),
        ],
        "doc_id long, text string",
    )
    r = redact_pii_expr(F.col("text"))
    rows = {x["doc_id"]: x for x in docs.select("doc_id", r.alias("r")).collect()}
    assert rows[1]["r"]["clean"] == "mail <EMAIL> or <PHONE> now"
    assert rows[1]["r"]["n_emails"] == 1 and rows[1]["r"]["n_phones"] == 1
    assert rows[2]["r"]["clean"] == "server at <IP> and <IP> no phone"
    assert rows[2]["r"]["n_ips"] == 2
    assert rows[3]["r"]["clean"] == "clean text only"


def test_mix_corpus_rates_and_determinism(spark):
    from mcp_crawl4ai_rag_spark.operators.corpus_ops import mix_corpus

    docs = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(600)], "doc_id long, source string"
    )
    rates = {"s0": 0.0, "s1": 1.0}
    kept = mix_corpus(docs, rates, default_rate=0.5, salt="m1")
    by_src = {r["source"]: r["n"] for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert "s0" not in by_src          # rate 0 -> dropped entirely
    assert by_src["s1"] == 200         # rate 1 -> all kept
    assert 60 < by_src.get("s2", 0) < 140  # ~50% of 200
    # deterministic: same salt -> same set; python twin agrees
    ids1 = sorted(r["doc_id"] for r in kept.collect())
    ids2 = sorted(r["doc_id"] for r in mix_corpus(docs, rates, default_rate=0.5, salt="m1").collect())
    assert ids1 == ids2
    expect = [
        i for i in range(600)
        if {0: 0.0, 1: 1.0, 2: 0.5}[i % 3] > _py_frac("m1", i)
    ]
    assert ids1 == expect


def test_strip_boilerplate(spark):
    from mcp_crawl4ai_rag_spark.operators.corpus_ops import strip_boilerplate

    nav, foot = "HOME | ABOUT | CONTACT", "(c) example.com"
    rows = [
        (i, "h1", f"{nav}\nunique body {i}\n{foot}") for i in range(4)
    ] + [
        (10, "h1", f"{nav}\n{foot}"),            # all-boilerplate page
        (20, "h2", f"{nav}\nother host body\n{foot}"),  # h2 below min pages
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        r["doc_id"]: r
        for r in strip_boilerplate(docs, min_host_pages=3, frac_threshold=0.5).collect()
    }
    for i in range(4):
        assert got[i]["clean"] == f"unique body {i}"
        assert got[i]["n_removed"] == 2
    # all-boilerplate page survives, empty
    assert got[10]["clean"] == "" and got[10]["n_removed"] == 2
    # small host: nothing classified as boilerplate
    assert got[20]["clean"] == rows[-1][2]
    assert got[20]["n_removed"] == 0


def test_strip_boilerplate_preserves_line_order_and_dups(spark):
    from mcp_crawl4ai_rag_spark.operators.corpus_ops import strip_boilerplate

    # duplicate body lines within ONE page are not boilerplate (distinct-page
    # counting) and must all survive in order
    docs = spark.createDataFrame(
        [(1, "h", "b\na\nb\nc"), (2, "h", "x\ny"), (3, "h", "p\nq")],
        "doc_id long, source string, text string",
    )
    got = {r["doc_id"]: r["clean"] for r in strip_boilerplate(docs).collect()}
    assert got[1] == "b\na\nb\nc"


def test_mix_corpus_upweights_above_one(spark):
    from mcp_crawl4ai_rag_spark.operators.corpus_ops import mix_corpus

    docs = spark.createDataFrame(
        [(i, "wiki") for i in range(200)], "doc_id long, source string"
    )
    out = mix_corpus(docs, {"wiki": 2.5}, salt="up1")
    per_doc = {
        r["doc_id"]: r["n"]
        for r in out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    # every doc gets 2 guaranteed copies, +1 with prob 0.5 from (salt, id)
    assert set(per_doc.values()) <= {2, 3}
    assert len(per_doc) == 200
    expected_total = sum(
        2 + (1 if _py_frac("up1", i) < 0.5 else 0) for i in range(200)
    )
    assert out.count() == expected_total


def test_strip_boilerplate_null_text_survives(spark):
    from mcp_crawl4ai_rag_spark.operators.corpus_ops import strip_boilerplate

    docs = spark.createDataFrame(
        [(1, "h", "a\nb"), (2, "h", None), (3, "h", "c\nd")],
        "doc_id long, source string, text string",
    )
    got = {r["doc_id"]: r for r in strip_boilerplate(docs).collect()}
    assert got[2]["clean"] == "" and got[2]["n_removed"] == 0
    assert len(got) == 3


def test_linear_probe_exact_and_partition_invariant(spark):
    """Normal-equations linear probe: Spark training equals the pure-Python
    twin bit-for-bit (exact integer Gram sums + exact rational solve), is
    invariant to repartitioning, and agrees with numpy lstsq to float64
    tolerance."""
    import numpy as np

    from mcp_crawl4ai_rag_spark.operators.corpus_ops import (
        linear_probe_score_expr,
        py_train_linear_probe,
        train_linear_probe,
    )

    rng = np.random.Generator(np.random.PCG64(11))
    k, n = 3, 400
    feats = rng.integers(-1000, 1001, size=(n, k))
    noise = rng.integers(-300, 301, size=n)
    labels = (feats @ np.array([3, 2, -1]) + noise > 0).astype(int)
    rows = [tuple(int(v) for v in feats[i]) + (int(labels[i]),) for i in range(n)]

    df = spark.createDataFrame(rows, "f0 long, f1 long, f2 long, label long")
    w = train_linear_probe(df, ["f0", "f1", "f2"], "label")
    w_twin = py_train_linear_probe(rows, k)
    assert w == w_twin  # bit-identical, not approx

    w_repart = train_linear_probe(
        df.repartition(7, "f1"), ["f0", "f1", "f2"], "label"
    )
    assert w_repart == w

    x = np.hstack([np.ones((n, 1)), feats.astype(np.float64)])
    w_np, *_ = np.linalg.lstsq(x, labels.astype(np.float64), rcond=None)
    assert np.allclose(w, w_np, atol=1e-9)

    scored = df.select(
        F.round(
            linear_probe_score_expr(w, ["f0", "f1", "f2"]), 4
        ).alias("score")
    ).collect()
    py_scores = sorted(
        round(
            float(
                np.float64(w[0])
                + np.float64(r[0]) * w[1]
                + np.float64(r[1]) * w[2]
                + np.float64(r[2]) * w[3]
            ),
            4,
        )
        for r in rows
    )
    assert sorted(r["score"] for r in scored) == py_scores


def test_linear_probe_singular_raises(spark):
    from mcp_crawl4ai_rag_spark.operators.corpus_ops import train_linear_probe

    df = spark.createDataFrame(
        [(5, 1), (5, 0), (5, 1)], "f0 long, label long"
    )
    try:
        train_linear_probe(df, ["f0"], "label")
    except ValueError as e:
        assert "singular" in str(e)
    else:  # pragma: no cover
        raise AssertionError("expected singular system to raise")


def test_unigram_lm_matches_python_twin(spark):
    """Unigram LM scores equal a transparent Python implementation at 4dp."""
    import math

    import pytest

    from mcp_crawl4ai_rag_spark.operators.corpus_ops import unigram_lm_scores

    texts = {
        1: "the cat sat on the mat",
        2: "the dog",
        3: "rare unique tokens here",
        4: "the the the",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in unigram_lm_scores(docs).collect()}

    counts: dict[str, int] = {}
    for t in texts.values():
        for w in t.lower().split():
            counts[w] = counts.get(w, 0) + 1
    total = sum(counts.values())
    for i, t in texts.items():
        ws = t.lower().split()
        ll = sum(math.log(counts[w] / total) for w in ws)
        mean = ll / len(ws)
        assert got[i]["n_tokens"] == len(ws)
        assert got[i]["mean_logprob"] == pytest.approx(round(mean, 4), abs=1e-9)
        assert got[i]["ppl"] == pytest.approx(round(math.exp(-mean), 4), abs=1e-9)
    # the all-stopword doc is the most likely (highest mean logprob)
    assert max(got, key=lambda i: got[i]["mean_logprob"]) == 4


def test_unigram_lm_stopword_skew(spark):
    """Stop-word skew stress (same style as the LSH hot-band test): one
    token ('the') is 25% of the token stream AND carries 25% of the tf
    rows, so an unsplit term join would put ~8x the median load on one
    partition. The hot/cold split must route hot rows through a
    BroadcastHashJoin (zero term shuffle), keep the cold tail an equi-join
    (no cartesian/nested-loop blowup), and the scores must still match a
    transparent Python twin at 4dp. (AQE skew-join can't fire on this
    aggregate-dim join shape — see the operator docstring — which is why
    the split lives in the operator.)"""
    import math

    import pytest as _pytest

    from mcp_crawl4ai_rag_spark.operators.corpus_ops import unigram_lm_scores

    # broadcast disabled: at the 10^12-token scale the vocab-sized counts
    # table cannot auto-broadcast — only the explicit top-K hint may.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # 6000 docs x 40 tokens: 10 'the' + 1 doc-unique filler (x30)
        rows = []
        for i in range(6000):
            toks = ["the"] * 10 + [f"u{i:06d}"] * 30
            rows.append((i, " ".join(toks)))
        docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
        scored = unigram_lm_scores(docs, hot_k=16)
        got = {r["doc_id"]: r for r in scored.collect()}

        plan = scored._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "CartesianProduct" not in final
        # the only nested-loop join allowed is the documented 1-row
        # corpus-total broadcast (crossJoin(broadcast(total)))
        assert final.count("BroadcastNestedLoopJoin") <= 1
        # hot rows take the broadcast top-K path; cold tail stays an
        # equi-join on a hot-free key space
        assert "BroadcastHashJoin" in final, final[:2000]
        assert "SortMergeJoin" in final or "ShuffledHashJoin" in final

        total = 240000
        lp_the = math.log(60000 / total)
        lp_uniq = math.log(30 / total)
        mean = (10 * lp_the + 30 * lp_uniq) / 40
        assert len(got) == 6000
        for i in (0, 777, 5999):
            assert got[i]["n_tokens"] == 40
            assert got[i]["mean_logprob"] == _pytest.approx(round(mean, 4), abs=1e-9)

        # split-invariance: hot_k=0 (single equi-join) yields identical rows
        plain = {r["doc_id"]: r for r in unigram_lm_scores(docs, hot_k=0).collect()}
        assert all(
            plain[i]["mean_logprob"] == got[i]["mean_logprob"]
            and plain[i]["ppl"] == got[i]["ppl"]
            for i in got
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _py_aspect_batches(rows, buckets, bs):
    """Transparent twin: nearest bucket by fixed-point aspect (ties → lower
    id), rank by id within bucket, batch = rank // bs."""
    afps = [(bw * 1_000_000) // bh for bw, bh in buckets]
    chosen = {}
    for iid, w, h in rows:
        d = [abs((w * 1_000_000) // h - a) for a in afps]
        chosen[iid] = d.index(min(d))
    out = {}
    by_bucket = {}
    for iid in sorted(chosen):
        by_bucket.setdefault(chosen[iid], []).append(iid)
    for b, ids in by_bucket.items():
        for r, iid in enumerate(ids):
            out[iid] = (b, buckets[b][0], buckets[b][1], r // bs, r % bs)
    return out


def test_aspect_bucket_batches_matches_python_twin(spark):
    from mcp_crawl4ai_rag_spark.operators.corpus_ops import (
        DEFAULT_ASPECT_BUCKETS,
        aspect_bucket_batches,
    )

    rows = [
        (f"img_{i:06d}", 32 + (i % 5) * 8, 32 + (i % 3) * 16)
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "image_id string, w int, h int")
    got = {
        r["image_id"]: (
            r["bucket_id"], r["bw"], r["bh"], r["batch_idx"], r["pos_in_batch"]
        )
        for r in aspect_bucket_batches(
            df.repartition(7), DEFAULT_ASPECT_BUCKETS, 16
        ).collect()
    }
    want = _py_aspect_batches(rows, DEFAULT_ASPECT_BUCKETS, 16)
    assert got == want

    # batch invariants: within every (bucket, batch): size ≤ 16, positions
    # dense 0..size-1; all but each bucket's last batch exactly full
    from collections import defaultdict

    batches = defaultdict(list)
    for iid, (b, _, _, bi, pos) in got.items():
        batches[(b, bi)].append(pos)
    last = {}
    for (b, bi), _ in batches.items():
        last[b] = max(last.get(b, -1), bi)
    for (b, bi), poss in batches.items():
        assert sorted(poss) == list(range(len(poss)))
        if bi < last[b]:
            assert len(poss) == 16


def test_aspect_bucket_batches_tiebreak_and_drop_last(spark):
    from mcp_crawl4ai_rag_spark.operators.corpus_ops import (
        aspect_bucket_batches,
    )

    # two buckets with the SAME aspect (1:1): ties must go to the lower id
    buckets = [(64, 64), (32, 32), (64, 32)]
    rows = [("a", 10, 10), ("b", 100, 100), ("c", 20, 10)]
    df = spark.createDataFrame(rows, "image_id string, w int, h int")
    got = {
        r["image_id"]: r["bucket_id"]
        for r in aspect_bucket_batches(df, buckets, 2).collect()
    }
    assert got == {"a": 0, "b": 0, "c": 2}

    # drop_last: 5 square images at batch_size 2 → trailing singleton dropped
    rows5 = [(f"i{k}", 8, 8) for k in range(5)]
    df5 = spark.createDataFrame(rows5, "image_id string, w int, h int")
    kept = aspect_bucket_batches(df5, buckets, 2, drop_last=True).collect()
    assert len(kept) == 4
    assert {r["batch_idx"] for r in kept} == {0, 1}
    # non-positive dims are dropped, not assigned
    bad = spark.createDataFrame(
        [("z", 0, 10), ("y", 10, 0)], "image_id string, w int, h int"
    )
    assert aspect_bucket_batches(bad, buckets, 2).count() == 0


def test_aspect_bucket_assignment_plan_is_shuffle_free(spark):
    """The bucket-assignment projection must add NO exchange of its own —
    the only shuffles downstream are distributed_cumsum's single range
    partition and the tiny offsets aggregate (broadcast back)."""
    from mcp_crawl4ai_rag_spark.operators.corpus_ops import (
        DEFAULT_ASPECT_BUCKETS,
        aspect_bucket_batches,
    )

    from mcp_crawl4ai_rag_spark.operators.corpus_ops import (
        assign_aspect_buckets,
    )

    df = spark.createDataFrame(
        [(f"img_{i}", 32 + (i % 5) * 8, 32 + (i % 3) * 16) for i in range(100)],
        "image_id string, w int, h int",
    )
    # the assignment stage on its own: the full op's visible plan starts at
    # distributed_cumsum's checkpoint, which would hide a bucket-table join
    asg_plan = (
        assign_aspect_buckets(df, DEFAULT_ASPECT_BUCKETS)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in asg_plan
    assert "Join" not in asg_plan
    assert "array_position" in asg_plan

    out = aspect_bucket_batches(df, DEFAULT_ASPECT_BUCKETS, 16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # broadcast join back (no shuffle on the ranked side)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_split_by_component_is_leakage_safe(spark):
    from mcp_crawl4ai_rag_spark.operators.components import connected_components
    from mcp_crawl4ai_rag_spark.operators.corpus_ops import (
        hash_split,
        split_by_component,
    )

    # int64 id domain, matching the dedup pipeline's hashed doc ids
    docs = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    # plant near-dup clusters: chains 0~1~2, 10~11, 20~21~22~23
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a long, id_b long",
    )
    comps = connected_components(edges)
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = {
        r["doc_id"]: r["split"]
        for r in split_by_component(docs, comps, w, salt="s1").collect()
    }
    assert len(got) == 300  # left join keeps every doc exactly once

    # every component's members share one split — no near-dup straddles
    clusters = [[0, 1, 2], [10, 11], [20, 21, 22, 23]]
    for c in clusters:
        assert len({got[d] for d in c}) == 1, c
    # and that split is the representative's own hash_split assignment
    plain = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs, w, salt="s1").collect()
    }
    for c in clusters:
        assert got[c[0]] == plain[min(c)]
    # singletons (not in any component) are assigned EXACTLY as hash_split
    members = {d for c in clusters for d in c}
    for d, s in got.items():
        if d not in members:
            assert s == plain[d]
    # the clusters actually straddle under plain hash_split somewhere,
    # otherwise this test proves nothing
    assert any(len({plain[d] for d in c}) > 1 for c in clusters)


# ---------------------------------------------------------------------------
# temperature-based corpus mixing (mT5/PaLM alpha-tempering)
# ---------------------------------------------------------------------------


def test_temperature_rates_properties():
    from mcp_crawl4ai_rag_spark.operators.corpus_ops import temperature_rates

    counts = {"web": 252, "books": 124, "code": 62, "wiki": 31, "ref": 31}
    total = sum(counts.values())
    rates = temperature_rates(counts, 0.3)
    # budget conservation: expected output size == input size
    assert abs(sum(rates[s] * counts[s] for s in counts) - total) < 1e-9
    # alpha<1 damps the head and boosts the tail
    assert rates["web"] < 1.0 < rates["wiki"]
    assert rates["wiki"] == rates["ref"]  # equal counts, equal rates
    # alpha=1 is the natural distribution: every rate exactly 1
    r1 = temperature_rates(counts, 1.0)
    assert all(abs(r1[s] - 1.0) < 1e-12 for s in counts)
    # alpha=0 is uniform-over-sources: rate_s = (total/K)/n_s
    r0 = temperature_rates(counts, 0.0)
    assert all(
        abs(r0[s] - (total / len(counts)) / counts[s]) < 1e-12 for s in counts
    )
    # explicit budget scales every rate linearly
    r2 = temperature_rates(counts, 0.3, budget=2 * total)
    assert all(abs(r2[s] - 2 * rates[s]) < 1e-12 for s in counts)


def test_temperature_mix_matches_python_twin(spark):
    import math

    from collections import Counter

    from mcp_crawl4ai_rag_spark.operators.corpus_ops import (
        temperature_mix,
        temperature_rates,
    )

    rows = [(i, "tail" if i % 4 == 0 else "head") for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mix(docs, 0.5).collect()
    got = Counter((r["doc_id"], r["source"]) for r in out)

    rates = temperature_rates({"head": 150, "tail": 50}, 0.5)
    assert rates["tail"] > 1.0  # the tail genuinely upsamples
    want = {}
    for i, s in rows:
        r = rates[s]
        n = int(math.floor(r)) + (1 if _py_frac("tmix", i) < r - math.floor(r) else 0)
        if n:
            want[(i, s)] = n
    assert dict(got) == want
    # expected-size re-balance: totals stay near the input size
    assert abs(sum(got.values()) - 200) <= 25
    # determinism: a second run is identical
    again = Counter(
        (r["doc_id"], r["source"]) for r in temperature_mix(docs, 0.5).collect()
    )
    assert again == got


def test_temperature_rates_property_invariants():
    """Hypothesis sweep: budget conservation, positivity, α-monotonicity
    (α<1 favors small sources, α>1 large ones), equal-count symmetry, and
    dict-order independence — for arbitrary histograms and temperatures."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mcp_crawl4ai_rag_spark.operators.corpus_ops import temperature_rates

    @settings(max_examples=300, deadline=None)
    @given(
        counts=st.dictionaries(
            st.text(alphabet="abcdefgh", min_size=1, max_size=4),
            st.integers(1, 10**9),
            min_size=1,
            max_size=12,
        ),
        alpha=st.floats(0.0, 1.5, allow_nan=False, allow_infinity=False),
    )
    def check(counts, alpha):
        rates = temperature_rates(counts, alpha)
        total = sum(counts.values())
        got = 0.0
        for s in sorted(counts):
            got += rates[s] * counts[s]
        assert abs(got - total) <= 1e-9 * total
        assert all(r > 0.0 for r in rates.values())
        by_n = sorted(counts, key=lambda s: (counts[s], s))
        for a, b in zip(by_n, by_n[1:]):
            if counts[a] == counts[b]:
                assert rates[a] == rates[b]
            elif alpha < 1.0:
                assert rates[a] >= rates[b] * (1 - 1e-12)
            elif alpha > 1.0:
                assert rates[a] <= rates[b] * (1 + 1e-12)
        rev = dict(reversed(list(counts.items())))
        assert temperature_rates(rev, alpha) == rates

    check()


def _py_bigram_lm(texts: dict[int, str], lam: float):
    """Transparent Python twin of bigram_lm_scores (interpolated bigram LM)."""
    import math

    uni: dict[str, int] = {}
    bgc: dict[tuple[str, str], int] = {}
    ctx: dict[str, int] = {}
    toks = {i: t.lower().split() for i, t in texts.items() if t.split()}
    for ws in toks.values():
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bgc[(a, b)] = bgc.get((a, b), 0) + 1
            ctx[a] = ctx.get(a, 0) + 1
    total = sum(uni.values())
    out = {}
    for i, ws in toks.items():
        ll = math.log(uni[ws[0]] / total)
        for a, b in zip(ws, ws[1:]):
            ll += math.log(
                lam * (bgc[(a, b)] / ctx[a]) + (1.0 - lam) * (uni[b] / total)
            )
        mean = ll / len(ws)
        out[i] = (len(ws), round(mean, 4), round(math.exp(-mean), 4))
    return out


def test_bigram_lm_matches_python_twin(spark):
    """Interpolated bigram LM scores equal a transparent Python twin at 4dp;
    1-token docs score under the unigram model alone; repeated-context docs
    score higher than shuffled ones (the property a bigram model adds)."""
    import pytest

    from mcp_crawl4ai_rag_spark.operators.corpus_ops import (
        BIGRAM_LAM,
        bigram_lm_scores,
    )

    texts = {
        1: "the cat sat on the mat",
        2: "the dog",
        3: "rare unique tokens here",
        4: "the the the",
        5: "dog",
        6: "the cat sat on the mat the cat sat on the mat",
        7: "mat the on sat cat the mat the on sat cat the",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in bigram_lm_scores(docs).collect()}
    want = _py_bigram_lm(texts, BIGRAM_LAM)
    assert set(got) == set(want)
    for i, (n, mean, ppl) in want.items():
        assert got[i]["n_tokens"] == n
        assert got[i]["mean_logprob"] == pytest.approx(mean, abs=1e-9)
        assert got[i]["ppl"] == pytest.approx(ppl, abs=1e-9)
    # doc 6 repeats its bigrams verbatim; doc 7 has the same unigram bag but
    # scrambled contexts — the bigram model must prefer 6
    assert got[6]["mean_logprob"] > got[7]["mean_logprob"]

    # partition-invariance: values identical under a different partitioning
    got7 = {
        r["doc_id"]: r for r in bigram_lm_scores(docs.repartition(7)).collect()
    }
    assert all(
        got7[i]["mean_logprob"] == got[i]["mean_logprob"]
        and got7[i]["ppl"] == got[i]["ppl"]
        for i in got
    )

    # split-invariance: hot_k=0 (plain equi-joins) yields identical rows
    plain = {r["doc_id"]: r for r in bigram_lm_scores(docs, hot_k=0).collect()}
    assert all(
        plain[i]["mean_logprob"] == got[i]["mean_logprob"]
        and plain[i]["ppl"] == got[i]["ppl"]
        for i in got
    )


def test_bigram_lm_hot_cold_plan_shape(spark):
    """The three model joins route their Zipf-hot heads through broadcast
    joins: with auto-broadcast off, the plan must still contain
    BroadcastHashJoins (the explicit top-K hints) and no cartesian join
    beyond the documented 1-row corpus-total broadcast."""
    from mcp_crawl4ai_rag_spark.operators.corpus_ops import bigram_lm_scores

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        rows = []
        for i in range(2000):
            toks = ["the", "of"] * 5 + [f"u{i:05d}"] * 10
            rows.append((i, " ".join(toks)))
        docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
        scored = bigram_lm_scores(docs, hot_k=16)
        n = scored.count()
        assert n == 2000
        plan = scored._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "CartesianProduct" not in final
        # 1-row corpus-total broadcasts only (fll + bll branches)
        assert final.count("BroadcastNestedLoopJoin") <= 2
        assert "BroadcastHashJoin" in final, final[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _py_dsir(texts: dict[int, str], target_ids: set, n_buckets: int, s: float):
    """Transparent Python twin of dsir_log_weights + the Gumbel top-k key."""
    import math

    from mcp_crawl4ai_rag_spark.functions.hashing import py_md5int64

    def feats(t):
        ws = t.lower().split()
        fs = list(ws) + [a + "\x1f" + b for a, b in zip(ws, ws[1:])]
        return [py_md5int64("dsir:" + f) % n_buckets for f in fs]

    ct: dict[int, int] = {}
    cq: dict[int, int] = {}
    per_doc: dict[int, dict[int, int]] = {}
    for i, t in texts.items():
        d: dict[int, int] = {}
        for b in feats(t):
            d[b] = d.get(b, 0) + 1
            cq[b] = cq.get(b, 0) + 1
            if i in target_ids:
                ct[b] = ct.get(b, 0) + 1
        per_doc[i] = d
    ct_tot, cq_tot = sum(ct.values()), sum(cq.values())
    ks = s * n_buckets
    out = {}
    for i, d in per_doc.items():
        lw = 0.0
        for b, tf in d.items():
            lr = math.log((ct.get(b, 0) + s) / (ct_tot + ks)) - math.log(
                (cq.get(b, 0) + s) / (cq_tot + ks)
            )
            lw += tf * lr
        key = lw + -math.log(-math.log(_py_frac("dsir-g", i)))
        out[i] = (lw, key)
    return out


def test_dsir_matches_python_twin_and_selects_target_like(spark):
    """DSIR log-weights match the transparent twin; target-like docs score
    higher than off-distribution ones; Gumbel top-k selects exactly k rows
    and the selection is partition-invariant."""
    import pytest

    from mcp_crawl4ai_rag_spark.operators.corpus_ops import (
        dsir_log_weights,
        dsir_select,
    )

    # target style: 'alpha beta' docs; raw adds off-distribution noise docs
    texts = {}
    for i in range(40):
        texts[i] = f"alpha beta gamma delta token{i % 4}"
    for i in range(40, 80):
        texts[i] = f"zog{i} blarg{i} wump{i % 7} xyzzy plugh"
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    target = docs.where(F.col("doc_id") < 20)  # a slice of the alpha style
    want = _py_dsir(texts, set(range(20)), 4096, 1.0)

    got = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_log_weights(docs, target).collect()
    }
    assert set(got) == set(want)
    for i in got:
        assert got[i] == pytest.approx(want[i][0], rel=1e-9, abs=1e-9)
    # every alpha-style doc outweighs every noise doc
    assert min(got[i] for i in range(40)) > max(got[i] for i in range(40, 80))

    sel = dsir_select(docs, target, k=30)
    rows = {r["doc_id"]: r for r in sel.collect()}
    assert sum(1 for r in rows.values() if r["selected"]) == 30
    for i, r in rows.items():
        assert r["key"] == pytest.approx(want[i][1], rel=1e-9, abs=1e-9)
    # selection strongly favors the target-like half
    alpha_sel = sum(1 for i in range(40) if rows[i]["selected"])
    assert alpha_sel >= 25

    sel7 = {
        r["doc_id"]: r["selected"]
        for r in dsir_select(docs.repartition(7), target, k=30).collect()
    }
    assert sel7 == {i: r["selected"] for i, r in rows.items()}


def test_dsir_empty_doc_and_plan_shape(spark):
    """Featureless docs weigh 0.0; the scoring join against the K-bounded
    ratio table is a broadcast hash join even with auto-broadcast off, and
    no cartesian product appears beyond the 1-row totals broadcast."""
    from mcp_crawl4ai_rag_spark.operators.corpus_ops import dsir_log_weights

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        rows = [(i, f"tok{i % 5} alpha beta") for i in range(50)] + [(99, "")]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        target = docs.where(F.col("doc_id") % 5 == 0)
        lw = dsir_log_weights(docs, target)
        got = {r["doc_id"]: r["log_weight"] for r in lw.collect()}
        assert got[99] == 0.0
        assert len(got) == 51
        plan = lw._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "CartesianProduct" not in final
        assert "BroadcastHashJoin" in final, final[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_paragraph_dedup_first_occurrence_rule(spark):
    """Corpus-global paragraph dedup keeps exactly the first (doc_id, idx)
    occurrence of each paragraph, exempts empty lines, rebuilds documents
    in order, and is partition-invariant."""
    from mcp_crawl4ai_rag_spark.operators.corpus_ops import paragraph_dedup

    texts = {
        1: "SHARED HEAD\nbody one\n\ntail one",
        2: "SHARED HEAD\nbody two\n\ntail two",
        3: "body three\nSHARED HEAD\n\nbody three",  # dup within+across docs
        4: "",                                        # single empty para
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}

    # doc 1 is first everywhere — untouched
    assert got[1]["clean"] == texts[1] and got[1]["n_removed"] == 0
    # doc 2 loses SHARED HEAD (doc 1 owns it) but keeps its empty line
    assert got[2]["clean"] == "body two\n\ntail two"
    assert got[2]["n_removed"] == 1
    # doc 3 loses SHARED HEAD and its own repeated paragraph, keeps first copy
    assert got[3]["clean"] == "body three\n"
    assert got[3]["n_removed"] == 2
    # the all-empty doc survives as-is (empty paragraphs exempt)
    assert got[4]["clean"] == "" and got[4]["n_removed"] == 0

    got7 = {
        r["doc_id"]: (r["clean"], r["n_removed"])
        for r in paragraph_dedup(docs.repartition(7)).collect()
    }
    assert got7 == {i: (r["clean"], r["n_removed"]) for i, r in got.items()}


def test_paragraph_dedup_storm_plan_shape(spark):
    """A blank-template storm (one paragraph on every doc) must route its
    membership rows through the broadcast hot branch — no cartesian, and a
    BroadcastHashJoin present even with auto-broadcast disabled."""
    from mcp_crawl4ai_rag_spark.operators.corpus_ops import paragraph_dedup

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        docs = spark.createDataFrame(
            [(i, f"STORM PARA\nuniq {i}") for i in range(3000)],
            "doc_id long, text string",
        ).repartition(8)
        out = paragraph_dedup(docs, hot_k=8)
        rows = out.collect()
        assert len(rows) == 3000
        # exactly one STORM PARA survives corpus-wide
        n_with_storm = sum(1 for r in rows if "STORM PARA" in r["clean"])
        assert n_with_storm == 1
        assert sum(r["n_removed"] for r in rows) == 2999
        plan = out._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "CartesianProduct" not in final
        assert "BroadcastHashJoin" in final, final[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_semantic_contamination_matches_numpy_twin(spark):
    """Planted paraphrase-shaped eval copies (scaled+shifted embeddings)
    surface exactly their source train doc at threshold 0.9; sims match a
    numpy float64 twin at 4dp; the scan broadcasts eval (no shuffle
    exchange feeding the join)."""
    import numpy as np
    import pytest

    from mcp_crawl4ai_rag_spark.operators.corpus_ops import (
        semantic_contamination,
    )

    rng = np.random.default_rng(7)
    M = rng.normal(size=(60, 16)).astype(np.float32)
    train = spark.createDataFrame(
        [(i, [float(x) for x in M[i]]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    ev_rows = [
        (1000 + i, [float(x) for x in (0.95 * M[i].astype(np.float64) + 0.02)])
        for i in range(0, 60, 10)
    ]
    ev = spark.createDataFrame(ev_rows, "vec_id long, embedding array<double>")
    got = {
        (r["eval_id"], r["train_id"]): r["sim"]
        for r in semantic_contamination(train, ev, 0.9).collect()
    }
    # exactly the planted sources pair up
    assert set(got) == {(1000 + i, i) for i in range(0, 60, 10)}
    for (eid, tid), sim in got.items():
        a = M[tid].astype(np.float64)
        b = 0.95 * M[tid].astype(np.float64) + 0.02
        want = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        assert sim == pytest.approx(round(want, 4), abs=2e-4)


def test_dsir_degenerate_target_equals_raw(spark):
    """When target == raw, every bucket's log-ratio is exactly 0 (identical
    counts and totals fold to identical doubles), so all weights are 0.0
    and the selection reduces to pure Gumbel order — k rows still selected."""
    from mcp_crawl4ai_rag_spark.operators.corpus_ops import (
        dsir_log_weights,
        dsir_select,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta tok{i % 7}") for i in range(40)],
        "doc_id long, text string",
    )
    lw = {r["doc_id"]: r["log_weight"] for r in dsir_log_weights(docs, docs).collect()}
    assert set(lw.values()) == {0.0}
    sel = dsir_select(docs, docs, k=10)
    assert sel.where("selected").count() == 10


def test_paragraph_dedup_single_paragraph_docs(spark):
    """Documents without the separator degenerate to exact text dedup:
    the lowest-id holder of each distinct text survives intact, later
    holders lose their only (non-empty) paragraph."""
    from mcp_crawl4ai_rag_spark.operators.corpus_ops import paragraph_dedup

    docs = spark.createDataFrame(
        [(1, "same body"), (2, "same body"), (3, "other body")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in paragraph_dedup(docs).collect()}
    assert got[1]["clean"] == "same body" and got[1]["n_removed"] == 0
    assert got[2]["clean"] == "" and got[2]["n_removed"] == 1
    assert got[3]["clean"] == "other body" and got[3]["n_removed"] == 0


def _py_c4_line_keep(line: str) -> bool:
    import re

    return (
        re.search(r'[.!?"]\s*$', line) is not None
        and len(re.findall(r"\S+", line)) >= 5
        and "javascript" not in line.lower()
    )


def _py_c4(text: str):
    lines = text.split("\n")
    kept = [ln for ln in lines if _py_c4_line_keep(ln)]
    page_keep = (
        len(kept) >= 3
        and "lorem ipsum" not in text.lower()
        and "{" not in text
    )
    return "\n".join(kept), len(lines) - len(kept), page_keep


def test_c4_clean_matches_python_twin(spark):
    from mcp_crawl4ai_rag_spark.operators.corpus_ops import c4_clean

    texts = [
        # all-good page: three proper sentences
        "One good sentence sits right here today.\n"
        "Another good sentence sits right here too.\n"
        "A third good sentence closes the page nicely.",
        # boundary: exactly 5 words, ends in quote / ! / ?
        'He said it was "done."\nExactly five words sit here.\n'
        "Is five words enough here?\nFive words make it work!",
        # line drops: short, no terminal punct, javascript (any case)
        "A perfectly good first sentence ends here.\n"
        "Too short.\n"
        "this line never terminates with punctuation at all\n"
        "Please enable JavaScript to continue reading now.\n"
        "A perfectly good second sentence ends here.\n"
        "A perfectly good third sentence ends here.",
        # trailing whitespace after the terminal mark still keeps the line
        "Trailing space after the period stays in.   \n"
        "Another fine sentence appears right after that.\n"
        "And one more fine sentence for good measure.",
        # page drop: lorem ipsum (case-insensitive)
        "LoReM IpSuM dolor sit amet body filler.\n"
        "A good sentence sits right here today.\n"
        "Another good sentence sits right here too.\n"
        "A third good sentence closes the page nicely.",
        # page drop: brace (code page)
        "A good sentence mentions code = { } inline.\n"
        "Another good sentence sits right here too.\n"
        "A third good sentence closes the page nicely.",
        # page drop: only two lines survive
        "One surviving sentence sits right here today.\n"
        "Second surviving sentence sits right here too.\n"
        "short\nno punct",
        # empty lines are dropped as lines (0 words) but page survives
        "First of three good sentences sits here.\n\n"
        "Second of three good sentences sits here.\n\n"
        "Third of three good sentences sits here.",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["text"], r["n_removed"])
        for r in c4_clean(docs).collect()
    }
    expect = {}
    for i, t in enumerate(texts):
        clean, n_removed, keep = _py_c4(t)
        if keep:
            expect[i] = (clean, n_removed)
    assert got == expect
    # the planted drops actually dropped: pages 4, 5, 6 are gone
    assert set(got) == {0, 1, 2, 3, 7}
    # line-level excision visible: page 2 lost exactly 3 of its 6 lines
    assert got[2][1] == 3


def test_c4_clean_passthrough_columns_and_plan(spark):
    from mcp_crawl4ai_rag_spark.operators.corpus_ops import c4_clean

    docs = spark.createDataFrame(
        [
            (
                1,
                "srcA",
                "Keep this full sentence right here please.\n"
                "Keep this other full sentence here too.\n"
                "Keep one final full sentence here as well.",
            )
        ],
        "doc_id long, source string, text string",
    )
    out = c4_clean(docs)
    assert out.columns == ["doc_id", "source", "text", "n_removed"]
    row = out.collect()[0]
    assert row["source"] == "srcA" and row["n_removed"] == 0
    # one codegen projection + filter over the scan: no shuffle anywhere
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# token_budget_sample: per-source token budgets via distributed prefix sum
# ---------------------------------------------------------------------------


def _tb_twin(rows, budgets, default):
    """Pure-python twin: maximal hash-order prefix per source ≤ budget."""
    from mcp_crawl4ai_rag_spark.functions.hashing import py_md5int64

    out = {}
    by_src = {}
    for i, s, t in rows:
        by_src.setdefault(s, []).append((py_md5int64(f"tbudget:{i}"), i, t))
    for s, docs in by_src.items():
        b = budgets.get(s, default)
        cum = 0
        for _, i, t in sorted(docs):
            sz = len(t.split())
            out[i] = (cum, b is None or cum + sz <= b)
            cum += sz
    return out


def test_token_budget_sample_matches_python_twin(spark):
    from mcp_crawl4ai_rag_spark.operators.corpus_ops import token_budget_sample

    rows = [
        (i, f"src{i % 3}", " ".join(f"w{i}x{j}" for j in range(5 + i % 7)))
        for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    budgets = {"src0": 30, "src1": 0}
    got = {
        r["doc_id"]: (r["cum_before"], r["keep"])
        for r in token_budget_sample(docs, budgets, default_budget=45).collect()
    }
    want = _tb_twin(rows, budgets, 45)
    assert got == want
    # maximal-prefix semantics: kept docs of a source are a contiguous
    # hash-order prefix — no doc after the first drop is kept
    from mcp_crawl4ai_rag_spark.functions.hashing import py_md5int64

    for s in ("src0", "src2"):
        order = sorted(
            (py_md5int64(f"tbudget:{i}"), i) for i, src, _ in rows if src == s
        )
        keeps = [got[i][1] for _, i in order]
        assert keeps == sorted(keeps, reverse=True), (s, keeps)
    # src1 budget 0: nothing kept (all docs have > 0 tokens)
    assert not any(got[i][1] for i, s, _ in rows if s == "src1")


def test_token_budget_sample_unlimited_and_partition_invariance(spark):
    from mcp_crawl4ai_rag_spark.operators.corpus_ops import token_budget_sample

    rows = [
        (i, f"s{i % 2}", " ".join("t" for _ in range(10))) for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    # no budgets, no default: unlimited — everything kept
    out = token_budget_sample(docs, {}).collect()
    assert all(r["keep"] for r in out) and len(out) == 40
    # result invariant to input partitioning and cumsum partition count
    a = sorted(
        map(tuple, token_budget_sample(docs, {"s0": 55}, 75).collect())
    )
    b = sorted(
        map(
            tuple,
            token_budget_sample(
                docs.repartition(13), {"s0": 55}, 75, num_partitions=3
            ).collect(),
        )
    )
    assert a == b


def test_token_budget_twin_property_invariants():
    """Hypothesis sweep over the token-budget twin: the kept set is the
    maximal hash-order whole-doc prefix per source — kept token total never
    exceeds the budget, adding the first dropped doc always would, the
    kept set is append-stable (new ids never evict survivors when the
    budget doesn't change), and order within a source is id-deterministic."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mcp_crawl4ai_rag_spark.functions.hashing import py_md5int64

    def twin(rows, budget):
        order = sorted((py_md5int64(f"tbudget:{i}"), i, sz) for i, sz in rows)
        kept, cum = [], 0
        for _, i, sz in order:
            if cum + sz <= budget:
                kept.append(i)
            cum += sz
        return kept, order

    @settings(max_examples=200, deadline=None)
    @given(
        sizes=st.lists(st.integers(0, 500), min_size=1, max_size=40),
        budget=st.integers(0, 4000),
    )
    def check(sizes, budget):
        rows = list(enumerate(sizes))
        kept, order = twin(rows, budget)
        szof = dict(rows)
        total = sum(szof[i] for i in kept)
        assert total <= budget
        # maximal-prefix: kept is a contiguous prefix of the hash order,
        # and the first non-kept doc (if any) would overflow
        ids_in_order = [i for _, i, _ in order]
        assert kept == ids_in_order[: len(kept)]
        if len(kept) < len(ids_in_order):
            nxt = ids_in_order[len(kept)]
            # cum at the cut includes every doc before nxt (kept or not) —
            # recompute exactly as the operator defines it
            cum = sum(sz for _, i, sz in order[: len(kept)])
            assert cum + szof[nxt] > budget
        # append stability: new ids (disjoint range) never evict survivors
        # that still fit through an unchanged prefix — weaker but true
        # invariant: every kept doc whose hash precedes ALL new hashes stays
        new_rows = rows + [(1000 + j, 7) for j in range(3)]
        kept2, _ = twin(new_rows, budget)
        min_new = min(py_md5int64(f"tbudget:{1000 + j}") for j in range(3))
        for i in kept:
            if py_md5int64(f"tbudget:{i}") < min_new:
                assert i in kept2

    check()
