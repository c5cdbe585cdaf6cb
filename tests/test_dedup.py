"""Dedup operators: exact fingerprint, MinHash+LSH, SimHash.

Differential strategy: each Spark result is checked against a plain-Python
oracle implementing the same published algorithm over the same md5-derived
hashes (functions/hashing.py guarantees hash parity across engines)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from mcp_crawl4ai_rag_spark.functions.hashing import md5int64, py_md5int64
from mcp_crawl4ai_rag_spark.operators.dedup import (
    MINHASH_PERMS,
    exact_dedup_groups,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash_docs,
    simhash_pairs,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "the quick brown fox jumps over the lazy dog near the river bend"),
    (2, "completely different words about spark partitions and shuffles here"),
    (3, "the quick brown fox jumps over the lazy dog near the river bank"),  # dup of 0
    (4, "words about spark partitions and shuffles here but reordered text"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_tokens(text):
    return text.lower().split()


def _py_shingles(text, k=3):
    w = _py_tokens(text)
    idx = range(0, max(len(w) - k, 0) + 1)
    return list(dict.fromkeys(" ".join(w[i : i + k]) for i in idx))


def test_md5int64_parity(spark):
    df = spark.createDataFrame([("abc",), ("",), ("héllo wörld",)], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", md5int64(F.col("s")).alias("h")).collect()}
    for s, h in got.items():
        assert h == py_md5int64(s)
        assert h == int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_exact_dedup_groups(docs_df):
    rows = {r["canonical_id"]: r["n_docs"] for r in exact_dedup_groups(docs_df).collect()}
    assert rows[0] == 2  # docs 0 and 3 identical
    assert 3 not in rows  # represented by canonical 0
    assert rows[1] == 1 and rows[2] == 1 and rows[4] == 1


def test_minhash_signature_matches_python_oracle(docs_df):
    from mcp_crawl4ai_rag_spark.functions.hashing import py_md5int56
    from mcp_crawl4ai_rag_spark.operators.dedup import MINHASH_MOD

    sigs = {r["doc_id"]: r for r in minhash_signatures(docs_df).collect()}
    for doc_id, text in DOCS:
        sh = _py_shingles(text)
        draws = [(py_md5int56(f"mhA:{s}"), py_md5int56(f"mhB:{s}")) for s in sh]
        for p in range(MINHASH_PERMS):
            expected = min((h1 + p * h2) % MINHASH_MOD for h1, h2 in draws)
            assert sigs[doc_id][f"m{p}"] == expected, (doc_id, p)


def test_minhash_lsh_finds_dups_with_exact_jaccard(docs_df):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in minhash_lsh_pairs(docs_df).collect()}
    # identical docs always collide in every band, jaccard 1.0
    assert pairs[(0, 3)] == 1.0
    # near-identical docs (one word changed) collide with high jaccard
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.7
    # jaccard values are the exact set jaccard
    for (a, b), j in pairs.items():
        sa, sb = set(_py_shingles(dict(DOCS)[a])), set(_py_shingles(dict(DOCS)[b]))
        assert j == round(len(sa & sb) / len(sa | sb), 4)


def _py_simhash(text, bits=32):
    toks = list(dict.fromkeys(_py_tokens(text)))
    val = 0
    for k in range(bits):
        s = sum(1 if (py_md5int64(f"sh:{t}") >> k) & 1 else -1 for t in toks)
        if s > 0:
            val |= 1 << k
    return val


def test_simhash_matches_python_oracle(docs_df):
    got = {r["doc_id"]: r["simhash"] for r in simhash_docs(docs_df).collect()}
    for doc_id, text in DOCS:
        assert got[doc_id] == _py_simhash(text), doc_id


def test_simhash_pairs_equals_bruteforce(docs_df):
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_pairs(docs_df).collect()}
    sims = {d: _py_simhash(t) for d, t in DOCS}
    expected = {}
    ids = sorted(sims)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(sims[a] ^ sims[b]).count("1")
            if h <= 3:
                expected[(a, b)] = h
    assert got == expected
    assert got[(0, 3)] == 0  # identical docs


def test_minhash_lsh_hot_band_skew(spark):
    """Boilerplate skew stress: one band key holds 25% of the corpus (100
    identical docs → every band collides). The banded candidate join must
    stay an equi-join (never a cartesian/nested-loop product), complete
    under AQE with broadcast disabled (the 10^9-doc plan shape), and
    produce exactly C(100,2) jaccard-1.0 pairs for the hot group."""
    from pyspark.sql import functions as F

    from mcp_crawl4ai_rag_spark.operators.dedup import minhash_lsh_pairs

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
    }
    old = {}
    for k, v in confs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        boiler = "the quick brown fox jumps over the lazy dog again and again"
        docs = spark.range(0, 400, 1, 8).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 4 == 0, F.lit(boiler))
            .otherwise(
                F.concat(
                    F.lit("unique document number "),
                    F.col("id").cast("string"),
                    F.lit(" with distinct trailing words alpha beta gamma "),
                    (F.col("id") * 7919).cast("string"),
                )
            )
            .alias("text"),
        )
        pairs = minhash_lsh_pairs(docs, min_jaccard=0.99)
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        hot = pairs.where(
            (F.col("id_a") % 4 == 0) & (F.col("id_b") % 4 == 0)
        ).count()
        assert hot == 100 * 99 // 2  # all boilerplate pairs found, once each
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)


def test_hamming_pairs_generic_negative_hashes(spark):
    # signed 64-bit hashes with high bit set: sign-extending shifts must not
    # corrupt chunk values; brute-force differential over a planted set
    from mcp_crawl4ai_rag_spark.operators.dedup import hamming_pairs

    vals = [
        (1, -0x7FF0_0000_0000_0001),
        (2, -0x7FF0_0000_0000_0001),        # identical to 1
        (3, -0x7FF0_0000_0000_0001 ^ 0b101),  # hamming 2 from 1/2
        (4, 0x0123_4567_89AB_CDEF),
        (5, 0x0123_4567_89AB_CDEF - (1 << 63)),  # bit63 set: hamming 1 from 4
        (6, 0x7FFF_FFFF_FFFF_FFFF),
    ]
    df = spark.createDataFrame(vals, "vid long, hv long")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_pairs(df, "vid", "hv", max_hamming=4).collect()
    }
    expected = {}
    for i in range(len(vals)):
        for j in range(i + 1, len(vals)):
            h = bin((vals[i][1] ^ vals[j][1]) & (2**64 - 1)).count("1")
            if h <= 4:
                expected[(vals[i][0], vals[j][0])] = h
    assert got == expected
    assert (1, 2) in got and got[(1, 2)] == 0
    assert got[(4, 5)] == 1


def test_hamming_pairs_dedupe_identical_star_and_equivalence(spark):
    """dedupe_identical contract: identical-hash clusters become star edges
    around the min id (linear), cross-hash pairs run rep-to-rep — and the
    resulting components are IDENTICAL to the clique contract's."""
    from mcp_crawl4ai_rag_spark.operators.components import (
        connected_components,
    )
    from mcp_crawl4ai_rag_spark.operators.dedup import hamming_pairs

    # group A: ids 10,11,12 share a hash; group B: ids 20,21 share a hash
    # at hamming 2 from A's; id 30 isolated (far hash)
    ha = 0x0123_4567_89AB_CDEF
    hb = ha ^ 0b101
    vals = [(10, ha), (11, ha), (12, ha), (20, hb), (21, hb), (30, -1)]
    df = spark.createDataFrame(vals, "vid long, hv long")
    star = hamming_pairs(
        df, "vid", "hv", max_hamming=4, dedupe_identical=True
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in star}
    # star edges around min ids + ONE rep-level cross pair — 5 edges, not
    # the clique's C(3,2)+C(2,2)... = 3+1+6 = 10 qualifying pairs
    assert got == {
        (10, 11): 0,
        (10, 12): 0,
        (20, 21): 0,
        (10, 20): 2,
    }
    clique = hamming_pairs(df, "vid", "hv", max_hamming=4).collect()
    assert len(clique) == 10  # C(5,2) over the two near groups

    def comps(pairs):
        edges = spark.createDataFrame(
            [(r["id_a"], r["id_b"]) for r in pairs], "id_a long, id_b long"
        )
        return {
            (r["vid"], r["component_id"])
            for r in connected_components(edges, id_col="vid").collect()
        }

    assert comps(star) == comps(clique)


def test_phash_pairs_identical_hash_cluster_linear(spark):
    """Web-scale hazard: 5000 blank images on ONE phash. The clique
    contract would emit C(5000,2) ≈ 12.5M pairs; dedupe_identical must
    emit exactly 4999 star edges plus the planted cross pair."""
    from pyspark.sql import functions as F

    from mcp_crawl4ai_rag_spark.operators.dedup import phash_pairs

    blank = spark.range(0, 5000).select(
        F.format_string("blank_%06d", F.col("id")).alias("image_id"),
        F.lit(0x00FF_00FF_00FF_00FF).alias("phash"),
    )
    near = spark.createDataFrame(
        [("near_000000", 0x00FF_00FF_00FF_00FE)],
        "image_id string, phash long",
    )
    out = phash_pairs(
        blank.unionByName(near), max_hamming=4, dedupe_identical=True
    )
    rows = out.collect()
    assert len(rows) == 5000  # 4999 star + 1 rep-level cross
    stars = [r for r in rows if r["hamming"] == 0]
    assert len(stars) == 4999
    assert all(r["id_a"] == "blank_000000" for r in stars)
    (cross,) = [r for r in rows if r["hamming"] > 0]
    assert (cross["id_a"], cross["id_b"], cross["hamming"]) == (
        "blank_000000",
        "near_000000",
        1,
    )


def test_phash_pairs_finds_transcoded_twins(spark):
    from mcp_crawl4ai_rag_spark.functions.images import transcode_images
    from mcp_crawl4ai_rag_spark.operators.dedup import phash_pairs
    from mcp_crawl4ai_rag_spark.sources.corpus import gen_images

    imgs = gen_images(spark, 40, partitions=2)
    twins = transcode_images(imgs, "png").select(
        F.concat(F.lit("dup_"), F.col("image_id")).alias("image_id"), "phash"
    )
    pairs = phash_pairs(
        imgs.select("image_id", "phash").unionByName(twins), max_hamming=4
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    # lossless transcode -> every image pairs with its twin at hamming 0
    for i in range(40):
        assert got[(f"dup_img_{i:012d}", f"img_{i:012d}")] == 0


def test_phash_incremental_differential_and_append(spark, tmp_path):
    """phash_pairs_incremental == full-corpus phash_pairs restricted to
    (indexed, new) cross pairs; appending the batch's keys makes the next
    increment see it — the minhash_pairs_incremental contract, mirrored."""
    from pyspark.sql import functions as F

    from mcp_crawl4ai_rag_spark.operators.dedup import (
        phash_pairs,
        phash_pairs_incremental,
        phash_write_index,
    )

    def hashes(ids_and_hv):
        return spark.createDataFrame(ids_and_hv, "image_id string, phash long")

    base_hv = 0x0123_4567_89AB_CDEF
    old = hashes(
        [(f"old_{i:03d}", base_hv ^ (1 << (i % 60))) for i in range(40)]
    )
    # batch 1: twins of every 4th old image (hamming 0 vs that old row,
    # hamming ≤ 2 vs some others), plus far-away hashes
    new1 = hashes(
        [(f"new1_{i:03d}", base_hv ^ (1 << (i % 60))) for i in range(0, 40, 4)]
        + [(f"new1_far_{i}", -(1 << 62) + i * 0x1_0001_0001) for i in range(5)]
    )
    idx = str(tmp_path / "phash_idx")
    phash_write_index(old, idx)

    inc = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_pairs_incremental(spark, idx, new1).collect()
    }
    full = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_pairs(old.unionByName(new1), max_hamming=4).collect()
        if (r["id_a"].startswith("old_")) != (r["id_b"].startswith("old_"))
    }
    # full pairs order id_a < id_b lexicographically (new1_* < old_*);
    # incremental orders (indexed, new) — normalize before comparing
    assert {tuple(sorted(k)): v for k, v in inc.items()} == {
        tuple(sorted(k)): v for k, v in full.items()
    }
    assert all(a.startswith("old_") and b.startswith("new1_") for a, b in inc)

    # append batch 1's keys; batch 2 must now pair against batch 1 too
    phash_write_index(new1, idx, mode="append")
    new2 = hashes([("new2_000", base_hv)])  # hamming 1 to several
    inc2 = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_pairs_incremental(spark, idx, new2).collect()
    }
    assert ("old_000", "new2_000") in inc2
    assert ("new1_000", "new2_000") in inc2 and inc2[("new1_000", "new2_000")] == 1


def test_transcode_jpeg_phash_stays_close(spark):
    # lossy transcode of a png original: decoded pixels change within the
    # quantization step, phash must stay within a small hamming ball
    from mcp_crawl4ai_rag_spark.functions.images import transcode_images
    from mcp_crawl4ai_rag_spark.sources.corpus import gen_images

    imgs = gen_images(spark, 30, partitions=2).where(F.col("fmt") == "png")
    tw = transcode_images(imgs, "jpeg").select("image_id", F.col("phash").alias("p2"))
    joined = imgs.select("image_id", "phash").join(tw, "image_id")
    ham = joined.select(
        F.bit_count(F.col("phash").bitwiseXOR(F.col("p2"))).alias("h")
    ).agg(F.max("h")).head()[0]
    assert ham <= 8  # quantization flips at most a few mean-threshold bits


def test_minhash_incremental_matches_full_restriction(spark, tmp_path):
    # incremental old×new pairs must equal the full self-join pairs
    # restricted to the old/new boundary
    from mcp_crawl4ai_rag_spark.operators.dedup import (
        minhash_pairs_incremental,
        minhash_write_index,
    )

    old = spark.range(0, 60).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("shared prefix words for minhash testing number "),
            F.col("id").cast("string"),
            F.lit(" tail alpha beta gamma delta epsilon"),
        ).alias("text"),
    )
    # increment: near-dups of every 3rd old doc + some fresh docs
    new = old.where(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.expr("substring(text, 8)").alias("text"),
    )
    idx = str(tmp_path / "mh_idx")
    minhash_write_index(old, idx)
    inc = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_pairs_incremental(spark, idx, old, new).collect()
    }
    full = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(old.unionByName(new)).collect()
        if r["id_a"] < 1000 and r["id_b"] >= 1000
    }
    assert inc == full
    assert len(inc) > 0


def test_minhash_index_append_roundtrip(spark, tmp_path):
    from mcp_crawl4ai_rag_spark.operators.dedup import minhash_write_index

    docs = spark.range(0, 10).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("w x y z doc "), F.col("id").cast("string")).alias("text"),
    )
    idx = str(tmp_path / "idx")
    minhash_write_index(docs.where("doc_id < 5"), idx)
    minhash_write_index(docs.where("doc_id >= 5"), idx, mode="append")
    got = spark.read.parquet(idx)
    assert got.select("doc_id").distinct().count() == 10
    assert got.count() == 40  # 10 docs x 4 bands


def test_repeated_spans_matches_python(spark):
    from mcp_crawl4ai_rag_spark.operators.dedup import repeated_spans

    # doc 1 and 2 share tokens 5..14 of doc 1 (planted); doc 3 is unique;
    # doc 4 repeats a window twice WITHIN itself
    base = [f"w{i}" for i in range(30)]
    shared = base[5:15]
    docs_py = {
        1: base,
        2: [f"x{i}" for i in range(4)] + shared + [f"y{i}" for i in range(6)],
        3: [f"z{i}" for i in range(25)],
        4: [f"q{i}" for i in range(3)] + ["r0", "r1", "r2", "r3", "r4"] * 2 + ["tail"],
    }
    k = 5
    df = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in docs_py.items()], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"]): r["n_windows"]
        for r in repeated_spans(df, k=k).collect()
    }

    # python reference: same hashing irrelevant — windows compare by content
    from collections import Counter

    win = {
        d: [" ".join(t[i : i + k]) for i in range(len(t) - k + 1)]
        for d, t in docs_py.items()
    }
    counts = Counter(w for ws in win.values() for w in ws)
    expected = {}
    for d, ws in win.items():
        dup = [i for i, w in enumerate(ws) if counts[w] >= 2]
        # merge: extend the current span while the gap between duplicated
        # window starts is <= k, else begin a new one
        merged = []
        for i in dup:
            if merged and i - merged[-1][1] <= k:
                merged[-1] = (merged[-1][0], i, merged[-1][2] + 1)
            else:
                merged.append((i, i, 1))
        for s, e, n in merged:
            expected[(d, s, e + k)] = n
    assert got == expected
    # sanity on the planted structure
    assert (1, 5, 15) in got and (2, 4, 14) in got
    assert not any(d == 3 for d, _, _ in got)


def test_remove_spans_applies_and_passes_through(spark):
    from mcp_crawl4ai_rag_spark.operators.dedup import remove_spans

    docs = spark.createDataFrame(
        [
            (1, "A B C D E F G H"),
            (2, "Keep  original   WHITESPACE untouched"),
            (3, "X Y Z"),
        ],
        "doc_id long, text string",
    )
    spans = spark.createDataFrame(
        # doc 1: remove tokens [2,5) and [6,8) ; doc 3: remove everything
        [(1, 2, 5), (1, 6, 8), (3, 0, 3)],
        "doc_id long, span_start long, span_end long",
    )
    got = {r["doc_id"]: r for r in remove_spans(docs, spans).collect()}
    assert got[1]["clean"] == "A B F" and got[1]["n_tokens_removed"] == 5
    # no spans -> byte-identical original text, odd whitespace and all
    assert got[2]["clean"] == "Keep  original   WHITESPACE untouched"
    assert got[2]["n_tokens_removed"] == 0
    assert got[3]["clean"] == "" and got[3]["n_tokens_removed"] == 3


def test_remove_spans_roundtrip_with_detector(spark):
    from mcp_crawl4ai_rag_spark.operators.dedup import remove_spans, repeated_spans

    base = " ".join(f"w{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, base), (2, base + " extra unique suffix here")],
        "doc_id long, text string",
    )
    spans = repeated_spans(docs, k=10)
    out = {r["doc_id"]: r for r in remove_spans(docs, spans).collect()}
    # the shared 30-token prefix is excised from both docs
    assert out[1]["clean"] == "" and out[1]["n_tokens_removed"] == 30
    assert out[2]["clean"] == "extra unique suffix here"
    assert out[2]["n_tokens_removed"] == 30


def test_phash_incremental_dedupe_identical_is_linear_and_equivalent(spark, tmp_path):
    """A hot phash (the blank/template-image storm) must cost O(cluster)
    edges through the incremental path, not |old|x|new| pairs — and the
    component structure must match the default-contract run."""
    from pyspark.sql import functions as F

    from mcp_crawl4ai_rag_spark.operators.dedup import (
        phash_pairs_incremental,
        phash_write_index,
    )

    HOT = 0x7777_0000_1234_5678

    def hashes(rows):
        return spark.createDataFrame(rows, "image_id string, phash long")

    old = hashes(
        [(f"old_{i:03d}", HOT) for i in range(50)]  # 50 identical old
        + [("old_far", -(1 << 61))]
    )
    new = hashes(
        [(f"new_{i:03d}", HOT) for i in range(20)]  # 20 identical new
        + [("new_near", HOT ^ 1)]  # hamming 1 to the hot cluster
    )
    idx = str(tmp_path / "hotidx")
    phash_write_index(old, idx, dedupe_identical=True)
    pairs = phash_pairs_incremental(
        spark, idx, new, dedupe_identical=True
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    # linear: 19 in-batch star edges + 1 rep-to-stored-rep hamming-0 pair
    # + 1 near pair — NOT 50*20=1000 cross pairs
    assert len(got) == 21, sorted(got)
    assert got[("old_000", "new_000")] == 0  # stored rep x new rep
    assert got[("old_000", "new_near")] == 1
    for i in range(1, 20):
        assert got[("new_000", f"new_{i:03d}")] == 0  # in-batch star
    # component equivalence: hot cluster old+new all connected through reps
    ids = {x for k in got for x in k}
    assert "old_far" not in ids


# ---------------------------------------------------------------------------
# neardup_recall: the text near-dup recall harness (measured banding recall
# vs exact-Jaccard truth — the evidence loop for the MinHash index)
# ---------------------------------------------------------------------------


def _jac(a: str, b: str, k: int = 3) -> float:
    def sh(t):
        w = t.lower().split()
        return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}

    sa, sb = sh(a), sh(b)
    if not sa | sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def _ndr_corpus():
    # 30 base docs of distinct content + exact twins of every 3rd doc
    # (jaccard 1.0 — banding MUST catch these) + one unrelated doc
    base = [
        (i, " ".join(f"tok{i}w{j}" for j in range(25))) for i in range(30)
    ]
    twins = [(i + 1000, t) for i, t in base if i % 3 == 0]
    return base + twins


def test_neardup_recall_truth_and_recall_match_python(spark):
    from mcp_crawl4ai_rag_spark.operators.dedup import (
        exact_jaccard_neighbors,
        neardup_recall,
    )

    rows = _ndr_corpus()
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    samp = docs.where(F.col("doc_id") >= 1000).select("doc_id")

    truth = {
        (r["qid"], r["did"]): r["jaccard"]
        for r in exact_jaccard_neighbors(docs, samp, 0.5).collect()
    }
    # python truth: exact jaccard >= 0.5 from each twin to every other doc
    want = {}
    txt = dict(rows)
    for q in txt:
        if q < 1000:
            continue
        for d in txt:
            if d != q:
                j = round(_jac(txt[q], txt[d]), 4)
                if j >= 0.5:
                    want[(q, d)] = j
    assert truth == want and want  # non-vacuous: each twin sees its base

    out = {r["qid"]: r for r in neardup_recall(docs, samp, 0.5).collect()}
    assert set(out) == {q for q, _ in want}
    for q, r in out.items():
        n_true = sum(1 for (qq, _) in want if qq == q)
        assert r["n_true"] == n_true
        assert 0 <= r["n_found"] <= n_true
        assert r["recall"] == round(r["n_found"] / n_true, 4)
    # exact twins share every band key — recall must be 1.0 on this corpus
    assert all(r["recall"] == 1.0 for r in out.values()), out


def test_neardup_recall_found_is_subset_of_truth(spark):
    from mcp_crawl4ai_rag_spark.operators.dedup import neardup_recall

    # perturbed twins: drop the last 10 tokens — jaccard ~0.65, banding may
    # or may not catch each one, but n_found can never exceed n_true
    base = [
        (i, " ".join(f"w{i}x{j}" for j in range(40))) for i in range(20)
    ]
    twins = [
        (i + 1000, " ".join(t.split()[:-10])) for i, t in base if i % 2 == 0
    ]
    docs = spark.createDataFrame(base + twins, "doc_id long, text string")
    samp = docs.where(F.col("doc_id") >= 1000).select("doc_id")
    out = neardup_recall(docs, samp, 0.5).collect()
    assert out
    for r in out:
        assert r["n_found"] <= r["n_true"]
        assert 0.0 <= r["recall"] <= 1.0
