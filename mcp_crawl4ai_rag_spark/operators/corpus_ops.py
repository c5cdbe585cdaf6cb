"""Corpus-preparation operators for training-data pipelines: deterministic
train/val/test splits, vocabulary building, and train/eval contamination
detection.

No counterpart in the reference (it stops at chunk+embed+store); these are
SURVEY.md training-data first-class additions. All three are pure
DataFrame-op compositions with md5-derived hashes (functions/hashing.py) so
an independent ANSI-SQL oracle reproduces every value bit-for-bit.

Scale shape
-----------
- hash_split: one stateless projection — no shuffle, no sampling pass, and
  membership of a row is a pure function of (salt, id), so the split is
  stable under re-runs, partition changes, and incremental appends (a
  re-crawled doc keeps its assignment). This is the property random split
  columns lose at 100 TB.
- vocab_topk: explode → groupBy(token) with map-side combine (partial
  counts per partition ⇒ the shuffle carries one row per distinct token per
  partition, not one per occurrence) → TakeOrderedAndProject for the top-k
  (no global sort).
- contamination: the canonical 13-gram membership test (GPT-3 appendix-C
  style). Shingle hashes are equi-joined — candidate generation is a hash
  join keyed on the 60-bit shingle hash, never a cross join. The eval side
  is typically tiny (a benchmark suite); Spark broadcasts it under AQE. Per
  (eval, train) overlap counts aggregate map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5int64
from ..functions.text import word_shingles_expr, words_expr

# 2^60: md5int64 yields 15 hex digits = 60 bits, uniform on [0, 2^60).
_HASH_SPACE = float(1 << 60)


def split_fraction_expr(id_col: Column | str, salt: str) -> Column:
    """Deterministic uniform draw in [0,1) from (salt, id) — the md5-derived
    60-bit integer scaled down. Identical in Spark/DuckDB/Python."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return md5int64(
        F.concat(F.lit(salt + ":"), c.cast("string"))
    ).cast("double") / F.lit(_HASH_SPACE)


def sql_split_fraction(id_expr: str, salt: str) -> str:
    """DuckDB twin of :func:`split_fraction_expr`."""
    from ..functions.hashing import sql_md5int64

    h = sql_md5int64(f"'{salt}:' || CAST({id_expr} AS VARCHAR)")
    return f"(CAST({h} AS DOUBLE) / {_HASH_SPACE})"


def hash_split(
    docs: DataFrame,
    weights: dict[str, float],
    salt: str = "split",
    id_col: str = "doc_id",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a deterministic split label with the given weights.

    The label is a pure function of (salt, id): stable across re-runs and
    appends, and changing the salt re-rolls every assignment (for k-fold
    style re-splits). Weights are normalized; iteration order of ``weights``
    fixes the interval layout, so pass an ordered dict.
    """
    total = sum(weights.values())
    frac = split_fraction_expr(id_col, salt)
    out: Column | None = None
    cum = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        cum += w / total
        cond = frac < F.lit(cum)
        out = F.when(cond, F.lit(name)) if out is None else out.when(cond, F.lit(name))
    last = F.lit(items[-1][0])
    out = last if out is None else out.otherwise(last)
    return docs.withColumn(out_col, out)


def vocab_topk(
    docs: DataFrame,
    k: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k vocabulary: (token, tf, df) — term frequency (total
    occurrences) and document frequency — ordered by tf desc, token asc
    (deterministic tie-break). groupBy is map-side combined;
    the top-k is a TakeOrderedAndProject, not a global sort."""
    from ..functions.text import words_expr

    toks = docs.select(
        F.col(id_col), F.explode(words_expr(F.col(text_col))).alias("token")
    )
    counts = toks.groupBy("token").agg(
        F.count("*").alias("tf"),
        F.countDistinct(id_col).alias("df"),
    )
    return counts.orderBy(F.col("tf").desc(), F.col("token").asc()).limit(k)


def strip_boilerplate(
    docs: DataFrame,
    min_host_pages: int = 3,
    frac_threshold: float = 0.5,
    id_col: str = "doc_id",
    host_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(id, host, clean, n_removed): remove per-host boilerplate — lines
    (nav, footer, cookie banner) that appear on ≥ ``frac_threshold`` of a
    host's pages, for hosts with ≥ ``min_host_pages`` pages. The standard
    line-frequency boilerplate pass of a crawl cleaning pipeline.

    Scale shape: one explode → per-(host, line) distinct-page counts
    (map-side combined) → the boilerplate line set is a small per-host
    table joined back with a left-anti equi-join on (host, line) — never
    per-row Python, never a cross join. Reconstruction re-joins surviving
    lines in original order via sort-within-group (array_sort on (pos,
    line) structs), so the output text is deterministic."""
    lines = docs.select(
        F.col(id_col),
        F.col(host_col).alias("__host"),
        F.posexplode(F.split(F.col(text_col), F.lit("\n"))).alias(
            "__pos", "__line"
        ),
    )
    host_sizes = docs.groupBy(F.col(host_col).alias("__host")).agg(
        F.countDistinct(id_col).alias("__total")
    )
    line_counts = (
        lines.where(F.length("__line") > 0)
        .groupBy("__host", "__line")
        .agg(F.countDistinct(id_col).alias("__n"))
    )
    boiler = (
        line_counts.join(host_sizes, "__host")
        .where(
            (F.col("__total") >= min_host_pages)
            & (
                F.col("__n").cast("double")
                >= F.lit(frac_threshold) * F.col("__total").cast("double")
            )
        )
        .select("__host", "__line")
    )
    from ..functions.text import ordered_rebuild_agg

    kept = lines.join(boiler, ["__host", "__line"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        ordered_rebuild_agg("__pos", "__line", "\n").alias("clean"),
        F.count("*").alias("__kept_lines"),
    )
    orig_lines = lines.groupBy(id_col).agg(F.count("*").alias("__orig_lines"))
    # left joins from the full doc set: an all-boilerplate page survives
    # with empty text, and a NULL-text page (split yields no rows at all)
    # survives as clean='' / n_removed=0 instead of silently disappearing
    return (
        docs.select(F.col(id_col), F.col(host_col))
        .join(rebuilt, id_col, "left")
        .join(orig_lines, id_col, "left")
        .select(
            F.col(id_col),
            F.col(host_col),
            F.coalesce(F.col("clean"), F.lit("")).alias("clean"),
            (
                F.coalesce(F.col("__orig_lines"), F.lit(0))
                - F.coalesce(F.col("__kept_lines"), F.lit(0))
            )
            .cast("long")
            .alias("n_removed"),
        )
    )


def mix_corpus(
    docs: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    salt: str = "mix",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Deterministic corpus mixing: emit each row ``rate`` times in
    expectation — the per-domain up/down-weighting step of a pretraining
    data recipe. rate < 1 down-samples; rate > 1 up-weights by duplication
    (floor(rate) guaranteed copies plus one more with probability
    frac(rate)). The copy count is a pure function of (salt, id), so the
    mix is reproducible, stable under appends, and re-rollable by changing
    the salt. One stateless projection + bounded explode — no shuffle, no
    sampling pass; the rate table is a literal map (a broadcast join for
    corpus-scale rate tables drops in trivially)."""
    rate_map = F.create_map(
        *[F.lit(x) for kv in rates.items() for x in kv]
    )
    rate = F.coalesce(
        rate_map[F.col(source_col)], F.lit(float(default_rate))
    )
    frac = split_fraction_expr(id_col, salt)
    n_copies = (
        F.floor(rate).cast("long")
        + (frac < (rate - F.floor(rate))).cast("long")
    )
    return (
        docs.withColumn("__n_copies", n_copies)
        .where(F.col("__n_copies") > 0)
        .withColumn(
            "__copy", F.explode(F.sequence(F.lit(1), F.col("__n_copies")))
        )
        .drop("__n_copies", "__copy")
    )


def temperature_rates(
    counts: dict[str, int], alpha: float, budget: int | None = None
) -> dict[str, float]:
    """α-tempered per-source sampling rates — the mT5/PaLM multilingual
    mixing rule: sample source s with probability p_s ∝ n_s^α (α < 1 damps
    head sources, boosts tail ones; α=1 is natural, α=0 uniform), then
    rate_s = budget·p_s / n_s so the mixed corpus totals ``budget`` rows in
    expectation (default: the input size — a pure re-balance).

    Driver-side on purpose: the source histogram is K-bounded (thousands of
    sources against 10^10 docs), and keeping the one transcendental (**α)
    in Python means the engine and any oracle call THIS function and get
    bit-identical doubles — no cross-engine pow() ULP drift. All folds run
    in sorted-source order so the result is independent of dict order.
    """
    srcs = sorted(counts)
    w = [float(counts[s]) ** alpha for s in srcs]
    tot = 0.0
    for x in w:
        tot += x
    if budget is None:
        b = 0
        for s in srcs:
            b += counts[s]
        budget = b
    return {
        s: (float(budget) * (wi / tot)) / float(counts[s])
        for s, wi in zip(srcs, w)
    }


def temperature_mix(
    docs: DataFrame,
    alpha: float,
    budget: int | None = None,
    salt: str = "tmix",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Temperature-based corpus re-balancing: compute the per-source
    histogram (one map-side-combinable groupBy on a low-cardinality key,
    K rows collected), derive α-tempered rates with
    :func:`temperature_rates`, and apply them through :func:`mix_corpus` —
    tail sources upsample by deterministic duplication (rate > 1), head
    sources downsample (rate < 1), all membership a pure function of
    (salt, id). Unknown-at-histogram-time sources can't exist (the
    histogram IS the data), so the default rate is 0."""
    counts = {
        r[source_col]: r["n"]
        for r in docs.groupBy(source_col)
        .agg(F.count("*").alias("n"))
        .collect()
    }
    rates = temperature_rates(counts, alpha, budget)
    return mix_corpus(
        docs,
        rates,
        default_rate=0.0,
        salt=salt,
        id_col=id_col,
        source_col=source_col,
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> DataFrame:
    """(pack_id, id, slice_start, slice_len, pack_pos): the GPT-style
    concat-then-split packing schedule — documents are laid out end-to-end
    in ``id_col`` order (a stable total order) and the token stream is cut
    into fixed ``seq_len`` windows. A document crossing a boundary is split
    across consecutive packs; every pack except the last is exactly full.

    Token counts use the BPE-ish pre-tokenizer (functions/text.py), so the
    schedule is reproducible by the SQL oracle. The layout needs a global
    prefix sum, computed with operators/ordering.distributed_cumsum — NOT a
    single-task window — so the schedule stage scales to corpus size; the
    per-doc pack expansion is a bounded explode (ceil(tok/seq_len)+1 rows).
    """
    from ..functions.text import token_count_bpe
    from .ordering import distributed_cumsum

    toks = docs.select(
        F.col(id_col), token_count_bpe(F.col(text_col)).alias("tok")
    ).where(F.col("tok") > 0)
    laid = distributed_cumsum(
        toks, [id_col], "tok", out_col="cum", num_partitions=num_partitions
    )
    L = F.lit(seq_len)
    # integer DIV (not float /): float64 division is exact only below 2^53
    # cumulative tokens — a petatoken corpus overflows that, and the DuckDB
    # oracle's `//` is integer from the start
    first = F.expr(f"cum DIV {int(seq_len)}")
    last = F.expr(f"(cum + tok - 1) DIV {int(seq_len)}")
    out = laid.select(
        F.col(id_col),
        "tok",
        "cum",
        F.explode(F.sequence(first, last)).alias("pack_id"),
    ).select(
        "pack_id",
        F.col(id_col),
        F.greatest(F.lit(0), F.col("pack_id") * L - F.col("cum")).alias(
            "slice_start"
        ),
        (
            F.least(F.col("tok"), (F.col("pack_id") + 1) * L - F.col("cum"))
            - F.greatest(F.lit(0), F.col("pack_id") * L - F.col("cum"))
        ).alias("slice_len"),
        F.greatest(F.col("cum") - F.col("pack_id") * L, F.lit(0)).alias(
            "pack_pos"
        ),
    )
    return out


def pack_shards(
    items: DataFrame,
    shard_bytes: int,
    id_col: str = "image_id",
    size_col: str = "item_bytes",
    num_partitions: int | None = None,
) -> DataFrame:
    """(shard_id, id, pos_bytes, item_bytes): WebDataset-style shard layout
    for binary corpora (image/audio training shards) — items are laid
    end-to-end in ``id_col`` order (a stable total order) and the byte
    stream is cut at ``shard_bytes`` boundaries; an item is assigned to the
    shard where its FIRST byte lands, so a shard may overrun the budget by
    at most one item ("target size" semantics of tar-shard writers: items
    are never split across shards, unlike :func:`pack_sequences` tokens).

    Byte-for-byte the mirror of ``pack_sequences``'s layout math: the
    global layout needs one prefix sum, computed with
    operators/ordering.distributed_cumsum (range partition + per-partition
    sums to the driver — one long per partition) — NOT a single-task
    window, so the schedule stage scales to corpus size. Assignment is
    integer DIV (not float /): float64 division is exact only below 2^53
    cumulative bytes, and a 100 TB corpus is past 2^46 already.

    Rows with non-positive ``size_col`` are dropped (zero-byte payloads
    occupy no shard space), mirroring ``pack_sequences``'s tok > 0 guard.
    """
    from .ordering import distributed_cumsum

    sized = items.select(
        F.col(id_col), F.col(size_col).cast("long").alias("__sz")
    ).where(F.col("__sz") > 0)
    laid = distributed_cumsum(
        sized, [id_col], "__sz", out_col="cum", num_partitions=num_partitions
    )
    B = int(shard_bytes)
    return laid.select(
        F.expr(f"cum DIV {B}").alias("shard_id"),
        F.col(id_col),
        F.expr(f"cum % {B}").alias("pos_bytes"),
        F.col("__sz").alias(size_col),
    )


def contamination_pairs(
    train: DataFrame,
    eval_docs: DataFrame,
    shingle_k: int = 13,
    min_overlap: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(eval_id, train_id, n_common, eval_shingles, overlap_frac): for every
    eval document, the train documents sharing ≥ ``min_overlap`` distinct
    k-word shingles, with the contaminated fraction of the eval doc's
    shingle set. The standard n-gram (default 13-gram) train/test
    contamination check.

    Shingles are 60-bit md5 hashes so the join carries longs, not strings,
    and the SQL oracle reproduces them exactly.
    """

    def shingle_hashes(df: DataFrame, out_id: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(out_id),
            F.explode(
                word_shingles_expr(F.col(text_col), shingle_k)
            ).alias("__sh"),
        ).select(
            out_id, md5int64(F.concat(F.lit("ct:"), F.col("__sh"))).alias("sh")
        ).distinct()

    tr = shingle_hashes(train, "train_id")
    ev = shingle_hashes(eval_docs, "eval_id")
    ev_sizes = ev.groupBy("eval_id").agg(F.count("*").alias("eval_shingles"))
    hits = (
        ev.join(tr, "sh")
        .groupBy("eval_id", "train_id")
        .agg(F.count("*").alias("n_common"))
        .where(F.col("n_common") >= min_overlap)
    )
    return hits.join(ev_sizes, "eval_id").select(
        "eval_id",
        "train_id",
        "n_common",
        "eval_shingles",
        F.round(
            F.col("n_common").cast("double") / F.col("eval_shingles").cast("double"), 4
        ).alias("overlap_frac"),
    )


# ---------------------------------------------------------------------------
# Weak-label quality classifier: least-squares linear probe via exact
# normal equations (the CCNet/fastText-distillation shape: score every
# document with a tiny linear model trained on weak labels such as
# lang_id / gopher_pass, then threshold).
# ---------------------------------------------------------------------------


def _solve_normal_eqs(xx: list[list[int]], xy: list[int]) -> list[float]:
    """Solve (X^T X) w = X^T y in exact rational arithmetic (Fraction
    Gaussian elimination, first-nonzero pivot). Exact inputs + exact solve
    make the weights a pure function of the data — independent of row
    order, partitioning, and summation order. Raises on a singular system
    (degenerate/constant features)."""
    from fractions import Fraction

    n = len(xy)
    a = [[Fraction(xx[r][c]) for c in range(n)] + [Fraction(xy[r])] for r in range(n)]
    for col in range(n):
        piv = next((r for r in range(col, n) if a[r][col] != 0), None)
        if piv is None:
            raise ValueError("singular normal equations (degenerate features)")
        a[col], a[piv] = a[piv], a[col]
        inv = a[col][col]
        a[col] = [v / inv for v in a[col]]
        for r in range(n):
            if r != col and a[r][col] != 0:
                f = a[r][col]
                a[r] = [v - f * p for v, p in zip(a[r], a[col])]
    return [float(a[r][n]) for r in range(n)]


def train_linear_probe(
    df: DataFrame, feat_cols: list[str], label_col: str
) -> list[float]:
    """Fit ``label ≈ w0 + Σ wi·feat_i`` by least squares over the whole
    corpus, distributed. ``feat_cols`` must be integer (fixed-point)
    columns and ``label_col`` an integer 0/1 weak label, so every moment is
    an exact long sum.

    One aggregation computes the (k+1)×(k+1) Gram matrix X^T X and X^T y —
    map-side combined, so the shuffle carries (k+1)(k+2)/2 + (k+1) partial
    sums per partition regardless of row count; at 10^10 docs this is a
    single corpus scan. The tiny system is solved on the driver in exact
    rational arithmetic (:func:`_solve_normal_eqs`), so the learned weights
    are bit-identical across engines and partitionings — the property that
    lets a SQL oracle receive them as literals (the trained-centroids
    pattern). Bound: |feat| ≤ F implies |Σ feat_a·feat_b| ≤ n·F²; with
    F = 10³ the long sums are exact up to n ≈ 9·10¹² rows.

    Returns ``[w0, w1, ..., wk]`` (bias first) as float64.
    """
    k = len(feat_cols)
    cols = [F.lit(1).cast("long")] + [F.col(c).cast("long") for c in feat_cols]
    y = F.col(label_col).cast("long")
    aggs = []
    for a in range(k + 1):
        for b in range(a, k + 1):
            aggs.append(F.sum(cols[a] * cols[b]).alias(f"xx_{a}_{b}"))
    for a in range(k + 1):
        aggs.append(F.sum(cols[a] * y).alias(f"xy_{a}"))
    row = df.agg(*aggs).collect()[0]
    xx = [
        [row[f"xx_{min(a, b)}_{max(a, b)}"] for b in range(k + 1)]
        for a in range(k + 1)
    ]
    xy = [row[f"xy_{a}"] for a in range(k + 1)]
    return _solve_normal_eqs(xx, xy)


def py_train_linear_probe(rows: list[tuple], k: int) -> list[float]:
    """Pure-Python twin of :func:`train_linear_probe` (oracle/test use).
    ``rows`` are ``(feat_1, ..., feat_k, label)`` integer tuples."""
    xx = [[0] * (k + 1) for _ in range(k + 1)]
    xy = [0] * (k + 1)
    for r in rows:
        x = (1,) + tuple(int(v) for v in r[:k])
        yv = int(r[k])
        for a in range(k + 1):
            for b in range(k + 1):
                xx[a][b] += x[a] * x[b]
            xy[a] += x[a] * yv
    return _solve_normal_eqs(xx, xy)


def linear_probe_score_expr(weights: list[float], feat_cols: list[str]) -> Column:
    """Score a row with trained weights: ``w0 + Σ feat_i·wi`` as one codegen
    projection (left-to-right fold; the SQL twin writes the same chain, so
    the float64 result is bit-identical)."""
    expr: Column = F.lit(float(weights[0]))
    for w, c in zip(weights[1:], feat_cols):
        expr = expr + F.col(c).cast("double") * F.lit(float(w))
    return expr


def sql_linear_probe_score(weights: list[float], feat_exprs: list[str]) -> str:
    """DuckDB twin of :func:`linear_probe_score_expr` (same fold order)."""
    parts = [repr(float(weights[0]))]
    for w, e in zip(weights[1:], feat_exprs):
        parts.append(f"CAST({e} AS DOUBLE) * {float(w)!r}")
    return "(" + " + ".join(parts) + ")"


def unigram_lm_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    hot_k: int = 256,
) -> DataFrame:
    """Unigram language-model document scoring — the CCNet-perplexity
    filtering shape: train a unigram LM on the corpus itself (token
    maximum-likelihood frequencies), then score every document by mean
    token log-likelihood; ``ppl = exp(-mean_logprob)`` is the quantity
    CCNet buckets on (head/middle/tail).

    Returns ``(id, n_tokens, mean_logprob, ppl)``, 4dp at the boundary.

    Scale shape: one explode → per-(doc, term) tf groupBy (map-side
    combine: shuffle carries distinct (doc, term) pairs, not occurrences) →
    token-count groupBy over the tf table (vocab-size output) → tf ⋈ counts
    on term → per-doc sum. The corpus total is a one-row broadcast.

    Stop-word skew: the term join's hot keys are by definition the top-K
    most frequent terms, so with ``hot_k > 0`` the join is split — the
    top-``hot_k`` rows of counts (a driver-bounded TakeOrdered) broadcast,
    and tf rows hitting them take a BroadcastHashJoin with ZERO shuffle,
    while the cold tail (no hot keys left → balanced partitions) takes the
    equi-join. Output values are identical under any split, so correctness
    is unaffected; the skew stress test pins the plan shape. AQE's
    skew-join CANNOT cover this: OptimizeSkewedJoin only fires when both
    SortMergeJoin children are bare shuffle stages, and the counts side
    always carries its final HashAggregate directly under the join (an
    explicit repartition of counts gets collapsed as redundant), so the
    hot partition never splits — verified empirically on Spark 4.1.

    No cross joins, no per-row Python; ln/exp stay in codegen, and both
    engines fold IEEE doubles so 4dp rounding is engine-stable (the BM25
    precedent in operators/search.py)."""
    toks = docs.select(
        F.col(id_col), words_expr(F.col(text_col)).alias("__w")
    ).where(F.size("__w") > 0)
    tf = (
        toks.select(
            F.col(id_col),
            F.size("__w").alias("dl"),
            F.explode("__w").alias("term"),
        )
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    counts = tf.groupBy("term").agg(F.sum("tf").alias("c"))
    total = counts.agg(F.sum("c").alias("t_total"))
    if hot_k:
        # hot/cold split (see docstring): broadcast the top-K term counts,
        # hot tf rows avoid the term shuffle entirely, the cold tail joins
        # a hot-free (balanced) key space. tf's aggregate shuffle stage is
        # reused across both branches, so tokenization runs once.
        hot = counts.orderBy(F.desc("c"), "term").limit(hot_k)
        tagged = tf.join(
            F.broadcast(hot.withColumnRenamed("c", "__c_hot")), "term", "left"
        )
        hot_rows = (
            tagged.where(F.col("__c_hot").isNotNull())
            .withColumn("c", F.col("__c_hot"))
            .drop("__c_hot")
        )
        cold_rows = (
            tagged.where(F.col("__c_hot").isNull())
            .drop("__c_hot")
            .join(counts, "term")
        )
        joined = hot_rows.unionByName(cold_rows)
    else:
        joined = tf.join(counts, "term")
    mean_lp = F.col("ll") / F.col("dl")
    return (
        joined.crossJoin(F.broadcast(total))
        .groupBy(id_col, "dl")
        .agg(
            F.sum(
                F.col("tf") * F.log(F.col("c") / F.col("t_total"))
            ).alias("ll")
        )
        .select(
            F.col(id_col),
            F.col("dl").cast("long").alias("n_tokens"),
            F.round(mean_lp, 4).alias("mean_logprob"),
            F.round(F.exp(-mean_lp), 4).alias("ppl"),
        )
    )


def hot_cold_count_join(
    tf: DataFrame,
    counts: DataFrame,
    keys: list[str],
    cnt_col: str,
    hot_k: int,
) -> DataFrame:
    """Equi-join ``tf`` to the aggregate table ``counts`` on ``keys`` with
    the top-``hot_k`` rows (by ``cnt_col``) broadcast — the reusable form
    of :func:`unigram_lm_scores`' inline hot/cold split. By construction
    the join's hot keys ARE the highest-count rows (token/bigram joins
    under a Zipf corpus), so the hot branch takes a BroadcastHashJoin with
    ZERO shuffle while the cold tail equi-joins a hot-free, balanced key
    space. Output values are identical under any split; the same
    "AQE's OptimizeSkewedJoin cannot fire here" analysis applies (the
    counts side carries its final HashAggregate directly under the join)."""
    if not hot_k:
        return tf.join(counts, keys)
    payload = [c for c in counts.columns if c not in keys]
    hot = counts.orderBy(F.desc(cnt_col), *keys).limit(hot_k)
    tagged = tf.join(
        F.broadcast(hot.withColumn("__hot", F.lit(True))), keys, "left"
    )
    # the __hot marker (not cnt_col nullness) detects hot membership, so
    # counts may carry extra payload columns (e.g. a winner struct) — cold
    # rows drop the all-NULL payload before re-joining the full table
    hot_rows = tagged.where(F.col("__hot")).drop("__hot")
    cold_rows = (
        tagged.where(F.col("__hot").isNull())
        .drop("__hot", *payload)
        .join(counts, keys)
    )
    return hot_rows.unionByName(cold_rows)


BIGRAM_LAM = 0.8
"""Interpolation weight on the bigram MLE term (the unigram term gets
``1 - BIGRAM_LAM``). Module-level so gate and oracle restate the SAME
IEEE literals — note ``1.0 - 0.8 == 0.19999999999999996``, not ``0.2``."""


def bigram_lm_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = BIGRAM_LAM,
    hot_k: int = 256,
) -> DataFrame:
    """Interpolated bigram language-model document scoring — the CCNet /
    KenLM-perplexity filtering shape one order up from
    :func:`unigram_lm_scores`: train bigram + unigram MLE models on the
    corpus itself, score every document by mean token log-likelihood under
    ``p(w|prev) = λ·c(prev,w)/c(prev,·) + (1−λ)·c(w)/total`` (the first
    token scores under the unigram model alone), and bucket on
    ``ppl = exp(-mean_logprob)``. Interpolation plays the role of KenLM's
    backoff: an unseen-in-context word still gets its unigram mass, so no
    document scores −inf.

    Returns ``(id, n_tokens, mean_logprob, ppl)``, 4dp at the boundary —
    the same contract as the unigram scorer, so the two run as tagged legs
    of one gate.

    Scale shape: tokenization is pinned once (serialized localCheckpoint —
    three independent aggregations consume the token arrays, and unlike
    the unigram scorer they share no shuffle stage). Then: per-(doc, prev,
    cur) tf groupBy (map-side combine — the shuffle carries distinct
    bigram types per doc, not occurrences); bigram counts and context
    counts are two further map-side-combined aggregates (context counts
    aggregate the BIGRAM-COUNT table, vocab-sized, not the corpus); the
    three model joins (bigram counts on (prev,cur), context counts on
    (prev), unigram counts on (cur)) all go through
    :func:`hot_cold_count_join`, so the Zipf-hot head of each key space —
    the overwhelming majority of token occurrences at web scale — takes
    broadcast joins with zero shuffle and the cold tails join balanced key
    spaces. The corpus total is a one-row broadcast. No cross joins beyond
    it, no per-row Python; ln/exp stay in codegen.

    Float parity: every probability is written as the literal expression
    ``λ·(CAST(c_bg)/CAST(c_ctx)) + (1−λ)·(CAST(c)/CAST(total))`` with λ
    and 1−λ passed as the SAME Python doubles the SQL twin formats with
    ``repr`` — both engines fold identical IEEE terms, and 4dp rounding at
    the boundary absorbs summation-order differences (the BM25/unigram
    precedent).

    Reference has no counterpart (stops at chunk+embed+store,
    /root/reference/src/utils.py); SURVEY.md training-data layer —
    CCNet-style LM quality bucketing (Wenzek et al. 2020)."""
    from .. import local_ckpt

    om = 1.0 - lam
    toks = local_ckpt(
        docs.select(
            F.col(id_col), words_expr(F.col(text_col)).alias("__w")
        ).where(F.size("__w") > 0)
    )
    uni = (
        toks.select(F.explode("__w").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("c"))
    )
    total = uni.agg(F.sum("c").alias("t_total"))

    # first token: unigram model (no context exists)
    firsts = toks.select(
        F.col(id_col),
        F.size("__w").alias("dl"),
        F.element_at("__w", 1).alias("term"),
    )
    fll = (
        hot_cold_count_join(firsts, uni, ["term"], "c", hot_k)
        .crossJoin(F.broadcast(total))
        .select(
            id_col,
            "dl",
            F.log(
                F.col("c").cast("double") / F.col("t_total").cast("double")
            ).alias("ll0"),
        )
    )

    # bigram types per doc; slice+transform keeps 1-token docs empty
    # (never a reversed sequence(1, 0)) and explode drops them
    bg = toks.select(
        F.col(id_col),
        F.explode(
            F.expr(
                "transform(slice(__w, 2, size(__w) - 1),"
                " (x, i) -> struct(__w[i] AS prev, x AS cur))"
            )
        ).alias("__b"),
    ).select(id_col, F.col("__b.prev").alias("prev"), F.col("__b.cur").alias("cur"))
    bgtf = bg.groupBy(id_col, "prev", "cur").agg(F.count("*").alias("tf"))
    bgc = bgtf.groupBy("prev", "cur").agg(F.sum("tf").alias("c_bg"))
    ctx = bgc.groupBy("prev").agg(F.sum("c_bg").alias("c_ctx"))

    uni_cur = uni.select(F.col("term").alias("cur"), F.col("c").alias("c_uni"))
    joined = hot_cold_count_join(
        hot_cold_count_join(
            hot_cold_count_join(bgtf, bgc, ["prev", "cur"], "c_bg", hot_k),
            ctx,
            ["prev"],
            "c_ctx",
            hot_k,
        ),
        uni_cur,
        ["cur"],
        "c_uni",
        hot_k,
    )
    lnp = F.log(
        F.lit(lam)
        * (F.col("c_bg").cast("double") / F.col("c_ctx").cast("double"))
        + F.lit(om)
        * (F.col("c_uni").cast("double") / F.col("t_total").cast("double"))
    )
    bll = (
        joined.crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(F.sum(F.col("tf").cast("double") * lnp).alias("ll_bg"))
    )

    ll = F.col("ll0") + F.coalesce(F.col("ll_bg"), F.lit(0.0))
    mean_lp = ll / F.col("dl")
    return fll.join(bll, id_col, "left").select(
        F.col(id_col),
        F.col("dl").cast("long").alias("n_tokens"),
        F.round(mean_lp, 4).alias("mean_logprob"),
        F.round(F.exp(-mean_lp), 4).alias("ppl"),
    )


def paragraph_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
    hot_k: int = 256,
) -> DataFrame:
    """CCNet-style corpus-level paragraph deduplication (Wenzek et al.
    2020 §3.1 — the step that removes most boilerplate before any
    LM filtering): split every document on ``sep``, fingerprint each
    paragraph (md5), keep only the FIRST occurrence corpus-wide (the
    lexicographically least ``(id, idx)`` — deterministic under any
    partitioning), and rebuild documents from their surviving paragraphs
    in order. Empty paragraphs are exempt (kept everywhere): deduping
    blank separator lines corpus-wide would splice unrelated text.

    Returns ``(id, clean, n_removed)`` — the rebuilt text and how many
    paragraphs the document lost.

    Differs from :func:`strip_boilerplate` (host-scoped line-FREQUENCY
    threshold) in scope and rule: this is corpus-global and positional —
    one copy survives; the host-freq pass removes ALL copies of
    over-frequent furniture.

    Scale shape: the paragraph table is pinned once (serialized
    localCheckpoint — the winner aggregate and the membership join both
    consume it); winners are one map-side-combined groupBy over the
    fingerprint; the membership join goes through
    :func:`hot_cold_count_join` — a blank-template storm (one paragraph
    repeated 10⁸ times) is BY DEFINITION a top-K count row, so its rows
    take the broadcast branch instead of landing on one shuffle
    partition. The rebuild is a per-doc groupBy whose state is bounded by
    document size (collect_list of that doc's paragraphs), never a global
    sort or window."""
    from .. import local_ckpt

    paras = local_ckpt(
        docs.select(
            F.col(id_col),
            F.posexplode(F.split(F.col(text_col), sep)).alias("idx", "para"),
        ).withColumn("h", F.md5("para"))
    )
    winners = paras.groupBy("h").agg(
        F.min(F.struct(F.col(id_col), F.col("idx"))).alias("__w"),
        F.count("*").alias("c"),
    )
    flagged = hot_cold_count_join(paras, winners, ["h"], "c", hot_k).select(
        F.col(id_col),
        "idx",
        "para",
        (
            (F.col("para") == "")
            | (
                (F.col(id_col) == F.col(f"__w.{id_col}"))
                & (F.col("idx") == F.col("__w.idx"))
            )
        ).alias("kept"),
    )
    return flagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.filter(
                    F.array_sort(
                        F.collect_list(F.struct("idx", "para", "kept"))
                    ),
                    lambda s: s["kept"],
                ),
                lambda s: s["para"],
            ),
            sep,
        ).alias("clean"),
        F.sum((~F.col("kept")).cast("long")).alias("n_removed"),
    )


def semantic_contamination(
    train_embs: DataFrame,
    eval_embs: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-level train/eval decontamination: ``(eval_id, train_id,
    sim)`` for every train document whose embedding cosine against an eval
    document reaches ``threshold`` — the semantic complement of
    :func:`contamination_pairs` (13-gram shingles catch verbatim leakage;
    this catches paraphrased/translated eval copies whose surface n-grams
    all differ, the decontamination layer modern model cards report).

    Scale shape: the eval side is a benchmark suite — bounded — so it
    broadcasts into a BroadcastNestedLoopJoin over ONE train scan:
    |eval| codegen'd cosines per train row, zero shuffle, no per-row
    Python. For an unbounded eval side use the LSH-blocked
    ``cosine_pairs`` instead; this operator is deliberately the
    exact-scan shape (no recall loss on the gate that decides whether
    eval data leaked). The keep decision compares the 4dp-ROUNDED cosine
    (the alignment_filter precedent), so any engine reproducing the
    left-to-right float64 fold makes the identical call."""
    from ..functions.vectors import cosine_expr

    ev = eval_embs.select(
        F.col(id_col).alias("eval_id"), F.col(vec_col).alias("__ev")
    )
    tr = train_embs.select(
        F.col(id_col).alias("train_id"), F.col(vec_col).alias("__tv")
    )
    sim = F.round(cosine_expr(F.col("__tv"), F.col("__ev")), 4)
    return (
        tr.crossJoin(F.broadcast(ev))
        .select("eval_id", "train_id", sim.alias("sim"))
        .where(F.col("sim") >= F.lit(float(threshold)))
    )


# ---------------------------------------------------------------------------
# DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
# arXiv:2302.03169): score every raw document by its importance weight
# log p_target(x) − log p_raw(x) under two bag-of-hashed-n-gram unigram
# models, then resample via Gumbel top-k (≈ sampling without replacement
# proportional to the weights). The selection rule behind "pick the web
# subset that looks like the target corpus" in LLM pretraining recipes.
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 4096
"""Hashed-feature space size (the paper uses 10⁴; any fixed K works —
collisions are part of the model). K-bounded by construction, so the
log-ratio table is always broadcastable."""

DSIR_SMOOTH = 1.0
"""Add-λ smoothing on bucket counts: every bucket keeps mass under both
models, so no document scores ±inf."""


def dsir_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    salt: str = "dsir",
) -> DataFrame:
    """``(id, bucket)`` hashed n-gram feature occurrences — lower-cased
    whitespace unigrams plus adjacent bigrams (joined with the 0x1f unit
    separator), md5-hashed into ``n_buckets``. One stateless projection +
    explode per n-gram order; no shuffle. The md5 hash has exact
    SQL/Python twins (functions/hashing.py), so an independent oracle
    reproduces every bucket id bit-for-bit."""
    toks = docs.select(F.col(id_col), words_expr(F.col(text_col)).alias("__w"))
    unis = toks.select(F.col(id_col), F.explode("__w").alias("__f"))
    bis = toks.select(
        F.col(id_col),
        F.explode(
            F.expr(
                # greatest(..., 0): a zero-token doc would make the slice
                # length -1, which Spark rejects at runtime
                "transform(slice(__w, 2, greatest(size(__w) - 1, 0)),"
                " (x, i) -> concat(__w[i], char(31), x))"
            )
        ).alias("__f"),
    )
    return unis.unionByName(bis).select(
        F.col(id_col),
        (
            md5int64(F.concat(F.lit(salt + ":"), F.col("__f"))) % n_buckets
        ).alias("bucket"),
    )


def dsir_log_ratio_table(
    raw_feats: DataFrame,
    target_feats: DataFrame,
    n_buckets: int = DSIR_BUCKETS,
    smoothing: float = DSIR_SMOOTH,
) -> DataFrame:
    """``(bucket, log_ratio)`` — the per-bucket importance log-ratio
    ``ln p̂_target(b) − ln p̂_raw(b)`` under add-λ-smoothed multinomial
    MLEs. Two map-side-combined K-bounded aggregates, a full outer join
    over at most ``n_buckets`` rows, and a one-row totals broadcast;
    ln stays in codegen. The result is a ≤K-row dim table — broadcast it
    into the scoring join."""
    ks = float(smoothing) * float(n_buckets)
    ct = target_feats.groupBy("bucket").agg(F.count("*").alias("ct"))
    cq = raw_feats.groupBy("bucket").agg(F.count("*").alias("cq"))
    tab = ct.join(cq, "bucket", "full").select(
        "bucket",
        F.coalesce("ct", F.lit(0)).alias("ct"),
        F.coalesce("cq", F.lit(0)).alias("cq"),
    )
    tot = tab.agg(F.sum("ct").alias("ct_tot"), F.sum("cq").alias("cq_tot"))
    lr = F.log(
        (F.col("ct").cast("double") + F.lit(float(smoothing)))
        / (F.col("ct_tot").cast("double") + F.lit(ks))
    ) - F.log(
        (F.col("cq").cast("double") + F.lit(float(smoothing)))
        / (F.col("cq_tot").cast("double") + F.lit(ks))
    )
    return tab.crossJoin(F.broadcast(tot)).select(
        "bucket", lr.alias("log_ratio")
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    smoothing: float = DSIR_SMOOTH,
    salt: str = "dsir",
) -> DataFrame:
    """``(id, log_weight)`` for every raw document: ``Σ_b tf_b ·
    log_ratio(b)`` — the document's importance log-weight under the
    hashed-n-gram models. Featureless (empty) documents weigh 0.0 (equally
    likely under both models).

    Scale shape: the raw feature stream is pinned once (serialized
    localCheckpoint — it feeds both the raw model fit and the per-doc tf)
    → per-(doc, bucket) tf groupBy (map-side combine) → BROADCAST hash
    join against the ≤K-row ratio table (zero shuffle — K is bounded by
    construction, this is never a size gamble) → per-doc sum. The target
    corpus in the paper's setting is orders of magnitude smaller than raw
    (a quality reference like Wikipedia); its fit is one K-bounded
    aggregate over a smaller scan."""
    from .. import local_ckpt

    rf = local_ckpt(
        dsir_features(raw, id_col, text_col, n_buckets, salt)
    )
    tf_t = dsir_features(target, id_col, text_col, n_buckets, salt)
    ratio = dsir_log_ratio_table(rf, tf_t, n_buckets, smoothing)
    doc_tf = rf.groupBy(id_col, "bucket").agg(F.count("*").alias("tf"))
    w = (
        doc_tf.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum(
                F.col("tf").cast("double") * F.col("log_ratio")
            ).alias("log_weight")
        )
    )
    return raw.select(id_col).join(w, id_col, "left").select(
        F.col(id_col),
        F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DSIR_BUCKETS,
    smoothing: float = DSIR_SMOOTH,
    salt: str = "dsir",
    gumbel_salt: str = "dsir-g",
) -> DataFrame:
    """``(id, log_weight, key, selected)`` — Gumbel top-k importance
    resampling over :func:`dsir_log_weights`: ``key = log_weight + g`` with
    ``g = −ln(−ln(u))`` and ``u`` the deterministic md5 fraction of
    ``(gumbel_salt, id)``, so the draw is reproducible across engines and
    re-runs (the paper's without-replacement sampler, derandomized the way
    every stochastic step in this engine is). Exactly ``k`` rows carry
    ``selected = true``.

    The top-k membership test is NOT a global window: ranks come from
    :func:`~.ordering.distributed_rank` (one range exchange balanced by
    data volume), so a 10¹⁰-doc resample never funnels through one
    partition or a driver-side TakeOrdered of k rows."""
    from .ordering import distributed_rank

    lw = dsir_log_weights(
        raw, target, id_col, text_col, n_buckets, smoothing, salt
    )
    u = split_fraction_expr(F.col(id_col), gumbel_salt)
    scored = lw.select(
        id_col,
        "log_weight",
        (F.col("log_weight") + (-F.log(-F.log(u)))).alias("key"),
    )
    ranked = distributed_rank(
        scored.withColumn("__negkey", -F.col("key")),
        ["__negkey", id_col],
        out_col="__rk",
    )
    return ranked.select(
        id_col,
        "log_weight",
        "key",
        (F.col("__rk") < int(k)).alias("selected"),
    )


DEFAULT_ASPECT_BUCKETS: list[tuple[int, int]] = [
    (32, 64),
    (40, 64),
    (48, 64),
    (56, 64),
    (64, 64),
    (64, 56),
    (64, 48),
    (64, 40),
    (64, 32),
]
"""Aspect ladder spanning 1:2 … 2:1 at the gen_images dimension range; a
production ladder (e.g. SDXL's 1024²-budget list) plugs into the same
operator unchanged."""


def assign_aspect_buckets(
    images: DataFrame,
    buckets: list[tuple[int, int]],
    id_col: str = "image_id",
    w_col: str = "w",
    h_col: str = "h",
) -> DataFrame:
    """(bucket_id, bw, bh, <id_col>): the assignment stage of
    :func:`aspect_bucket_batches` — nearest bucket by fixed-point aspect
    (``(w * 10^6) DIV h``), ties to the lower bucket_id. A ZERO-SHUFFLE
    codegen projection: distances against a literal aspect array,
    array_min + array_position (1-based, FIRST match → lower-index
    tie-break), never a join against a bucket table. Rows with
    non-positive dims are dropped."""
    afps = [(int(bw) * 1_000_000) // int(bh) for bw, bh in buckets]
    afp = F.expr(f"(CAST({w_col} AS BIGINT) * 1000000) DIV {h_col}")
    dists = F.array(*[F.abs(afp - F.lit(a)) for a in afps])
    bucket_id = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    bws = F.array(*[F.lit(int(bw)) for bw, _ in buckets])
    bhs = F.array(*[F.lit(int(bh)) for _, bh in buckets])
    return (
        images.where((F.col(w_col) > 0) & (F.col(h_col) > 0))
        .select(F.col(id_col), bucket_id.alias("bucket_id"))
        .select(
            "bucket_id",
            F.element_at(bws, F.col("bucket_id") + 1).alias("bw"),
            F.element_at(bhs, F.col("bucket_id") + 1).alias("bh"),
            id_col,
        )
    )


def aspect_bucket_batches(
    images: DataFrame,
    buckets: list[tuple[int, int]],
    batch_size: int,
    id_col: str = "image_id",
    w_col: str = "w",
    h_col: str = "h",
    drop_last: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """(bucket_id, bw, bh, <id_col>, batch_idx, pos_in_batch): aspect-ratio
    bucketing + fixed-size batch packing — the image-training batcher
    (SDXL/NaViT shape): every training batch holds ``batch_size`` images of
    ONE target (bw, bh), so a resize-to-bucket never mixes aspect ratios
    inside a batch and no pixels are wasted on letterboxing.

    Assignment is the nearest bucket by FIXED-POINT aspect — ``afp =
    (w * 10^6) DIV h`` vs each bucket's precomputed ``(bw * 10^6) DIV bh``,
    ties to the lower bucket_id. Pure int64 math: any engine reproduces the
    exact assignment (a float aspect distance would tie-break on rounding,
    which no SQL oracle could be trusted to mirror).

    Scale shape: assignment is a ZERO-SHUFFLE codegen projection (literal
    aspect array + array_min/array_position — first match = lower-index
    tie-break). The within-bucket rank is the part that would naively be
    ``row_number() OVER (PARTITION BY bucket_id)`` — a skew bug at corpus
    scale, since a ~10-20-entry ladder means ~10-20 window partitions no
    matter how many executors. Instead it reuses
    :func:`~..ordering.distributed_cumsum` over the total order
    (bucket_id, id): one range exchange, balanced by data volume not by
    bucket count; bucket start offsets are a bucket-count-sized aggregate
    broadcast back. ``batch_idx`` / ``pos_in_batch`` are integer DIV/mod of
    the 0-based in-bucket rank (exact past 2^53, like pack_sequences).

    ``drop_last=True`` drops each bucket's trailing partial batch (the
    common training setting); counts come from the same broadcast offsets
    aggregate, so no second pass over the corpus.

    ``id_col`` must be unique — it is the total-order key (like
    pack_shards), so duplicate ids would make the in-bucket rank, and any
    independent oracle's ROW_NUMBER, tie-break arbitrarily.

    Reference has no counterpart (stores image bytes, never batches them:
    /root/reference/src/utils.py:456-500); SURVEY.md training-data layer.
    """
    if batch_size <= 0:
        raise ValueError(f"batch_size must be positive, got {batch_size}")
    if not buckets:
        raise ValueError("buckets must be non-empty")
    assigned = assign_aspect_buckets(
        images, buckets, id_col=id_col, w_col=w_col, h_col=h_col
    )

    from .. import local_ckpt
    from .ordering import distributed_rank

    ranked = local_ckpt(
        distributed_rank(
            assigned,
            ["bucket_id", id_col],
            out_col="__cum",
            num_partitions=num_partitions,
        )
    )  # consumed twice (offsets agg + join) — pin the Arrow cumsum pass
    # __cum is the exclusive GLOBAL rank under (bucket_id, id); the bucket's
    # start offset (= rows in earlier buckets) and row count rebase it to a
    # 0-based in-bucket rank. One bucket-count-sized aggregate, broadcast.
    offsets = ranked.groupBy("bucket_id").agg(
        F.min("__cum").alias("__off"), F.count("*").alias("__n")
    )
    r = F.col("__cum") - F.col("__off")
    out = (
        ranked.join(F.broadcast(offsets), "bucket_id")
        .withColumn("__r", r)
        .select(
            "bucket_id",
            "bw",
            "bh",
            id_col,
            F.expr(f"__r DIV {int(batch_size)}").alias("batch_idx"),
            (F.col("__r") % batch_size).alias("pos_in_batch"),
            "__n",
        )
    )
    if drop_last:
        out = out.where(
            F.col("batch_idx") < F.expr(f"__n DIV {int(batch_size)}")
        )
    return out.drop("__n")


def split_by_component(
    docs: DataFrame,
    components: DataFrame,
    weights: dict[str, float],
    salt: str = "split",
    id_col: str = "doc_id",
    component_col: str = "component_id",
    out_col: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test split: hash the COMPONENT representative,
    not the document, so every member of a near-dup cluster lands in the
    same split and no near-duplicate of a training doc can sit in the eval
    set (the standard contamination channel a per-doc random/hash split
    leaves open — the whole point of running dedup before splitting).

    ``components`` is :func:`~.components.connected_components` output
    (id_col, component_col); docs absent from it are singletons and hash
    their own id — so for every singleton the assignment is IDENTICAL to
    :func:`hash_split` with the same salt/weights, and adding edges only
    ever moves whole clusters, never individual docs.

    Scale shape: one equi-join on the doc id (components carries only
    near-dup members, typically ≪ corpus — Spark broadcasts it under AQE
    when small) + the same stateless split projection as hash_split. No
    extra shuffle beyond the join; append-stable like hash_split because
    component ids are min-vertex canonical representatives.

    ``docs[id_col]`` and both ``components`` columns must share one id
    domain (the dedup pipeline's int64 doc hashes, like the pipeline_e2e
    composition) so the coalesced split key is one type.
    """
    comp = components.select(
        F.col(id_col), F.col(component_col).alias("__comp")
    )
    keyed = docs.join(comp, id_col, "left").withColumn(
        "__split_key", F.coalesce(F.col("__comp"), F.col(id_col))
    )
    out = hash_split(keyed, weights, salt=salt, id_col="__split_key", out_col=out_col)
    return out.drop("__comp", "__split_key")


def c4_clean(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4 heuristic cleaning (Raffel et al. 2020 §2.2) over a documents
    table: per-line filtering (terminal punctuation, ≥ 5 words, no
    'javascript') and page-level removal (< 3 surviving lines, 'lorem
    ipsum', '{'); see functions/text.c4_clean_expr for the rule split.

    Returns the input rows that SURVIVE page-level filtering, with
    ``text_col`` replaced by the cleaned text and an added ``n_removed``
    dropped-line count; all other columns pass through.

    Scale shape: one codegen projection + a stateless filter — no explode,
    no shuffle, no Python; the cheapest stage of the cleaning pipeline and
    exactly as parallel as the scan. The reference stores crawl4ai markdown
    verbatim (src/utils.py:478-500); this stage has no counterpart there.
    """
    from ..functions.text import c4_clean_expr

    st = c4_clean_expr(F.col(text_col))
    others = [c for c in docs.columns if c != text_col]
    return (
        docs.withColumn("__c4", st)
        .where(F.col("__c4.page_keep"))
        .select(
            *others,
            F.col("__c4.clean").alias(text_col),
            F.col("__c4.n_removed").alias("n_removed"),
        )
    )


def token_budget_sample(
    docs: DataFrame,
    budgets: dict[str, int],
    default_budget: int | None = None,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
    size_col: str | None = None,
    salt: str = "tbudget",
    num_partitions: int | None = None,
) -> DataFrame:
    """Token-budget corpus sampling: ``(id, source, n_tokens, cum_before,
    keep)`` — keep whole documents, in a deterministic hash-shuffled order,
    until each source's cumulative token count would exceed its budget (the
    Pile/Dolma-style recipe step "take N tokens of source s", at token
    granularity rather than :func:`mix_corpus`'s doc-rate granularity;
    documents are never split).

    Order within a source is the md5 of (salt, id) with id tie-break — an
    unbiased reproducible shuffle, stable under appends of NEW ids (every
    previously-kept doc keeps its prefix position unless the budget line
    moves). ``keep ⇔ cum_before + n_tokens ≤ budget(source)``; sources
    missing from ``budgets`` get ``default_budget`` (None = unlimited).

    Scale shape: the per-source running total is the
    :func:`aspect_bucket_batches` pattern — NOT ``sum() OVER (PARTITION BY
    source)`` (whose parallelism is capped at the source count and dies on
    a head-heavy corpus): one :func:`~..ordering.distributed_cumsum` over
    the total order (source, ord, id) — a range exchange balanced by data
    volume — then a source-count-sized MIN aggregate rebases the global
    prefix to per-source, broadcast back. Token counts stay in codegen
    (regexp_count; no token array materialized). All integer arithmetic —
    any engine makes the identical keep call.
    """
    from .. import local_ckpt
    from ..functions.hashing import md5int64
    from ..functions.text import token_count_ws
    from .ordering import distributed_cumsum

    sz = (
        F.col(size_col).cast("long")
        if size_col
        else token_count_ws(F.col(text_col)).cast("long")
    )
    sized = docs.select(
        F.col(id_col),
        F.col(source_col),
        sz.alias("__sz"),
        md5int64(
            F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
        ).alias("__ord"),
    )
    cum = local_ckpt(
        distributed_cumsum(
            sized,
            [source_col, "__ord", id_col],
            "__sz",
            out_col="__cum",
            num_partitions=num_partitions,
        )
    )  # consumed twice (offsets agg + join) — pin the Arrow cumsum pass
    offsets = cum.groupBy(source_col).agg(F.min("__cum").alias("__off"))
    if budgets:
        bmap = F.create_map(
            *[F.lit(x) for kv in budgets.items() for x in (kv[0], int(kv[1]))]
        )
        budget = bmap[F.col(source_col)]
    else:  # create_map() with no args is map<void,void> — unlookupable
        budget = F.lit(None).cast("long")
    if default_budget is not None:
        budget = F.coalesce(budget, F.lit(int(default_budget)))
    in_cum = F.col("__cum") - F.col("__off")
    return (
        cum.join(F.broadcast(offsets), source_col)
        .select(
            F.col(id_col),
            F.col(source_col),
            F.col("__sz").alias("n_tokens"),
            in_cum.alias("cum_before"),
            (
                budget.isNull()
                | (in_cum + F.col("__sz") <= budget)
            ).alias("keep"),
        )
    )
