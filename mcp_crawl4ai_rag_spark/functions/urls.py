"""URL kernel library: canonicalization, classification, filtering, hashing.

Re-expresses the reference's URL helpers (src/crawl4ai_mcp.py:105-173 and the
link-expansion filters at :1022-1053) as pure Spark column expressions so they
stay inside whole-stage codegen. The single genuinely non-columnar operation
(RFC-3986 relative-reference resolution, reference :1039 ``urljoin``) is split
into a columnar fast path covering absolute / root-relative / fragment hrefs
and an Arrow-batched pandas UDF slow path used only for dot-relative hrefs.

Python twins of each kernel (``py_*``) implement identical semantics for the
driver-side scalar uses (prefix derivation) and for differential tests.
"""

from __future__ import annotations

from urllib.parse import urldefrag, urljoin, urlparse

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ..config import BINARY_EXTENSIONS

# ---------------------------------------------------------------------------
# Columnar kernels
# ---------------------------------------------------------------------------

# Regex alternation equivalent to the reference's endswith-any-of list
# (src/crawl4ai_mcp.py:131-139). '.' escaped; anchored at end.
_BINARY_EXT_RE = r"\.(" + "|".join(e.lstrip(".") for e in BINARY_EXTENSIONS) + r")$"


def canonical_url(url: Column | str) -> Column:
    """Crawl identity: strip the fragment (reference normalize_url,
    src/crawl4ai_mcp.py:984-985 — ``urldefrag(url)[0]``)."""
    c = F.col(url) if isinstance(url, str) else url
    return F.substring_index(c, "#", 1)


def comparison_normalize(url: Column | str) -> Column:
    """Prefix-matching normal form (reference normalize_url_for_comparison,
    src/crawl4ai_mcp.py:105-119): strip ALL trailing '/' then remove the
    literal substrings 'https://' and 'http://' (anywhere, in that order —
    matching the reference's ``str.replace`` semantics exactly)."""
    c = F.col(url) if isinstance(url, str) else url
    c = F.regexp_replace(c, r"/+$", "")
    c = F.regexp_replace(c, r"https://", "")
    return F.regexp_replace(c, r"http://", "")


def is_binary_url(url: Column | str) -> Column:
    """True for URLs the crawler must never schedule (reference
    is_binary_file, src/crawl4ai_mcp.py:121-144). '.xml.gz' is exempt."""
    c = F.col(url) if isinstance(url, str) else url
    lower = F.lower(c)
    return (~lower.endswith(".xml.gz")) & lower.rlike(_BINARY_EXT_RE)


def is_sitemap_url(url: Column | str) -> Column:
    """Sitemap classifier (reference is_sitemap, src/crawl4ai_mcp.py:146-161):
    endswith sitemap.xml / sitemap.xml.gz / sitemap_index.xml, or 'sitemap'
    appears in the lowercased URL's path component."""
    c = F.col(url) if isinstance(url, str) else url
    lower = F.lower(c)
    path = url_path(lower)
    return (
        lower.endswith("sitemap.xml")
        | lower.endswith("sitemap.xml.gz")
        | lower.endswith("sitemap_index.xml")
        | path.contains("sitemap")
    )


def is_txt_url(url: Column | str) -> Column:
    """Text-file classifier (reference is_txt, src/crawl4ai_mcp.py:163-173).
    Case-SENSITIVE endswith, faithfully reproducing the reference."""
    c = F.col(url) if isinstance(url, str) else url
    return c.endswith(".txt")


def classify_url(url: Column | str) -> Column:
    """Dispatch order of smart_crawl_url (src/crawl4ai_mcp.py:699-758):
    txt → sitemap → webpage."""
    c = F.col(url) if isinstance(url, str) else url
    return (
        F.when(is_txt_url(c), F.lit("text_file"))
        .when(is_sitemap_url(c), F.lit("sitemap"))
        .otherwise(F.lit("webpage"))
    )


def is_valid_http_url(url: Column | str) -> Column:
    """Seed validation (reference src/crawl4ai_mcp.py:452-474): http(s)
    scheme plus a non-empty authority."""
    c = F.col(url) if isinstance(url, str) else url
    return c.rlike(r"^https?://[^/\s]+")


# Host/path via regex rather than parse_url: Spark 4's parse_url/try_parse_url
# reject/null URLs that Python's urlparse (the reference's parser,
# src/crawl4ai_mcp.py:1023,1047) tolerates — e.g. spaces in paths. These
# regexes reproduce urlparse's netloc/path splits for hierarchical URLs and
# never throw, keeping the whole filter chain inside codegen.
_NETLOC_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^?#]*)"


def url_host(url: Column | str) -> Column:
    """netloc equivalent (urlparse(url).netloc) for absolute URLs."""
    c = F.col(url) if isinstance(url, str) else url
    return F.regexp_extract(c, _NETLOC_RE, 1)


def url_path(url: Column | str) -> Column:
    c = F.col(url) if isinstance(url, str) else url
    return F.regexp_extract(c, _PATH_RE, 1)


def url_hash(url: Column | str) -> Column:
    """64-bit identity hash of the canonical URL for the URL-seen set
    (north_star: hashed canonical URLs). xxhash64 is a JVM built-in."""
    c = F.col(url) if isinstance(url, str) else url
    return F.xxhash64(c)


# ---------------------------------------------------------------------------
# Relative-reference resolution (reference src/crawl4ai_mcp.py:1039)
# ---------------------------------------------------------------------------


@F.pandas_udf(StringType())
def _urljoin_udf(base: pd.Series, href: pd.Series) -> pd.Series:
    # Arrow-batched; only invoked on the dot-relative minority of hrefs.
    return pd.Series(
        [urljoin(b, h) if h else b for b, h in zip(base, href)], dtype="object"
    )


def resolve_href(base: Column, href: Column) -> Column:
    """Absolute URL for a discovered href, = ``urljoin(base, href)``.

    Columnar fast path (absolute, protocol-relative, root-relative, fragment,
    query) covers the overwhelming majority of real-world hrefs; dot-/plain-
    relative paths fall through to the Arrow UDF. Semantics verified against
    ``urllib.parse.urljoin`` in tests/test_urls.py.
    """
    scheme = F.regexp_extract(base, r"^([a-z][a-z0-9+.-]*):", 1)
    origin = F.regexp_extract(base, r"^([a-z][a-z0-9+.-]*://[^/?#]*)", 1)
    base_no_frag = F.substring_index(base, "#", 1)
    return (
        F.when(href.isNull() | (href == ""), base)
        .when(href.rlike(r"^[a-z][a-z0-9+.-]*://"), href)  # absolute
        .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .when(href.startswith("/"), F.concat(origin, href))  # root-relative
        .when(href.startswith("#"), F.concat(base_no_frag, href))
        .when(href.startswith("?"), F.concat(F.substring_index(base_no_frag, "?", 1), href))
        .otherwise(_urljoin_udf(base, href))  # dot-relative → Arrow UDF
    )


# ---------------------------------------------------------------------------
# Python twins (driver-side scalars + differential-test oracles)
# ---------------------------------------------------------------------------


def py_canonical_url(url: str) -> str:
    return urldefrag(url)[0]


def py_comparison_normalize(url: str) -> str:
    url = url.rstrip("/")
    return url.replace("https://", "").replace("http://", "")


def py_is_binary_url(url: str) -> bool:
    lower = url.lower()
    if lower.endswith(".xml.gz"):
        return False
    return any(lower.endswith(ext) for ext in BINARY_EXTENSIONS)


def py_is_sitemap(url: str) -> bool:
    lower = url.lower()
    return (
        lower.endswith("sitemap.xml")
        or lower.endswith("sitemap.xml.gz")
        or lower.endswith("sitemap_index.xml")
        or "sitemap" in urlparse(lower).path.lower()
    )


def py_is_txt(url: str) -> bool:
    return url.endswith(".txt")


def py_derive_prefix(url: str) -> str:
    """Default boundary-prefix derivation (reference src/crawl4ai_mcp.py:
    663-680): the start URL's directory — parent dir when the last path
    segment looks like a file, the domain root when there is no path."""
    parsed = urlparse(url)
    path = parsed.path.rstrip("/")
    if path and path != "/":
        last_segment = path.split("/")[-1]
        if last_segment and "." in last_segment and not last_segment.startswith("."):
            path = "/".join(path.split("/")[:-1])
        return f"{parsed.scheme}://{parsed.netloc}{path}"
    return f"{parsed.scheme}://{parsed.netloc}"


def py_resolve_href(base: str, href: str) -> str:
    return urljoin(base, href) if href else base


__all__ = [
    "canonical_url",
    "comparison_normalize",
    "is_binary_url",
    "is_sitemap_url",
    "is_txt_url",
    "classify_url",
    "is_valid_http_url",
    "url_host",
    "url_path",
    "url_hash",
    "resolve_href",
    "py_canonical_url",
    "py_comparison_normalize",
    "py_is_binary_url",
    "py_is_sitemap",
    "py_is_txt",
    "py_derive_prefix",
    "py_resolve_href",
]


def is_internal_href(href: Column, page_host: Column) -> Column:
    """crawl4ai-style internal/external link classification (the counts the
    reference reports per page, src/crawl4ai_mcp.py:523-527): a relative
    href (no scheme) is internal by definition; an absolute one is internal
    iff its host equals the page's host.

    Three href shapes must NOT fall through to 'relative ⇒ internal':
    protocol-relative ``//host/...`` (internal iff same host), uppercase
    schemes (``HTTP://...`` — schemes are case-insensitive), and
    non-hierarchical schemes (``mailto:``, ``tel:``, ``javascript:`` —
    never internal page links).

    Host comparison is case-insensitive (RFC 3986 §3.2.2: URI hosts are
    case-insensitive) — ``//EXAMPLE.COM/x`` on page_host ``example.com``
    is internal."""
    absolute = href.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*://")
    proto_rel = href.startswith("//")
    opaque = href.rlike(r"^[A-Za-z][A-Za-z0-9+.\-]*:")  # any scheme at all
    phost = F.lower(page_host)
    return (
        F.when(
            proto_rel,
            F.lower(url_host(F.concat(F.lit("http:"), href))) == phost,
        )
        .when(absolute, F.lower(url_host(href)) == phost)
        .when(opaque, F.lit(False))
        .otherwise(F.lit(True))
    )


def keyword_relevance_milli(url: Column | str, keywords: list[str]) -> Column:
    """Best-first URL relevance score, fixed-pointed to milli-units.

    crawl4ai's BestFirstCrawlingStrategy orders its frontier by a
    ``KeywordRelevanceScorer``: score = (keywords present in the URL) /
    (total keywords), case-insensitive (crawl4ai 0.6.2
    deep_crawling/scorers.py — the library the reference delegates deep
    crawling to; the north star names "BFS/best-first strategies"
    explicitly). Re-expressed as one codegen projection: sum of
    case-insensitive ``contains`` flags, then integer
    ``(1000 * hits) DIV len(keywords)`` so engine and oracle agree
    bit-for-bit with no float division at the boundary.
    """
    c = F.col(url) if isinstance(url, str) else url
    if not keywords:
        return F.lit(0)
    low = F.lower(c)
    hits = None
    for kw in keywords:
        flag = low.contains(kw.lower()).cast("int")
        hits = flag if hits is None else hits + flag
    # exact: numerator ≤ 1000·len(keywords), so the double division is
    # representable and the cast truncates == integer DIV
    return ((F.lit(1000) * hits).cast("long") / F.lit(len(keywords))).cast("long")


def best_first_priority(url: Column | str, keywords: list[str]) -> Column:
    """Keyword relevance negated into the frontier's ASCENDING ``priority``
    column (plans/crawl.py orders pops by depth, priority, seq) — a
    higher-relevance URL gets a smaller priority and is crawled sooner,
    which is exactly crawl4ai's best-first pop order within a depth level."""
    return (-keyword_relevance_milli(url, keywords)).cast("int")


def py_keyword_relevance_milli(url: str, keywords: list[str]) -> int:
    """Python twin of keyword_relevance_milli (differential tests)."""
    if not keywords:
        return 0
    low = url.lower()
    hits = sum(1 for kw in keywords if kw.lower() in low)
    return (1000 * hits) // len(keywords)


# -- best-first scorer family (crawl4ai deep_crawling/scorers.py shapes) -----
#
# Each scorer is one codegen projection producing an integer milli-score in
# [0, 1000]; composite_priority folds a weighted family into the frontier's
# ascending priority. Fixed-point throughout: the oracle restates the exact
# integer arithmetic, so engine and SQL twin agree bit-for-bit.

_YEAR_RE = r"(19|20)[0-9]{2}"


def path_depth_score_milli(url: Column | str, optimal_depth: int = 3) -> Column:
    """crawl4ai PathDepthScorer shape: score = 1/(1+|depth−optimal|) where
    depth = number of non-empty path segments; milli = 1000 DIV (1+|Δ|)."""
    c = F.col(url) if isinstance(url, str) else url
    path = url_path(c)
    segs = F.size(F.filter(F.split(path, "/"), lambda s: s != F.lit("")))
    delta = F.abs(segs - F.lit(optimal_depth))
    return (F.lit(1000) / (F.lit(1) + delta)).cast("long")


def freshness_score_milli(url: Column | str, now_year: int) -> Column:
    """crawl4ai FreshnessScorer shape: first 19xx/20xx year in the URL;
    milli = 1000 − 100·(now−year) clamped to [0,1000]; no year → 500.
    ``now_year`` is an explicit parameter (deterministic plans — never a
    clock read inside the expression)."""
    c = F.col(url) if isinstance(url, str) else url
    year = F.regexp_extract(c, _YEAR_RE, 0)
    y = F.when(year == "", F.lit(None)).otherwise(year.cast("int"))
    raw = F.lit(1000) - F.lit(100) * (F.lit(now_year) - y)
    # explicit no-year branch: Spark's greatest/least IGNORE nulls, so a
    # clamp over a null raw would silently return the clamp bound instead
    # of falling through to the default
    return F.when(
        y.isNull(), F.lit(500)
    ).otherwise(F.greatest(F.lit(0), F.least(F.lit(1000), raw))).cast("long")


def domain_authority_milli(
    url: Column | str, weights: dict[str, int], default_milli: int = 500
) -> Column:
    """crawl4ai DomainAuthorityScorer shape: per-host milli-weight lookup
    with a default. The weights map is broadcast as a literal MapType
    (empty dict short-circuits — F.create_map() with zero args is
    map<void,void> and breaks lookups)."""
    c = F.col(url) if isinstance(url, str) else url
    if not weights:
        return F.lit(int(default_milli)).cast("long")
    pairs: list[Column] = []
    for host, w in weights.items():
        pairs.extend([F.lit(host.lower()), F.lit(int(w))])
    m = F.create_map(*pairs)
    # hosts are case-insensitive (RFC 3986 §3.2.2): lowercase both sides
    return F.coalesce(m[F.lower(url_host(c))], F.lit(int(default_milli))).cast("long")


def composite_priority(components: list[tuple[Column, int]]) -> Column:
    """crawl4ai CompositeScorer shape: weighted integer mean of milli-score
    columns → negated into the frontier's ascending priority.
    ``components`` = [(milli_score_col, weight)]; priority =
    −(Σ wᵢ·sᵢ DIV Σ wᵢ)."""
    if not components:
        return F.lit(0).cast("int")
    total_w = sum(w for _, w in components)
    acc = None
    for col, w in components:
        term = col * F.lit(int(w))
        acc = term if acc is None else acc + term
    return (-(acc / F.lit(int(total_w))).cast("long")).cast("int")


def py_path_depth_score_milli(url: str, optimal_depth: int = 3) -> int:
    p = urlparse(url).path if "://" in url else url
    segs = len([s for s in p.split("/") if s])
    return 1000 // (1 + abs(segs - optimal_depth))


def py_freshness_score_milli(url: str, now_year: int) -> int:
    import re

    m = re.search(_YEAR_RE, url)
    if not m:
        return 500
    return max(0, min(1000, 1000 - 100 * (now_year - int(m.group(0)))))


def py_domain_authority_milli(
    url: str, weights: dict[str, int], default_milli: int = 500
) -> int:
    host = urlparse(url).netloc.lower()
    return int({k.lower(): v for k, v in weights.items()}.get(host, default_milli))


def py_composite_priority(scores: list[tuple[int, int]]) -> int:
    if not scores:
        return 0
    return -(sum(s * w for s, w in scores) // sum(w for _, w in scores))


def _glob_to_regex(pattern: str) -> str:
    """fnmatch-style glob → anchored regex: ``*`` = any run (including
    ``/``, crawl4ai URLPatternFilter semantics), ``?`` = any one char;
    everything else is literal. Character classes (``[seq]``) are NOT
    supported — brackets match literally (URLs rarely carry them; callers
    needing classes should pass a regex-based filter directly)."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            # escape regex metacharacters byte-for-byte
            out.append("\\" + ch if ch in r"\.^$+{}[]|()" else ch)
    return "^" + "".join(out) + "$"


def url_pattern_match(url: Column | str, patterns: list[str]) -> Column:
    """crawl4ai URLPatternFilter shape: True when the URL matches ANY of
    the fnmatch-style glob patterns (``*/docs/*``, ``*.txt``, …). The
    translation to an anchored regex alternation happens once in Python;
    the match is a single codegen ``rlike``. Empty pattern list matches
    nothing (the filter passes no URL — match-any is the caller's choice
    via ``['*']``)."""
    c = F.col(url) if isinstance(url, str) else url
    if not patterns:
        return F.lit(False)
    alts = "|".join(f"(?:{_glob_to_regex(p)[1:-1]})" for p in patterns)
    return c.rlike(f"^(?:{alts})$")


def py_url_pattern_match(url: str, patterns: list[str]) -> bool:
    """Python twin (fnmatchcase — same ``*``/``?`` semantics, no locale
    case folding)."""
    from fnmatch import fnmatchcase

    return any(fnmatchcase(url, p) for p in patterns)


_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://"
_QUERY_RE = r"^[^?#]*\?([^#]*)"
# tracking parameters every canonicalizer strips: any utm_* name, plus the
# exact common click identifiers. EXACT name match for the latter —
# a prefix match would eat legitimate params ('ref' must not strip
# 'refresh')
_TRACKING_NAME_PREFIXES = ("utm_",)
_TRACKING_NAMES = frozenset(("fbclid", "gclid", "msclkid", "mc_eid", "ref"))


def canonical_url_strict(url: Column | str) -> Column:
    """Aggressive crawl canonicalization — the identity a broad crawler
    uses so ``?b=2&a=1`` and ``?a=1&b=2`` (and utm-decorated copies) don't
    crawl twice. Beyond the reference's fragment strip:

    - scheme and host lowercased (RFC 3986 §6.2.2.1 case normalization);
    - default ports dropped (``:80`` for http, ``:443`` for https);
    - query parameters with tracking names (utm_*, fbclid, gclid,
      msclkid, mc_eid, ref) removed, the rest SORTED; an emptied query
      drops its ``?``;
    - fragment stripped.

    One Catalyst projection (split / filter / array_sort / array_join) —
    no Python. Parameter VALUES keep their case; paths keep theirs."""
    c = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(c, _SCHEME_RE, 1))
    host = F.lower(url_host(c))
    host = F.when(
        scheme == "http", F.regexp_replace(host, ":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(host, ":443$", "")
    ).otherwise(host)
    path = url_path(c)
    query = F.regexp_extract(c, _QUERY_RE, 1)
    def _tracking(p):
        name = F.substring_index(p, "=", 1)
        hit = F.lit(False)
        for pref in _TRACKING_NAME_PREFIXES:
            hit = hit | name.startswith(pref)
        for exact in sorted(_TRACKING_NAMES):
            hit = hit | (name == exact)
        return hit

    kept = F.array_sort(
        F.filter(F.split(query, "&"), lambda p: (p != F.lit("")) & ~_tracking(p))
    )
    qs = F.array_join(kept, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )


def py_canonical_url_strict(url: str) -> str:
    """Python twin of canonical_url_strict (differential tests)."""
    from urllib.parse import urlsplit

    p = urlsplit(url)
    scheme = p.scheme.lower()
    host = p.netloc.lower()
    if scheme == "http" and host.endswith(":80"):
        host = host[:-3]
    elif scheme == "https" and host.endswith(":443"):
        host = host[:-4]
    def tracking(seg: str) -> bool:
        name = seg.split("=", 1)[0]
        return name in _TRACKING_NAMES or any(
            name.startswith(pref) for pref in _TRACKING_NAME_PREFIXES
        )

    kept = sorted(seg for seg in p.query.split("&") if seg and not tracking(seg))
    qs = "&".join(kept)
    return f"{scheme}://{host}{p.path}" + (f"?{qs}" if qs else "")


def filter_chain(conditions: list[Column]) -> Column:
    """crawl4ai FilterChain shape: a URL survives iff EVERY filter passes
    — one AND fold, stays a single codegen predicate. Empty chain passes
    everything (crawl4ai's default)."""
    acc = F.lit(True)
    for cond in conditions:
        acc = acc & cond
    return acc


def with_link_counts(
    df: Column | "DataFrame",  # DataFrame; Column in sig for symmetry only
    url_col: str = "url",
    links_col: str = "out_links",
):
    """Add n_internal / n_external link counts per page — pure Catalyst
    (size of a filtered array, no resolution round-trip needed because
    internal-ness is decidable from scheme + host alone)."""
    host = url_host(F.col(url_col))
    links = F.coalesce(F.col(links_col), F.array())
    n_int = F.size(F.filter(links, lambda h: is_internal_href(h, host)))
    return df.withColumn("n_internal", n_int).withColumn(
        "n_external", F.size(links) - n_int
    )


# ---------------------------------------------------------------------------
# Crawl-trap (spider-trap) detection
# ---------------------------------------------------------------------------
# The reference has no trap defense at all: crawl4ai's deep-crawl strategies
# follow every in-boundary link (the reference consumes them verbatim,
# src/crawl4ai_mcp.py:1022-1053), so an infinite calendar, a session-id
# explosion, or a cyclic path grows the frontier without bound. Division of
# labor among the guards below: the Heritrix run rule catches SINGLE-segment
# repetition ('/x/x/x'); an ALTERNATING cycle ('/a/b/a/b/...') has run 1 and
# is caught by the segment-COUNT cap once the path exceeds TRAP_MAX_SEGMENTS
# (so a period-2 cycle survives at most ~TRAP_MAX_SEGMENTS/2 junk
# generations before the cap fires), with the URL-length cap as backstop. At a 10^10-URL frontier these URL families are a dominant junk
# source, and every production crawler ships structural guards; the public
# precedents are Heritrix's PathologicalPathDecideRule (same segment repeated
# more than N times consecutively) and TooManyPathSegmentsDecideRule, plus
# the universal query-parameter-count and URL-length caps.
#
# All four signals are pure Catalyst over the URL string (split / filter /
# aggregate lambdas): one codegen projection, zero shuffle, no Python, so the
# guard can sit in the discovered-link filter chain at frontier scale for the
# cost of a projection.

TRAP_MAX_SEG_RUN = 2  # >2 consecutive identical path segments = pathological
TRAP_MAX_SEGMENTS = 20  # more path segments than this = trap
TRAP_MAX_QUERY_PARAMS = 10  # more '&'-separated params than this = trap
TRAP_MAX_URL_LEN = 2048  # longer than this = trap


def path_segment_array(url: Column | str) -> Column:
    """Non-empty path segments of the URL as an array."""
    c = F.col(url) if isinstance(url, str) else url
    return F.filter(F.split(url_path(c), "/"), lambda s: s != "")


def max_segment_run(url: Column | str) -> Column:
    """Length of the longest run of CONSECUTIVE identical path segments
    (the Heritrix pathological-path signal: '/x/x/x' has run 3). Empty
    path -> 0. One aggregate fold over the segment array - stays columnar."""
    segs = path_segment_array(url)
    zero = F.lit(0).cast("long")
    state = F.aggregate(
        segs,
        F.struct(
            F.lit("/").alias("prev"),  # impossible segment value
            zero.alias("run"),
            zero.alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(
                    F.lit(1).cast("long")
                ),
            ).alias("best"),
        ),
    )
    return state["best"]


def url_path_query(url: Column | str) -> Column:
    """Path plus optional '?query' of a URL — the RFC 9309 match target
    (robots rules match against the path INCLUDING the query string:
    '/*.php' matches '/index.php?parameters'); fragment excluded."""
    c = F.col(url) if isinstance(url, str) else url
    q = F.regexp_extract(c, _QUERY_RE, 1)
    return F.concat(
        url_path(c),
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )


def py_url_path_query(url: str) -> str:
    """Python twin of url_path_query."""
    p = _py_url_path(url)
    q = _py_url_query(url)
    return p + (f"?{q}" if q else "")


def query_param_count(url: Column | str) -> Column:
    """Number of non-empty '&'-separated query parameters (0 if no query)."""
    c = F.col(url) if isinstance(url, str) else url
    q = F.regexp_extract(c, _QUERY_RE, 1)
    return F.size(F.filter(F.split(q, "&"), lambda p: p != "")).cast("long")


def is_crawl_trap(
    url: Column | str,
    max_seg_run: int = TRAP_MAX_SEG_RUN,
    max_segments: int = TRAP_MAX_SEGMENTS,
    max_query_params: int = TRAP_MAX_QUERY_PARAMS,
    max_url_len: int = TRAP_MAX_URL_LEN,
) -> Column:
    """True iff any structural trap signal fires. Composes with
    ``filter_chain`` (pass ``~is_crawl_trap(col)``) so the guard rides the
    existing discovered-link filter pipeline as one fused predicate."""
    c = F.col(url) if isinstance(url, str) else url
    return (
        (max_segment_run(c) > F.lit(max_seg_run))
        | (F.size(path_segment_array(c)) > F.lit(max_segments))
        | (query_param_count(c) > F.lit(max_query_params))
        | (F.length(c) > F.lit(max_url_len))
    )


# --- Registrable domain (eTLD+1): the grain real politeness runs at.
# 'a.example.com' and 'b.example.com' are one server farm — throttling per
# HOSTNAME lets a crawler hammer a domain N-subdomains fast. The public
# precedent is the Mozilla Public Suffix List; vendoring all ~9k suffixes
# buys nothing for an engine whose politeness only needs the common shapes,
# so a small built-in set covers the multi-label suffixes and single-label
# TLDs fall out of the default rule (registrable = last 2 labels, or last 3
# when the last 2 form a listed suffix like 'co.uk'). IP literals and
# single-label hosts return themselves.

_MULTI_LABEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "com.tw", "com.sg", "github.io", "gitlab.io", "blogspot.com",
)


def registrable_domain(host: Column | str) -> Column:
    """eTLD+1 of a hostname column — one codegen expression (split +
    slice + when-chain over the built-in suffix set); lowercases first
    and strips a trailing-dot FQDN root ('example.com.' is the same host
    as 'example.com'; without the strip every .com FQDN would collapse
    into one 'com.' politeness bucket)."""
    c = F.regexp_replace(
        F.lower(F.col(host) if isinstance(host, str) else host), r"\.+$", ""
    )
    labels = F.split(c, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, -2, 2), ".")
    last3 = F.array_join(F.slice(labels, -3, 3), ".")
    is_ip = c.rlike(r"^[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+$")
    suffix_hit = F.lit(False)
    for s in _MULTI_LABEL_SUFFIXES:
        suffix_hit = suffix_hit | (last2 == s)
    return (
        F.when(is_ip | (n <= 2), c)
        .when(suffix_hit & (n >= 3), last3)
        .otherwise(last2)
    )


def py_registrable_domain(host: str) -> str:
    """Python twin of registrable_domain."""
    import re as _re

    h = host.lower().rstrip(".")
    labels = h.split(".")
    if _re.fullmatch(r"[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+", h) or len(labels) <= 2:
        return h
    if ".".join(labels[-2:]) in _MULTI_LABEL_SUFFIXES and len(labels) >= 3:
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])


# --- URL templates: the aggregate complement of the structural trap guard.
# A session-id explosion or infinite calendar often passes every per-URL
# structural check — each URL looks fine; the FAMILY is infinite. The
# standard defense is template aggregation: generalize volatile path
# segments to class tokens, count URLs per (host, template), and cap the
# family. Generalization rules, first match wins per segment:
#   digits-only           -> 'N'   (ids, years, pages)
#   [0-9a-f]{8,}          -> 'H'   (hashes, uuids-sans-dashes, session ids)
#   longer than 32 chars  -> 'L'   (blobs, encoded state)
#   contains a digit      -> 'S'   (mixed slugs: 's17', 'item-4')
#   else                  -> the literal segment, lowercased
# Query parameter VALUES are dropped entirely; the sorted parameter NAMES
# stay (the name set identifies the family, the values explode it).

TEMPLATE_MAX_URLS = 100_000  # default per-(host,template) family cap


def url_template(url: Column | str) -> Column:
    """Generalized URL family key: host + classed path segments + sorted
    query-parameter names. One Catalyst projection (split / transform /
    array_sort / concat) — zero shuffle, no Python."""
    c = F.col(url) if isinstance(url, str) else url
    # classify the LOWERCASED segment: hex session ids arrive in either
    # case ('DEADBEEF' is the same family as 'deadbeef'); classifying the
    # raw segment would let uppercase-hex ids escape generalization and
    # each become its own template, defeating the explosion guard
    low = lambda s: (  # noqa: E731 — inline classifier, used once
        F.when(s.rlike(r"^[0-9]+$"), F.lit("N"))
        .when(s.rlike(r"^[0-9a-f]{8,}$"), F.lit("H"))
        .when(F.length(s) > 32, F.lit("L"))
        .when(s.rlike(r"[0-9]"), F.lit("S"))
        .otherwise(s)
    )
    segs = F.transform(path_segment_array(c), lambda s: low(F.lower(s)))
    q = F.regexp_extract(c, _QUERY_RE, 1)
    names = F.array_sort(
        F.transform(
            F.filter(F.split(q, "&"), lambda p: p != ""),
            lambda p: F.substring_index(p, "=", 1),
        )
    )
    path_part = F.concat(F.lit("/"), F.array_join(segs, "/"))
    q_part = F.when(
        F.size(names) > 0, F.concat(F.lit("?"), F.array_join(names, "&"))
    ).otherwise(F.lit(""))
    return F.concat(F.lower(url_host(c)), path_part, q_part)


def py_url_template(url: str) -> str:
    """Python twin of url_template (kernel-faithful extraction)."""
    import re as _re

    def classify(s: str) -> str:
        s = s.lower()  # case-blind families, same as the Catalyst kernel
        if _re.fullmatch(r"[0-9]+", s):
            return "N"
        if _re.fullmatch(r"[0-9a-f]{8,}", s):
            return "H"
        if len(s) > 32:
            return "L"
        if _re.search(r"[0-9]", s):
            return "S"
        return s

    segs = [classify(s) for s in _py_url_path(url).split("/") if s]
    q = _py_url_query(url)
    names = sorted(seg.split("=", 1)[0] for seg in q.split("&") if seg) if q else []
    out = _py_url_host(url).lower() + "/" + "/".join(segs)
    if names:
        out += "?" + "&".join(names)
    return out


# Kernel-faithful scalar extraction: the Catalyst kernels use the same
# anchored regexes (url_path/url_host require 'scheme://' and yield ''
# otherwise; the query regex works scheme-less) — the twins MUST mirror
# that, not urlsplit, or twin and column verdicts diverge on relative
# input (e.g. '/a/a/a' has urlsplit path '/a/a/a' but kernel path '').
import re as _re_mod

_PY_PATH_RE = _re_mod.compile(_PATH_RE)
_PY_QUERY_RE = _re_mod.compile(_QUERY_RE)
_PY_NETLOC_RE = _re_mod.compile(_NETLOC_RE)


def _py_url_path(url: str) -> str:
    m = _PY_PATH_RE.match(url)
    return m.group(1) if m else ""


def _py_url_query(url: str) -> str:
    m = _PY_QUERY_RE.match(url)
    return m.group(1) if m else ""


def _py_url_host(url: str) -> str:
    m = _PY_NETLOC_RE.match(url)
    return m.group(1) if m else ""


def py_max_segment_run(url: str) -> int:
    """Python twin of max_segment_run (kernel-faithful path extraction)."""
    segs = [s for s in _py_url_path(url).split("/") if s]
    best = run = 0
    prev = None
    for s in segs:
        run = run + 1 if s == prev else 1
        best = max(best, run)
        prev = s
    return best


def py_is_crawl_trap(
    url: str,
    max_seg_run: int = TRAP_MAX_SEG_RUN,
    max_segments: int = TRAP_MAX_SEGMENTS,
    max_query_params: int = TRAP_MAX_QUERY_PARAMS,
    max_url_len: int = TRAP_MAX_URL_LEN,
) -> bool:
    """Python twin of is_crawl_trap (kernel-faithful extraction)."""
    segs = [s for s in _py_url_path(url).split("/") if s]
    q = _py_url_query(url)
    n_params = len([s for s in q.split("&") if s]) if q else 0
    return (
        py_max_segment_run(url) > max_seg_run
        or len(segs) > max_segments
        or n_params > max_query_params
        or len(url) > max_url_len
    )
