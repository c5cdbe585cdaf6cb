"""robots.txt source: parse fetched robots bodies into the engine's
``robots`` table ``(host, disallow_prefixes, crawl_delay)``.

The reference delegates robots handling to crawl4ai entirely (docs claim
"Robots.txt compliance" and crawl-delay respect, docs/architecture.md:58,
docs/api.md:574 — the reference never parses robots itself); this module
closes that loop for the engine: fetch robots.txt per host (a tiny
fetch-join, same shape as the page fetch), parse the bodies in one Arrow
batch stage, and feed the result straight into
``operators/politeness.robots_denied_expr`` / ``attach_budgets``.

Parsing semantics (the subset the politeness model consumes, per RFC 9309):

- group selection: the ``User-agent: *`` group(s); a specific-agent
  parameter can override. Multiple consecutive ``User-agent`` lines share
  one group; a blank-line or a new ``User-agent`` after rules starts a new
  group.
- ``Disallow:`` values of the selected groups become ``disallow_prefixes``
  (empty value = allow-all, contributes nothing). The DEFAULT engine gate
  is prefix-deny-only (robots_denied_expr), a strictly more conservative
  crawler; ``parse_robots_rules`` additionally collects ``Allow:`` into
  ``allow_prefixes`` for the RFC 9309 longest-match-precedence gate
  (operators/politeness.robots_denied_rfc_expr), which the crawl engine
  selects automatically when its robots table carries that column.
- ``Crawl-delay:`` the first valid value among selected groups (an
  extension directive, but the politeness model is built around it).
- unknown directives and comments (``#``) are ignored; matching is
  case-insensitive on directive names, values keep their case.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

ROBOTS_SCHEMA = "host string, disallow_prefixes array<string>, crawl_delay double"


def py_parse_robots(body: str, agent: str = "*") -> tuple[list[str], float | None]:
    """Pure-Python robots.txt parse → (disallow_prefixes, crawl_delay).
    Shared by the Arrow stage and the tests' expectations.

    Disallow prefixes UNION across every matching group (documented
    strictly-more-conservative deviation from RFC 9309's pick-one-group).
    Crawl-delay follows RFC precedence: a group naming ``agent``
    specifically governs over a ``*`` group (first wins within the same
    specificity) — otherwise a specific 'Crawl-delay: 60' after a generic
    'Crawl-delay: 1' would be ignored and the host crawled 60× too fast.
    Non-positive delays are dropped (a 'Crawl-delay: 0' means unthrottled;
    propagating 0 into budget = floor(epoch/delay) would divide by zero)."""
    disallow, _allow, delay = py_parse_robots_rules(body, agent)
    return disallow, delay


def py_parse_robots_rules(
    body: str, agent: str = "*"
) -> tuple[list[str], list[str], float | None]:
    """Full-rules robots.txt parse → (disallow, allow, crawl_delay) —
    the RFC 9309 §2.2.2 rule set including ``Allow:``, for the
    longest-match-precedence gate (operators/politeness.
    robots_denied_rfc_expr). Group selection / crawl-delay semantics are
    identical to :func:`py_parse_robots` (which delegates here)."""
    disallow: list[str] = []
    allow: list[str] = []
    delay_specific: float | None = None
    delay_generic: float | None = None
    selected = False  # inside a group whose user-agents include `agent`/*
    specific = False  # ...and that group names `agent` itself
    agents_open = False  # consecutive User-agent lines build one group
    group_agents: list[str] = []
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        if ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not agents_open:
                group_agents = []
                agents_open = True
            group_agents.append(val.lower())
            specific = agent.lower() in group_agents
            selected = specific or "*" in group_agents
            continue
        agents_open = False
        if not selected:
            continue
        if key == "disallow":
            if val:
                disallow.append(val)
        elif key == "allow":
            if val:
                allow.append(val)
        elif key == "crawl-delay":
            try:
                d = float(val)
            except ValueError:
                continue
            if d <= 0:
                continue
            if specific and delay_specific is None:
                delay_specific = d
            elif not specific and delay_generic is None:
                delay_generic = d
    return (
        disallow,
        allow,
        delay_specific if delay_specific is not None else delay_generic,
    )


def parse_robots_bodies(fetched: DataFrame, agent: str = "*") -> DataFrame:
    """(host, body string) → the engine's robots table, one Arrow-batched
    stage (no per-row Python at the DataFrame boundary)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for host, body in zip(pdf["host"], pdf["body"]):
                dis, delay = py_parse_robots(body or "", agent)
                rows.append((host, dis, delay))
            yield pd.DataFrame(
                rows, columns=["host", "disallow_prefixes", "crawl_delay"]
            )

    return fetched.select("host", "body").mapInPandas(gen, schema=ROBOTS_SCHEMA)


RULES_SCHEMA = (
    "host string, disallow_prefixes array<string>, "
    "allow_prefixes array<string>, crawl_delay double"
)


def parse_robots_rules(fetched: DataFrame, agent: str = "*") -> DataFrame:
    """(host, body) → the FULL-rules robots table including
    ``allow_prefixes`` — feed to ``robots_denied_rfc_expr`` for RFC 9309
    longest-match precedence (the deny-only ``parse_robots_bodies`` table
    stays the conservative default). One Arrow-batched stage."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for host, body in zip(pdf["host"], pdf["body"]):
                dis, alw, delay = py_parse_robots_rules(body or "", agent)
                rows.append((host, dis, alw, delay))
            yield pd.DataFrame(
                rows,
                columns=[
                    "host", "disallow_prefixes", "allow_prefixes", "crawl_delay",
                ],
            )

    return fetched.select("host", "body").mapInPandas(gen, schema=RULES_SCHEMA)


def py_parse_robots_sitemaps(body: str) -> list[str]:
    """Pure-Python twin: the ``Sitemap:`` directives of a robots.txt body,
    in file order, deduped. Per the sitemaps.org protocol (and RFC 9309
    §2.2.4's treatment of non-group lines) ``Sitemap`` is a GLOBAL
    directive — it belongs to no user-agent group, so collection ignores
    group selection entirely. Values must be absolute URLs; anything
    without a scheme is dropped (the protocol requires full URLs)."""
    out: list[str] = []
    seen: set[str] = set()
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        key, _, val = line.partition(":")
        if key.strip().lower() != "sitemap":
            continue
        val = val.strip()
        if not val.lower().startswith(("http://", "https://")):
            continue
        if val not in seen:
            seen.add(val)
            out.append(val)
    return out


def parse_robots_sitemaps(fetched: DataFrame) -> DataFrame:
    """(host, body) → (host, sitemap_url): sitemap AUTO-DISCOVERY — the
    standard way a crawler finds sitemaps at web scale (the reference's
    smart_crawl only takes sitemap URLs the caller already knows,
    src/crawl4ai_mcp.py:439-462; a 10^10-URL frontier discovers them from
    the robots fetch it already performs). One Arrow-batched stage, one
    row per discovered sitemap; the output feeds
    sources/sitemap.expand_sitemaps directly."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for host, body in zip(pdf["host"], pdf["body"]):
                for u in py_parse_robots_sitemaps(body or ""):
                    rows.append((host, u))
            yield pd.DataFrame(rows, columns=["host", "sitemap_url"])

    return fetched.select("host", "body").mapInPandas(
        gen, schema="host string, sitemap_url string"
    )


# ---------------------------------------------------------------------------
# RFC 9309 section 2.2.3 special characters: '*' and '$'
# ---------------------------------------------------------------------------

PATTERN_SCHEMA = (
    "host string,"
    " disallow_pats array<struct<re: string, len: int>>,"
    " allow_pats array<struct<re: string, len: int>>,"
    " crawl_delay double"
)

_RE_SPECIALS = r"\.^+?{}[]|()"


def py_compile_robots_pattern(rule: str) -> tuple[str, int]:
    """One robots rule -> (anchored Java/RE2-safe regex, specificity).

    RFC 9309 section 2.2.3: '*' matches any sequence of characters; a
    TRAILING '$' anchors the rule at the end of the path ('$' anywhere
    else is a literal octet — the spec gives it meaning only as an
    end-of-match designator). Specificity for longest-match precedence
    (section 2.2.2 'most octets') is the octet length of the rule as
    written, wildcards included — the de-facto interpretation the major
    implementations share; prefix rules keep their old length, so this
    machinery strictly subsumes the prefix gate on wildcard-free tables.
    The regex uses only escaped literals, '.*', and anchors, so the Java
    (Spark) and RE2 (DuckDB oracle) engines agree on it by construction."""
    spec = len(rule)
    anchored_end = rule.endswith("$")
    body = rule[:-1] if anchored_end else rule
    out = []
    for ch in body:
        if ch == "*":
            out.append(".*")
        elif ch in _RE_SPECIALS or ch in ("$", "\\"):
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "^" + "".join(out) + ("$" if anchored_end else ""), spec


def compile_rule_patterns(rules: DataFrame) -> DataFrame:
    """Full-rules robots table -> wildcard-pattern table
    ``(host, disallow_pats, allow_pats, crawl_delay)`` where each rule is
    pre-compiled to ``(re, len)`` once per host (the table is host-count
    bounded — compiling here keeps the per-URL gate free of string
    munging). Feed to ``operators/politeness.robots_denied_wildcard_expr``;
    the crawl engine auto-selects that gate when its robots table carries
    ``disallow_pats``."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for host, dis, alw, delay in zip(
                pdf["host"],
                pdf["disallow_prefixes"],
                pdf["allow_prefixes"],
                pdf["crawl_delay"],
            ):
                rows.append(
                    (
                        host,
                        [py_compile_robots_pattern(r) for r in (dis if dis is not None else [])],
                        [py_compile_robots_pattern(r) for r in (alw if alw is not None else [])],
                        delay,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["host", "disallow_pats", "allow_pats", "crawl_delay"],
            )

    return rules.select(
        "host", "disallow_prefixes", "allow_prefixes", "crawl_delay"
    ).mapInPandas(gen, schema=PATTERN_SCHEMA)


# ---------------------------------------------------------------------------
# RFC 9309 section 2.3.1: robots.txt fetch-status semantics
# ---------------------------------------------------------------------------


def py_robots_status_rules(
    status: int | None, body: str | None, agent: str = "*"
) -> tuple[list[str], list[str], float | None]:
    """What rules govern a host whose robots.txt fetch returned ``status``:

    - 2xx: parse the body (RFC 9309 section 2.3.1.1);
    - 4xx (unavailable): crawl as if there were no robots.txt — ALLOW ALL
      (section 2.3.1.2, the universal implementation);
    - 5xx / None (unreachable, never fetched): assume full disallow until
      a fresh fetch succeeds (section 2.3.1.3);
    - terminal 3xx (redirect loop / too many hops — the fetch layer
      follows ordinary redirects before this function sees a status): the
      RFC leaves it open ('MAY' treat as unavailable); we pick the
      conservative full-disallow, same as 5xx.
    """
    if status is not None and 200 <= status < 300:
        return py_parse_robots_rules(body or "", agent)
    if status is not None and 400 <= status < 500:
        return [], [], None  # allow all
    return ["/"], [], None  # unreachable/5xx/3xx-terminal: full disallow


FETCH_RULES_SCHEMA = (
    "host string, disallow_prefixes array<string>,"
    " allow_prefixes array<string>,"
    " disallow_pats array<struct<re: string, len: int>>,"
    " allow_pats array<struct<re: string, len: int>>,"
    " crawl_delay double"
)


def robots_table_from_fetch(fetched: DataFrame, agent: str = "*") -> DataFrame:
    """(host, status int, body string) → the engine's robots table with the
    RFC 9309 section 2.3.1 status semantics applied per host. One
    Arrow-batched stage.

    The output carries BOTH the raw prefix rules (for introspection and
    the crawl_delay/budget dims) and the compiled ``disallow_pats`` /
    ``allow_pats`` wildcard patterns, so ``CrawlEngine(robots=...)``
    auto-selects the wildcard gate. This is load-bearing, not optional:
    real robots bodies carry '*'/'$' rules ('Disallow: /*?sessionid=*'),
    and feeding them into a prefix gate makes them dead letters — a
    'Disallow: /*' site would be crawled end to end because no path
    starts with the literal '/*'. The 5xx full-disallow sentinel '/'
    compiles to '^/' (matches every path) and 4xx yields no rules, so
    the status semantics survive compilation exactly."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for host, status, body in zip(
                pdf["host"], pdf["status"], pdf["body"]
            ):
                st = None if pd.isna(status) else int(status)
                dis, alw, delay = py_robots_status_rules(st, body, agent)
                rows.append(
                    (
                        host,
                        dis,
                        alw,
                        [py_compile_robots_pattern(r) for r in dis],
                        [py_compile_robots_pattern(r) for r in alw],
                        delay,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "host", "disallow_prefixes", "allow_prefixes",
                    "disallow_pats", "allow_pats", "crawl_delay",
                ],
            )

    return fetched.select("host", "status", "body").mapInPandas(
        gen, schema=FETCH_RULES_SCHEMA
    )
