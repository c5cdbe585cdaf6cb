"""Hazard corpus: every crawl-policy guard planted in ONE synthetic web.

Round-4 shipped eight individually-gated hardening surfaces (redirects,
trap guard, template guard, wildcard robots, eTLD+1 politeness, backoff,
max_pages, threshold pop); this corpus exists to prove they COMPOSE — a
single :class:`plans.crawl.CrawlEngine` run against it must thread every
guard at once, and the sequential twin (:func:`plans.crawl.
py_crawl_hardened`) replays the identical schedule for the oracle.

The graph is closed-form in ``m`` (page count) and fully deterministic:

* 5 hosts over 2 registrable domains (3× ``*.alpha-shop.com``,
  2× ``*.beta-mart.net``) — eTLD+1 politeness collapses them to TWO
  budget lanes while robots/fetch stay hostname-grain;
* page ids carry letters-only slugs (``base26``) so every normal URL is
  its own template family — the ONLY exploding family is the mill;
* statuses: ``404`` at ``i % 13 == 0`` (fetch fails, no expansion),
  ``429`` at ``i % 17 == 0`` (politeness backoff doubles the domain's
  delay next epoch), else 200;
* ``i % 11 == 3`` pages 301-redirect to ``(2i+5) % m`` — consumed
  without fetch, target re-enters at the SAME depth, pos -1;
* every 200-page links: two normal pages, a session-id MILL URL
  (``/sess/<16 hex>`` — the template-explosion guard's prey), and on
  residues: a crawl-trap path (``/x/x/x`` — link_filter prey), a
  ``/private/…`` URL (wildcard-robots prey), a ``/private/ok…`` URL
  (the RFC Allow override — scheduled AND fetched-missed), and a
  ``?sid=zz`` twin of a normal page (the query-pattern rule ``/*?sid=*``
  — provably needs the path+query match target).

Reference: crawl4ai composes none of these (the reference follows every
in-boundary link verbatim, src/crawl4ai_mcp.py:1022-1053); the composed
behavior here is the production-crawler baseline the engine adds.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession

HAZARD_HOSTS = (
    "h0.alpha-shop.com",
    "h1.alpha-shop.com",
    "h2.alpha-shop.com",
    "g0.beta-mart.net",
    "g1.beta-mart.net",
)
HAZ_404_MOD = 13
HAZ_429_MOD = 17
HAZ_REDIR_MOD = 11
HAZ_REDIR_RESIDUE = 3
HAZ_TRAP_MOD = 7
HAZ_DENY_MOD = 9
HAZ_ALLOWOK_MOD = 18
HAZ_SID_MOD = 10

# one rule set for every host: wildcard disallows (prefix + query pattern)
# with an Allow override that wins on specificity (RFC 9309 §2.2.2/2.2.3)
HAZ_ROBOTS_DISALLOW = ("/private/*", "/*?sid=*")
HAZ_ROBOTS_ALLOW = ("/private/ok*",)

# engine knobs of the composed run — one definition shared by the engine
# call sites (gate + bench + tests) and the twin. Tuned so every guard
# FIRES (not merely loads): budgets bind (politeness deferrals push pops
# past their BFS depth), backoff bites (429s shrink later budgets), the
# mill families cross the template cap, and max_pages truncates the run.
HAZ_MAX_DEPTH = 6
HAZ_MAX_EPOCHS = 14
HAZ_EPOCH_SECONDS = 30.0  # budget 15/domain at the 2.0 s delay midpoint
HAZ_TEMPLATE_CAP = 8
HAZ_SEED_COUNT = 10  # two seeds per host
HAZ_MAX_PAGES = 200  # bites: the unbounded schedule runs 220-250 pages


def base26(i: int) -> str:
    """Letters-only slug of ``i`` ('a'..'z' digits) — keeps every normal
    URL in its own template family (no digit ⇒ no N/S generalization)."""
    s = ""
    i = int(i)
    while True:
        s = chr(ord("a") + i % 26) + s
        i //= 26
        if i == 0:
            return s


def hz_host(i: int) -> str:
    return HAZARD_HOSTS[i % len(HAZARD_HOSTS)]


def hz_url(i: int) -> str:
    return f"https://{hz_host(i)}/articles/{base26(i)}"


def hz_status(i: int) -> int:
    if i % HAZ_404_MOD == 0:
        return 404
    if i % HAZ_429_MOD == 0:
        return 429
    return 200


def hz_redirect_url(i: int, m: int) -> str | None:
    if i % HAZ_REDIR_MOD == HAZ_REDIR_RESIDUE:
        return hz_url((2 * i + 5) % m)
    return None


def hz_mill_url(i: int) -> str:
    hx = hashlib.md5(f"mill{i}".encode()).hexdigest()[:16]
    return f"https://{hz_host(i)}/sess/{hx}"


def hz_links(i: int, m: int) -> list[str]:
    links = [
        hz_url((3 * i + 1) % m),
        hz_url((5 * i + 2) % m),
        hz_url((7 * i + 3) % m),
    ]
    links.append(hz_mill_url(i))  # every page feeds the mill
    if i % HAZ_TRAP_MOD == 0:
        links.append(hz_url(i) + "/x/x/x")
    if i % HAZ_DENY_MOD == 0:
        links.append(f"https://{hz_host(i)}/private/s{base26(i)}")
    if i % HAZ_ALLOWOK_MOD == 0:
        links.append(f"https://{hz_host(i)}/private/ok{base26(i)}")
    if i % HAZ_SID_MOD == 0:
        links.append(hz_url((7 * i + 4) % m) + "?sid=zz")
    return links


def py_hazard_graph(m: int) -> dict[str, dict]:
    """url → node dict for the twin (and the Spark generator below)."""
    out: dict[str, dict] = {}
    for i in range(m):
        st = hz_status(i)
        out[hz_url(i)] = {
            "id": i,
            "host": hz_host(i),
            "status": st,
            "markdown": f"# doc {i}\n\nhazard corpus body {i}" if st == 200 else None,
            "links": hz_links(i, m) if st == 200 else [],
            "redirect": hz_redirect_url(i, m),
        }
    return out


def hazard_robots_body() -> str:
    lines = ["User-agent: *"]
    lines += [f"Disallow: {r}" for r in HAZ_ROBOTS_DISALLOW]
    lines += [f"Allow: {r}" for r in HAZ_ROBOTS_ALLOW]
    return "\n".join(lines) + "\n"


def gen_hazard_pages(spark: SparkSession, m: int) -> DataFrame:
    """The hazard corpus as the engine's pages table. Driver-built rows
    (the corpus is twin-replayed, so it is deliberately small — ≤ a few
    thousand pages); parallelized so the fetch join still distributes."""
    g = py_hazard_graph(m)
    rows = [
        (
            u,
            n["host"],
            u.split(n["host"], 1)[1],
            n["markdown"],
            n["links"],
            [],
            n["status"],
            n["status"] == 200,
        )
        for u, n in g.items()
    ]
    return spark.createDataFrame(
        rows,
        "url string, host string, path string, markdown string, "
        "out_links array<string>, image_ids array<string>, "
        "status int, success boolean",
    ).repartition(8)


def gen_hazard_robots(spark: SparkSession) -> DataFrame:
    """Wildcard-compiled robots table for the hazard hosts — the
    (host, disallow_pats, allow_pats, crawl_delay) shape CrawlEngine
    auto-selects the RFC §2.2.3 wildcard gate for."""
    from .robots import compile_rule_patterns, parse_robots_rules

    bodies = spark.createDataFrame(
        [(h, hazard_robots_body()) for h in HAZARD_HOSTS],
        "host string, body string",
    )
    return compile_rule_patterns(parse_robots_rules(bodies))


def gen_hazard_redirects(spark: SparkSession, m: int) -> DataFrame:
    rows = [
        (hz_url(i), hz_redirect_url(i, m))
        for i in range(m)
        if hz_redirect_url(i, m) is not None
    ]
    return spark.createDataFrame(rows, "from_url string, to_url string")


def gen_hazard_seeds(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(hz_url(i), 0, 0, i) for i in range(HAZ_SEED_COUNT)],
        "url string, priority int, depth int, seq long",
    )
