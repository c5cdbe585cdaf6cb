"""Single-process Python oracle of the reference's recursive crawl.

Implements exactly the semantics of ``crawl_recursive_internal_links``
(/root/reference/src/crawl4ai_mcp.py:955-1067) over the synthetic graph
contract of sources/corpus.py:

- level-synchronous BFS, depth levels 0..max_depth-1;
- URLs marked visited at SCHEDULE time (:1000-1004) — failed fetches and
  robots-denied URLs are consumed and never retried;
- links expanded only from successful (status 200, robots-allowed) pages;
- early exit when a level is empty (:1006-1008).

Used by test_crawl.py to check the Spark engine's url_seen membership and
per-depth fetch sets (SURVEY.md §5.2).
"""

from __future__ import annotations

from mcp_crawl4ai_rag_spark.sources.corpus import py_graph


def reference_crawl(
    n: int, seed_ids, max_depth: int, respect_robots: bool = True
) -> tuple[dict[str, int], list[tuple[str, int]]]:
    """Returns (visited url -> schedule depth, [(url, depth) fetched ok])."""
    graph = py_graph(n)
    url_to_id = {v["url"]: i for i, v in graph.items()}

    visited: dict[str, int] = {}
    current = {graph[s]["url"] for s in seed_ids}
    fetched: list[tuple[str, int]] = []

    for depth in range(max_depth):
        to_crawl = [u for u in current if u not in visited]
        for u in to_crawl:
            visited[u] = depth  # schedule-time marking
        if not to_crawl:
            break
        next_level = set()
        for u in to_crawl:
            i = url_to_id.get(u)
            if i is None:
                continue  # fetch failure (URL outside corpus)
            node = graph[i]
            if respect_robots and node["robots_denied"]:
                continue
            if node["status"] != 200:
                continue
            fetched.append((u, depth))
            for t in node["targets"]:
                tu = graph[t]["url"]
                if tu not in visited:
                    next_level.add(tu)
        current = next_level
    return visited, fetched
