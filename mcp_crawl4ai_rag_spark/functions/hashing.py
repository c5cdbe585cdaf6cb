"""Cross-engine-reproducible 64-bit hashing.

The dedup/similarity operators need hash values that an independent ANSI-SQL
oracle (DuckDB) can recompute bit-for-bit. Spark's ``xxhash64``/``hash`` are
JVM-specific, so these kernels derive a 60-bit integer from the first 15 hex
chars of md5 — md5 is standardized, and 15 hex digits fit a signed 64-bit int
in every engine. Verified identical across Spark / DuckDB / Python in
tests/test_dedup.py.

Used for MinHash permutations, SimHash token hashes, and LSH hyperplanes —
NOT for the crawl URL-seen set, which stays on the faster JVM-side
``xxhash64`` (functions/urls.py) because it never needs SQL reproduction.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5int64(c: Column) -> Column:
    """First 60 bits of md5(c) as a non-negative bigint (Spark side)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def sql_md5int64(expr: str) -> str:
    """DuckDB twin of :func:`md5int64` over SQL expression ``expr``."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def py_md5int64(s: str) -> int:
    """Python twin (for constants shared between Spark plans and SQL)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


# 56-bit variant: leaves headroom for Kirsch-Mitzenmacher combination
# (h1 + p*h2 with p<=15 stays under 2^60, no BIGINT overflow in any engine).


def md5int56(c: Column) -> Column:
    """First 56 bits of md5(c) as a non-negative bigint (Spark side)."""
    return F.conv(F.substring(F.md5(c), 1, 14), 16, 10).cast("long")


def sql_md5int56(expr: str) -> str:
    """DuckDB twin of :func:`md5int56`."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 14)) AS BIGINT)"


def py_md5int56(s: str) -> int:
    """Python twin (for constants shared between Spark plans and SQL)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:14], 16)
