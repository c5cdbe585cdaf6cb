"""Deterministic global ranking without a single-task window.

``row_number() OVER (ORDER BY ...)`` funnels every row through ONE task —
fine for a politeness-bounded batch, fatal for a 10^10-row frontier. This
module computes the identical total order distributed:

1. ``repartitionByRange`` on the sort key (range-partitioned: partition i
   holds keys strictly below partition i+1) + ``sortWithinPartitions``;
2. one pass for per-partition counts → driver cumsum → broadcast offsets
   (a few KB — one long per partition);
3. one ``mapInPandas`` pass adding ``offset[pid] + local_index``.

Determinism: the sort key must be a TOTAL order (include a unique
tie-breaker column). Range boundaries picked by Spark's sampler may vary
between runs, but any boundary placement yields the same global rank because
partitions are globally ordered and internally sorted — boundary variation
only moves WHERE a row sits, never its rank.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import SER_CKPT_LEVEL as _SER_LEVEL  # single engine-wide definition


def distributed_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = EXCLUSIVE prefix sum of ``value_col`` under the
    total order ``order_cols`` — ``sum(value) OVER (ORDER BY ... ROWS
    UNBOUNDED PRECEDING EXCLUDING CURRENT)`` without the single-task global
    window. Same two-phase shape as :func:`distributed_rank`: range
    partition + in-partition sort, per-partition SUMS to the driver (one
    long per partition), broadcast offsets, then a numpy cumsum per
    partition."""
    cols = [F.col(c).asc() for c in order_cols]
    if num_partitions:
        ranged = df.repartitionByRange(num_partitions, *cols)
    else:
        ranged = df.repartitionByRange(*cols)
    ranged = ranged.sortWithinPartitions(*cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    ranged = ranged.localCheckpoint(eager=True, storageLevel=_SER_LEVEL)  # sums + final pass share it

    sums = {
        r["__pid"]: r["s"]
        for r in ranged.groupBy("__pid")
        .agg(F.sum(value_col).alias("s"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(sums):
        offsets[pid] = acc
        acc += int(sums[pid] or 0)

    from pyspark.sql.types import LongType, StructField, StructType

    base_fields = [f for f in ranged.schema.fields if f.name != "__pid"]
    out_schema = StructType(base_fields + [StructField(out_col, LongType(), False)])
    schema_out = [f.name for f in base_fields] + [out_col]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if local is None:
                local = offsets.get(int(pdf["__pid"].iloc[0]), 0)
            pdf = pdf.drop(columns=["__pid"])
            vals = pdf[value_col].to_numpy()
            ends = vals.cumsum()
            pdf[out_col] = local + ends - vals  # exclusive prefix
            local += int(ends[-1])
            yield pdf[schema_out]

    return ranged.mapInPandas(gen, schema=out_schema)


def distributed_rank(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rank",
    offset: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = deterministic 0-based global rank of each row under
    ``ORDER BY order_cols`` (must be a total order), plus ``offset``.

    A rank is the exclusive prefix sum of ones, so this delegates to
    :func:`distributed_cumsum` (same two-phase machinery, no duplicate
    implementation)."""
    out = distributed_cumsum(
        df.withColumn("__ones", F.lit(1).cast("long")),
        order_cols,
        "__ones",
        out_col=out_col,
        num_partitions=num_partitions,
    ).drop("__ones")
    if offset:
        out = out.withColumn(out_col, F.col(out_col) + F.lit(offset))
    return out
