"""Lineage cutting that also resets Catalyst statistics.

Spark 4's `Dataset.localCheckpoint` truncates the *plan* but keeps the
original plan's statistics on the resulting LogicalRDD (originStats).
Statistics compose MULTIPLICATIVELY through joins (sizeInBytes of a
join is the product of its children's), so in a pipeline of chained
passes — connected-components rounds x refinement passes x label-
propagation rounds, each self-joining its checkpointed input — the
propagated sizeInBytes compounds as ~2^k for k compounding layers.
Past k≈20 the driver spends MINUTES of CPU in BigInteger
multiplication inside `JoinSelectionHelper.canBroadcastBySize`
(measured: a 3.2M-turn resolve hung >20 min in planning with
million-digit sizeInBytes values; Thread dump showed Karatsuba /
Toom-Cook recursion under SizeInBytesOnlyStatsPlanVisitor).

`eager_cut` materializes via localCheckpoint, then rebuilds the
Dataset from the SAME checkpointed InternalRow RDD through
`internalCreateDataFrame`, which produces a fresh LogicalRDD with NO
originStats — sizeInBytes falls back to the (finite) session default
and the compounding chain resets at every cut. No data moves; the
rebuild is a driver-side plan-node swap.

This also restores the documented planning contract used throughout
the repo ("checkpointed frames carry no stats, broadcast decisions are
made from measured counts" — pipeline.py, refine.py): broadcasts stay
explicit and size-gated, never driven by compounded stat estimates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def eager_cut(df: DataFrame) -> DataFrame:
    """localCheckpoint(eager) + drop propagated origin statistics."""
    ck = df.localCheckpoint(eager=True)
    spark = ck.sparkSession
    qe = ck._jdf.queryExecution()
    jdf = spark._jsparkSession.internalCreateDataFrame(
        qe.toRdd(), qe.analyzed().schema(), False
    )
    from pyspark.sql.classic.dataframe import DataFrame as _ClassicDF

    return _ClassicDF(jdf, spark)
