"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Scale-adaptive parallelism floor for compute-heavy operator inputs.

    A few-MB parquet table arrives in 1-2 scan partitions, which serializes
    every downstream map stage (shingling, per-pair vector math, Arrow UDF
    passes) onto 1-2 of the executor's cores.  At production scale inputs
    already carry at least ``defaultParallelism`` partitions and this is a
    no-op — the decision reads the ACTUAL partition count, not a constant
    tuned to either regime, so it never adds a shuffle to a well-partitioned
    100 TB input.  The round-robin repartition of a small input moves only
    MBs, and every consumer in this package is either per-row or an
    order-insensitive aggregate (min / count / set membership), so results
    are unchanged.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
