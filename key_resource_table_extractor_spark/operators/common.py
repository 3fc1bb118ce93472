"""Shared helpers for the operator modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load(
    spark: SparkSession, sf_dir: str, name: str, rebalance: bool = False
) -> DataFrame:
    """Parquet scan of one driver table; Catalyst prunes columns/predicates.

    ``rebalance=True`` applies the scale-adaptive input-skew fix (guide
    §2.5 "input skew" / §6): the driver tables arrive as a SINGLE file
    with one row group, so the scan is one unsplittable task and every
    map-side stage (shingling, hashing, quality gates, regex sweeps)
    would run on one core regardless of cluster size. When the scan's
    split count is below the default parallelism, shuffle the
    (column-pruned, filter-pushed — both survive the added exchange)
    rows once right after the read; on a real multi-file warehouse table
    the split count meets or exceeds the core count and this is a no-op.

    It is OPT-IN per operator because the round-robin spread changes the
    partial-aggregation grouping: an operator whose result folds raw
    DOUBLES across rows (avg/sum of floats rounded for the oracle, e.g.
    pricing_summary) is summation-order sensitive and must keep the
    file-order scan that its frozen DuckDB oracle effectively sums in.
    Only operators whose aggregates are order-insensitive (counts,
    int sums, md5/hash keys, exact percentiles, per-row/per-pair math,
    or float sums explicitly rounded-before-rank like bm25) opt in —
    verified by the full DuckDB gate replica at two partitionings
    (local[4] pytest + local[32] check_queries).
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if rebalance:
        n = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < n:
            df = df.repartition(n)
    return df
