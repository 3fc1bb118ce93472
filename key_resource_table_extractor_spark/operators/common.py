"""Shared helpers for the operator modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one driver table; Catalyst prunes columns/predicates."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
