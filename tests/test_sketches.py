"""Sketch operators: HLL++ distinct counts and approximate quantiles must
land within tolerance of exact answers (the sketch-accuracy oracle — the
driver's rows-only check covers shape, this covers semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def test_hll_distinct_within_tolerance(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        assert abs(r["approx"] - r["exact"]) / r["exact"] < 0.05, dict(r.asDict())


def test_approx_quantiles_within_tolerance(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    row = li.agg(
        F.expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)")
        .alias("ap"),
        F.expr("percentile(l_extendedprice, array(0.5, 0.95))").alias("ex"),
    ).collect()[0]
    for a, e in zip(row["ap"], row["ex"]):
        assert abs(a - e) / e < 0.02, (a, e)
