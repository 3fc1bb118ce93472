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


def test_sketch_value_percentiles_query_within_tolerance(spark):
    """The driver-facing sketch_value_percentiles query (rows-only in the
    gate) lands within tolerance of exact per-group percentiles."""
    from key_resource_table_extractor_spark.operators.relational import (
        q_sketch_value_percentiles,
    )

    got = {
        r["event_type"]: r
        for r in q_sketch_value_percentiles(spark, SF_DIR).collect()
    }
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("e50"),
            F.expr("percentile(value, 0.95)").alias("e95"),
        )
        .collect()
    }
    assert set(got) == set(exact) and got
    for k in got:
        assert abs(got[k]["ap50"] - exact[k]["e50"]) / exact[k]["e50"] < 0.02
        assert abs(got[k]["ap95"] - exact[k]["e95"]) / exact[k]["e95"] < 0.02


def test_approx_quantiles_within_tolerance(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    row = li.agg(
        F.expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 1000)")
        .alias("ap"),
        F.expr("percentile(l_extendedprice, array(0.5, 0.95))").alias("ex"),
    ).collect()[0]
    for a, e in zip(row["ap"], row["ex"]):
        assert abs(a - e) / e < 0.02, (a, e)
