"""Size-balanced repartition: heavy docs spread across distinct partitions
and output stays byte-identical to the hash-salted path."""

from __future__ import annotations

from pyspark.sql import functions as F

from key_resource_table_extractor_spark import job


def test_heavy_docs_spread_and_output_identical(spark):
    inp = job.synthesize_spans(spark, 400, partitions=4)
    p = 6

    balanced = job.size_balanced_repartition(inp, p, heavy_quantile=0.98)
    dist = (
        balanced.withColumn("pid", F.spark_partition_id())
        .withColumn("sz", F.size("spans"))
        .groupBy("pid")
        .agg(F.sum("sz").alias("load"), F.max("sz").alias("mx"))
        .collect()
    )
    assert len(dist) <= p

    # the heaviest docs must land on distinct partitions (round-robin)
    heavy_ids = [
        r["doc_id"]
        for r in inp.withColumn("sz", F.size("spans"))
        .orderBy(F.desc("sz"))
        .limit(3)
        .collect()
    ]
    placed = (
        balanced.withColumn("pid", F.spark_partition_id())
        .where(F.col("doc_id").isin(heavy_ids))
        .select("doc_id", "pid")
        .collect()
    )
    pids = {r["pid"] for r in placed}
    assert len(pids) == len(heavy_ids)

    # forced degenerate quantile: even when EVERY doc is "heavy", no single
    # partition receives the whole heavy set — the exact-placement window is
    # capped to ~exact_per_partition*p rows and the rest is hash-spread
    all_heavy = job.size_balanced_repartition(inp, p, heavy_quantile=0.0)
    loads = (
        all_heavy.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    per_pid = {r["pid"]: r["n"] for r in loads}
    assert len(per_pid) > 1, per_pid
    assert max(per_pid.values()) < 400, per_pid
    c = (
        job.data_spans(job.extract(all_heavy))
        .orderBy("doc_id", "seq")
        .toPandas()
        .reset_index(drop=True)
    )

    # byte-identical extraction output vs the plain salted path
    a = (
        job.data_spans(job.extract(balanced))
        .orderBy("doc_id", "seq")
        .toPandas()
        .reset_index(drop=True)
    )
    b = (
        job.data_spans(job.extract(job.salted_repartition(inp, 4, salt=7)))
        .orderBy("doc_id", "seq")
        .toPandas()
        .reset_index(drop=True)
    )
    assert a.equals(b)
    assert c.equals(b)
