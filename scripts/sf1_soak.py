#!/usr/bin/env python
"""sf1 (10x) soak: the production extraction job plus the curation
pipeline at ten times the usual bench scale, with memory/failure
evidence pulled from the Spark status REST API.

What it proves (VERDICT r6 task 5): the Arrow batch guard
(``session.py`` ``maxRecordsPerBatch=2048``) and the salted skew
repartition hold up under real memory pressure — not just at the 400k-doc
scaling corpus — and the run completes with ZERO failed tasks on the
default production heap.

Workloads (both timed after one untimed warm pass of the scan path):

1. **Extraction**: ``run_extraction`` over a 4,000,000-doc synthetic
   corpus (10x the scaling corpus; same seed-42 generator, so ~the same
   mega-doc tail fraction), real bucketed parquet sink + checkpoint —
   the exact path a production backfill runs, not a noop sink.
2. **Curation**: ``curation_pipeline`` over the sf0.1 ``documents``
   table replicated 10x (50,000 docs). Replicas are head/tail-perturbed
   with their replica token so they do not form artificial near-dup
   clusters (the cluster op fingerprints the first/last 40 chars);
   the 10x corpus keeps the BASE corpus's true near-dup rate.

Metrics: wall + docs/s per workload; from the REST API (UI enabled just
for this run) the max per-stage ``peakExecutionMemory``, executor peak
JVM/Python memory (process-tree metrics enabled), and the total failed /
killed task counts across all stages — the soak FAILS if any task failed.

Writes ``BENCH/r07_sf1_soak.json``. Run EXCLUSIVELY (nothing else on the
box) like every other bench: ``python scripts/sf1_soak.py``.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("KRT_SOAK_DOCS", 4_000_000))
REPLICAS = int(os.environ.get("KRT_SOAK_REPLICAS", 10))
SOAK_INPUT = os.environ.get("KRT_SOAK_INPUT", "/tmp/krt_soak_input")
SOAK_OUT = "/tmp/krt_soak_out"
SOAK_CKPT = "/tmp/krt_soak_ckpt"
UI_PORT = 4055
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _rest(path: str):
    with urllib.request.urlopen(
        f"http://localhost:{UI_PORT}/api/v1/{path}", timeout=30
    ) as r:
        return json.load(r)


def collect_ui_metrics() -> dict:
    """Max peak execution memory + failure counts across all stages, and
    executor-level peak memory, from the live status REST API."""
    app_id = _rest("applications")[0]["id"]
    stages = _rest(f"applications/{app_id}/stages")
    peak_exec = max((s.get("peakExecutionMemory", 0) for s in stages), default=0)
    mem_spilled = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    disk_spilled = sum(s.get("diskBytesSpilled", 0) for s in stages)
    gc_ms = sum(s.get("jvmGcTime", 0) for s in stages)
    failed_tasks = sum(s.get("numFailedTasks", 0) for s in stages)
    killed_tasks = sum(s.get("numKilledTasks", 0) for s in stages)
    failed_stages = sum(1 for s in stages if s.get("status") == "FAILED")
    execs = _rest(f"applications/{app_id}/executors")
    peak_mem = {}
    for e in execs:
        for k, v in (e.get("peakMemoryMetrics") or {}).items():
            peak_mem[k] = max(peak_mem.get(k, 0), v)
    mb = 1024 * 1024
    return {
        "n_stages": len(stages),
        "peak_task_execution_memory_mb": round(peak_exec / mb, 1),
        "peak_jvm_heap_mb": round(peak_mem.get("JVMHeapMemory", 0) / mb, 1),
        "peak_python_rss_mb": round(
            peak_mem.get("ProcessTreePythonRSSMemory", 0) / mb, 1
        ),
        "memory_spilled_mb": round(mem_spilled / mb, 1),
        "disk_spilled_mb": round(disk_spilled / mb, 1),
        "jvm_gc_sec": round(gc_ms / 1000, 1),
        "failed_tasks": failed_tasks,
        "killed_tasks": killed_tasks,
        "failed_stages": failed_stages,
    }


def main():
    from pyspark.sql import functions as F

    from key_resource_table_extractor_spark import job
    from key_resource_table_extractor_spark.operators.curation import (
        MIXTURE_WEIGHTS,
        curation_pipeline,
    )
    from key_resource_table_extractor_spark.session import build_session

    spark = build_session(
        app_name="krt-sf1-soak",
        extra_conf={
            # the soak's whole point is observability: UI on so the REST
            # status API can report peak memory + failure counts, and
            # process-tree metrics so the PYTHON side of mapInArrow is
            # visible (that is where an Arrow batch blow-up would land)
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
            "spark.executor.processTreeMetrics.enabled": "true",
            "spark.ui.retainedStages": "5000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    heap = spark.conf.get("spark.driver.memory")

    # ---- corpus (reused across runs; generation is untimed) ----
    if not os.path.exists(os.path.join(SOAK_INPUT, "_SUCCESS")):
        print(f"generating {N_DOCS} docs -> {SOAK_INPUT}", file=sys.stderr)
        job.synthesize_spans(spark, N_DOCS, partitions=512).write.mode(
            "overwrite"
        ).parquet(SOAK_INPUT)

    for p in (SOAK_OUT, SOAK_CKPT):
        shutil.rmtree(p, ignore_errors=True)

    inp = job.read_spans(spark, SOAK_INPUT)
    inp.count()  # untimed warm pass: parquet reader JIT + scan path

    t0 = time.time()
    summary = job.run_extraction(
        spark,
        inp,
        SOAK_OUT,
        SOAK_CKPT,
        run_id="sf1soak",
        n_buckets=8,
    )
    extract_wall = time.time() - t0
    out_rows = job.read_output(spark, SOAK_OUT).count()

    # ---- curation at 10x documents ----
    docs = (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1))))
        .select(
            # numeric replica ids: downstream packing shards by
            # pmod(doc_id, shards), so doc_id must stay BIGINT
            (F.col("doc_id") * REPLICAS + F.col("r")).alias("doc_id"),
            "source",
            # replica 0 keeps the base text; others are wrapped head AND
            # tail so the 40-char head/tail fingerprints differ per replica
            # and the near-dup rate stays the base corpus's, just 10x bigger
            F.when(F.col("r") == 0, F.col("text"))
            .otherwise(
                F.concat_ws(" ", F.format_string("rep%d", "r"), "text",
                            F.format_string("rep%d", "r"))
            )
            .alias("text"),
        )
    )
    n_cur_docs = docs.count()  # warms the documents scan, untimed
    t0 = time.time()
    packed = curation_pipeline(docs, MIXTURE_WEIGHTS)
    cur_stats = packed.agg(
        F.count(F.lit(1)).alias("rows"), F.sum("tok").alias("tok")
    ).collect()[0]
    curation_wall = time.time() - t0

    ui = collect_ui_metrics()
    result = {
        "metric": "sf1_soak",
        "heap": heap,
        "extraction": {
            "n_docs": N_DOCS,
            "wall_sec": round(extract_wall, 1),
            "docs_per_sec": round(N_DOCS / extract_wall, 1),
            "output_rows": out_rows,
            "buckets_run": summary["buckets_run"],
        },
        "curation": {
            "n_docs": n_cur_docs,
            "wall_sec": round(curation_wall, 1),
            "docs_per_sec": round(n_cur_docs / curation_wall, 1),
            "packed_rows": int(cur_stats["rows"]),
            "packed_tokens": int(cur_stats["tok"]),
        },
        "ui": ui,
        # ADVICE r7: the zero-failure verdict is computed over the REST
        # API's RETAINED stages — if the run hit the retainedStages cap,
        # evicted stages silently drop out of the failure sum and the
        # verdict cannot be trusted
        "stage_cap_hit": ui["n_stages"] >= 5000,
        "ok": (
            ui["failed_tasks"] == 0
            and ui["failed_stages"] == 0
            and ui["n_stages"] < 5000
        ),
    }
    print(json.dumps(result))
    if N_DOCS >= 4_000_000:  # only a full-scale run updates the record
        os.makedirs("BENCH", exist_ok=True)
        with open("BENCH/r08_sf1_soak.json", "w") as f:
            json.dump(result, f, indent=1)
    spark.stop()
    if not result["ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
