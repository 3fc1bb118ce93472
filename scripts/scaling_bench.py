#!/usr/bin/env python
"""Throughput-scaling evidence for the north rule: the same extraction job on
the same input at two parallelism levels (local[N] and local[4N] — the
sandbox proxy for N and 4N executors), reporting docs/sec at both and the
scaling efficiency (T_N / T_4N) / 4.

Writes BENCH/BASELINE.md and prints one JSON line.

Usage: python scripts/scaling_bench.py [--n-docs 30000] [--low 8] [--high 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_once(master_cores: int, input_path: str, n_docs: int) -> dict:
    from key_resource_table_extractor_spark import job
    from key_resource_table_extractor_spark.session import build_session

    spark = build_session(
        app_name=f"krt-scale-{master_cores}",
        master=f"local[{master_cores}]",
        shuffle_partitions=master_cores,
    )
    spark.sparkContext.setLogLevel("ERROR")
    try:
        inp = job.read_spans(spark, input_path)

        def timed():
            t0 = time.time()
            out = job.extract(
                job.salted_repartition(inp, master_cores * 3, salt=1)
            )
            out.write.format("noop").mode("overwrite").save()
            return time.time() - t0

        # first run warms python workers / code paths; report best of two
        # timed runs (steady-state throughput, like any executor fleet)
        warm = job.synthesize_spans(spark, 256, partitions=master_cores)
        job.extract(warm).write.format("noop").mode("overwrite").save()
        wall = min(timed(), timed())
        return {
            "cores": master_cores,
            "wall_sec": round(wall, 2),
            "docs_per_sec": round(n_docs / wall, 1),
        }
    finally:
        spark.stop()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=400000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--input", default="/tmp/krt_scale_input")
    args = ap.parse_args()

    from key_resource_table_extractor_spark import job
    from key_resource_table_extractor_spark.session import build_session

    # materialize the input once (64 splits so either level has enough)
    if not os.path.exists(os.path.join(args.input, "_SUCCESS")):
        spark = build_session(app_name="krt-scale-gen", master="local[32]")
        spark.sparkContext.setLogLevel("ERROR")
        job.synthesize_spans(spark, args.n_docs, partitions=128).write.mode(
            "overwrite"
        ).parquet(args.input)
        spark.stop()

    low = run_once(args.low, args.input, args.n_docs)
    high = run_once(args.high, args.input, args.n_docs)
    ratio = high["docs_per_sec"] / low["docs_per_sec"]
    eff = ratio / (args.high / args.low)
    result = {
        "n_docs": args.n_docs,
        "low": low,
        "high": high,
        "speedup": round(ratio, 3),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result))

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH/BASELINE — extraction throughput & scaling

Reference baseline: the reference processes **one document at a time**
(single consumer process; see BASELINE.md) and publishes no throughput
numbers — any parallel docs/sec beats it architecturally; the target that
matters is the north rule's scaling criterion.

## Scaling evidence (sandbox proxy for N → 4N executors)

Same job, same {args.n_docs}-doc input (synthetic corpus, seed 42,
128 input splits), two parallelism levels (best of 2 steady-state runs):

| parallelism | wall (s) | docs/sec |
|---|---|---|
| local[{args.low}]  | {low['wall_sec']} | {low['docs_per_sec']} |
| local[{args.high}] | {high['wall_sec']} | {high['docs_per_sec']} |

- speedup {args.low}→{args.high} cores: **{ratio:.2f}×**
- scaling efficiency (speedup / {args.high//args.low}): **{eff:.3f}**
  (target ≥ 0.8)

Method: input materialized once to parquet; extraction = salted
repartition (3 partitions/core) → mapInArrow vectorized cascade → noop
sink; Python workers warmed up off the clock; wall time covers scan +
shuffle + extract. Run: `python scripts/scaling_bench.py`.
""")


if __name__ == "__main__":
    main()
