#!/usr/bin/env python
"""Dump .explain('formatted') for headline queries into plans/r08/.

Usage: python scripts/capture_plans.py <suffix> [query ...]
Writes plans/r08/<query>_<suffix>.txt for each query (default: all of
bench.py's HEADLINE list). Explain only — nothing is executed.
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    suffix = sys.argv[1]
    import bench
    import __spark_entry__ as entry
    from key_resource_table_extractor_spark.plans.audit import explain_str
    from key_resource_table_extractor_spark.session import build_session

    names = sys.argv[2:] or bench.HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(
        app_name="krt-plan-capture",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    outdir = os.path.join(ROOT, "plans", "r08")
    os.makedirs(outdir, exist_ok=True)
    qs = entry.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(explain_str(df, "formatted"))
        print("wrote", name)
    spark.stop()


if __name__ == "__main__":
    main()
