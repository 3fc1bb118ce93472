"""Two CONCURRENT driver processes shard one run over disjoint bucket
subsets against the same output/checkpoint paths — the orchestrator shape
docs/SCALE.md describes. Each checkpoint write lands in its own
subdirectory, so concurrent drivers never share a FileOutputCommitter
staging dir; the merged result must equal a clean single-driver run."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_DOCS = 300


def _launch(out, cp, subset):
    return subprocess.Popen(
        [
            sys.executable, "scripts/run_job.py",
            "--n-docs", str(N_DOCS), "--out", out, "--checkpoint", cp,
            "--run-id", "conc", "--buckets", "4", "--partitions", "2",
            "--master", "local[4]", "--bucket-subset", subset,
        ],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True,
    )


def _rows(path):
    con = duckdb.connect()
    return con.execute(
        f"""select doc_id, seq, kind, text, media_ref, "offset"
            from parquet_scan('{path}/bucket=*/*.parquet')
            where kind in ('text','media')
            order by doc_id, seq"""
    ).fetchall()


def test_concurrent_shard_drivers(tmp_path):
    out = str(tmp_path / "out")
    cp = str(tmp_path / "cp")
    p1 = _launch(out, cp, "0,1")
    p2 = _launch(out, cp, "2,3")
    o1, _ = p1.communicate(timeout=420)
    o2, _ = p2.communicate(timeout=420)
    assert p1.returncode == 0, o1
    assert p2.returncode == 0, o2
    s1 = json.loads(o1.strip().splitlines()[-1])
    s2 = json.loads(o2.strip().splitlines()[-1])
    assert s1["buckets_run"] == 2 and s2["buckets_run"] == 2

    # a third invocation sees all four buckets checkpointed
    p3 = _launch(out, cp, "0,1,2,3")
    o3, _ = p3.communicate(timeout=420)
    assert p3.returncode == 0, o3
    s3 = json.loads(o3.strip().splitlines()[-1])
    assert s3["buckets_run"] == 0 and s3["buckets_skipped"] == 4, s3

    # merged output equals a clean single-driver run
    gold_out = str(tmp_path / "gold")
    pg = _launch(gold_out, str(tmp_path / "gcp"), "0,1,2,3")
    og, _ = pg.communicate(timeout=420)
    assert pg.returncode == 0, og
    assert _rows(out) == _rows(gold_out)
