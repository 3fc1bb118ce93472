"""Driver-contract check (SURVEY.md §5 item 5) as pytest: a fast subset of
queries() vs oracle_sql() on DuckDB at sf0.001. The full gate is
scripts/check_queries.py at sf0.01."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()

FAST_SUBSET = [
    "pricing_summary",
    "top_revenue_nations",
    "size_bucket_interval_join",
    "event_sessions",
    "prev_event_transitions",
    "forward_fill_signup",
    "adjacent_line_pairs",
    "median_stats_by_lang",
    "orders_without_returns",
    "rollup_order_counts",
    "interval_union_islands",
    "token_counts_by_lang",
    "quality_scores_by_source",
    "doc_fingerprints",
    "dedupe_prefix_fingerprint",
    "ngram_jaccard_pairs",
    "cosine_topk",
    "ann_lsh_topk",
    "media_metadata",
    "boilerplate_removal",
    "pii_redaction_stats",
    "curation_pipeline",
]


@pytest.fixture(scope="module")
def entry_mod():
    import importlib.util as iu
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "__spark_entry__.py")
    spec = iu.spec_from_file_location("spark_entry", path)
    m = iu.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"parquet_scan('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if isinstance(v, float):
            return "nan" if math.isnan(v) else round(v, 9)
        return v

    body = sorted(
        (tuple(cell(r[i]) for i in idx) for r in rows),
        key=lambda t: tuple(str(x) for x in t),
    )
    return sorted(cols), body


@pytest.mark.parametrize("name", FAST_SUBSET)
def test_query_matches_duckdb(spark, entry_mod, duck, name):
    sdf = entry_mod.queries()[name](spark, SF_DIR)
    scols, srows = _norm([c.lower() for c in sdf.columns],
                         [tuple(r) for r in sdf.collect()])
    res = duck.execute(entry_mod.oracle_sql()[name])
    dcols, drows = _norm([d[0].lower() for d in res.description],
                         res.fetchall())
    assert scols == dcols
    assert len(srows) == len(drows)
    assert srows == drows


def test_gate_window_covers_flagship_and_all_oracled(entry_mod):
    """The driver records only the first DRIVER_GATE_WINDOW queries():
    the 4 flagship extraction queries and EVERY oracle-backed query
    (minus the demoted redundancies and this round's rotated-out trio)
    must sit inside that window, plus this round's promoted rows-only
    trio; everything else after it."""
    names = list(entry_mod.queries())
    oracled = set(entry_mod.oracle_sql())
    ri = entry_mod._rotation_index()
    window = set(names[: entry_mod.DRIVER_GATE_WINDOW])
    for q in (
        "extract_spans",
        "extract_nested",
        "extract_nested_colspans",
        "extract_spans_anchor",
    ):
        assert q in window, q
    out_this_round = set(entry_mod.DEMOTED) | set(entry_mod.D_ROTATION[ri])
    missing = (oracled - out_this_round) - window
    assert not missing, f"D-oracled queries outside the gate: {missing}"
    # this round's promoted rows-only trio is driver-visible
    for q in entry_mod.ROWS_ONLY_ROTATION[ri]:
        assert q in window, f"promoted rows-only query dark: {q}"
    # every rotated/demoted-out name is D-oracled ⇒ local gate still
    # value-checks it the round it is dark
    assert out_this_round <= oracled
    # rotation tables are well-formed: disjoint groups covering every
    # rows-only registry op, paired sizes (the window stays exactly
    # DRIVER_GATE_WINDOW), no overlap with the permanent demotions
    ro_all = [q for t in entry_mod.ROWS_ONLY_ROTATION for q in t]
    d_all = [q for t in entry_mod.D_ROTATION for q in t]
    assert len(ro_all) == len(set(ro_all))
    assert len(d_all) == len(set(d_all))
    for ro_t, d_t in zip(entry_mod.ROWS_ONLY_ROTATION,
                         entry_mod.D_ROTATION):
        assert len(ro_t) == len(d_t)
    assert not set(d_all) & set(entry_mod.DEMOTED)
    assert set(ro_all) == set(names) - oracled - {
        "extract_spans", "extract_nested", "extract_nested_colspans",
        "extract_spans_anchor",
    }
    assert len(names[: entry_mod.DRIVER_GATE_WINDOW]) == 50


def test_rotation_index_env_override(entry_mod, monkeypatch):
    """KRT_ROTATION_INDEX overrides the artifact-derived index; empty
    behaves as unset; garbage fails loudly naming the variable."""
    monkeypatch.delenv("KRT_ROTATION_INDEX", raising=False)
    base = entry_mod._rotation_index()
    monkeypatch.setenv("KRT_ROTATION_INDEX", "1")
    assert entry_mod._rotation_index() == 1
    monkeypatch.setenv("KRT_ROTATION_INDEX", " ")
    assert entry_mod._rotation_index() == base
    monkeypatch.setenv("KRT_ROTATION_INDEX", "x")
    with pytest.raises(ValueError, match="KRT_ROTATION_INDEX"):
        entry_mod._rotation_index()


def test_rotation_round_file_is_deterministic_and_consistent(entry_mod,
                                                             monkeypatch):
    """The checked-in ROUND file is the index's source of truth (under
    the env override): a fresh clone — which has ROUND but may lack
    local round artifacts — must resolve the same index as this working
    tree, and while the CORRECTNESS_r*.json history is present the two
    derivations must agree ((ROUND-1) == max N). Garbage content fails
    loudly naming the file."""
    import glob
    import re

    monkeypatch.delenv("KRT_ROTATION_INDEX", raising=False)
    here = os.path.dirname(os.path.abspath(entry_mod.__file__))
    round_file = os.path.join(here, "ROUND")
    assert os.path.exists(round_file), "ROUND must be checked in"
    rnd = int(open(round_file).read().strip())
    assert entry_mod._rotation_index() == (rnd - 1) % len(
        entry_mod.ROWS_ONLY_ROTATION
    )
    ns = [
        int(m.group(1))
        for f in glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", f))
    ]
    if ns:  # both sources present: they must name the same round —
        # max(ns) == rnd - 1 before the driver deposits the current
        # round's artifact, == rnd once it has (the artifact legally
        # lands mid-round, and the suite must stay green in that state).
        assert rnd - 1 <= max(ns) <= rnd, (
            f"ROUND={rnd} disagrees with max(CORRECTNESS_r*)={max(ns)} — "
            "bump ROUND with the round snapshot"
        )


def test_repetition_stats_exact_across_partitionings(spark, duck):
    """The round-3 red row: avg over raw doubles was summation-order
    unstable. The quantized-integer aggregate must match DuckDB EXACTLY
    (no rounding slack) at different partition counts."""
    from key_resource_table_extractor_spark.operators import text

    oracle = duck.execute(text.SQL_REPETITION_STATS).fetchall()
    assert oracle, "fixture must produce rows"
    for parts in ("2", "16"):
        with _shuffle_partitions(spark, parts):
            got = [
                tuple(r)
                for r in text.q_repetition_stats(spark, SF_DIR).collect()
            ]
        assert got == [tuple(r) for r in oracle]


class _shuffle_partitions:
    def __init__(self, spark, n):
        self.spark, self.n = spark, n

    def __enter__(self):
        self.old = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", self.n)

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.old)


def test_entry_runs(spark, entry_mod):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "seq", "kind", "text", "media_ref", "offset",
    ]
