"""Sources: span-table readers and fixture builders.

- ``spans``      — parquet/Iceberg-shaped (doc_id, spans) reader lives in
                   ``job.read_spans`` (kept there with the job for now)
- ``gold_json``  — reconstructs span documents from reference-style
                   gold-standard table JSON (FIXTURES.md §3), used by the
                   reference-parity tests
"""

from .gold_json import (  # noqa: F401
    gold_table_grid,
    gold_table_to_spans,
    load_gold_tables,
)
from .html_gold import gold_table_to_html, html_to_gold_tables  # noqa: F401
