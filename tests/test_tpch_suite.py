"""Round-4 TPC-H shapes (Q7/Q13/Q15/Q16/Q17/Q22) ≡ DuckDB oracle at sf0.001.

The driver's correctness window caps at 50 queries; these six sit past it,
so this pytest is their standing oracle pin (same row-count / schema /
order-insensitive value compare as ``tools/check_queries.py``).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_queries import TABLES, compare, to_pandas  # noqa: E402

SF = "/root/testdata/sf0.001"

NEW_TPCH = [
    "q7_nation_volume",
    "q13_order_count_distribution",
    "q15_top_supplier",
    "q16_supplier_counts",
    "q17_small_quantity_revenue",
    "q22_dormant_customers",
]


@pytest.mark.parametrize("name", NEW_TPCH)
def test_tpch_query_matches_oracle(ray_session, name):
    import __ray_entry__ as entrymod

    ray_df = to_pandas(entrymod.queries()[name](SF))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    sql_df = con.sql(entrymod.oracle_sql()[name]).df()
    verdict = compare(name, ray_df, sql_df)
    assert verdict == "OK", verdict
