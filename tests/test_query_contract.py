"""Driver-contract smoke: every queries() entry runs at sf0.001 and
returns a DataFrame with a stable, non-empty schema; every oracle key
points at a registered query.  (The driver runs the full DuckDB
comparison at sf0.01 — tools/check_oracles.py replicates it; this is
the fast always-on guard against a broken registration.)
"""
from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"


class TestDriverContract:
    def test_oracle_keys_subset_of_queries(self):
        from outrank_spark.plans.queries import ORACLES, QUERIES

        assert set(ORACLES) <= set(QUERIES)
        # every oracle is non-trivial SQL
        for sql in ORACLES.values():
            assert "SELECT" in sql.upper()

    @pytest.mark.slow
    def test_every_query_runs_at_sf0001(self, spark):
        from outrank_spark.plans.queries import QUERIES

        for name, fn in QUERIES.items():
            df = fn(spark, SF)
            rows = df.collect()
            assert df.schema.fieldNames(), name
            assert rows is not None, name

    def test_entry_contract(self, spark):
        import __spark_entry__ as e

        assert callable(e.entry)
        qs, oracles = e.queries(), e.oracle_sql()
        assert len(qs) >= 44
        assert set(oracles) <= set(qs)
