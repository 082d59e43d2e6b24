"""Driver-contract shape tests (the full oracle comparison lives in
tools/check_correctness.py and the driver's own gate)."""

import duckdb

from tests.conftest import SF


def test_entry_returns_dataset(ray_session):
    import ray.data

    import __ray_entry__ as e

    out = e.entry()
    assert isinstance(out, ray.data.Dataset)
    df = out.to_pandas()
    assert len(df) > 0
    assert {"doc_id", "spans", "cell_id", "zone_id", "rnk", "d2"} <= set(df.columns)


def test_oracles_are_subset_and_parse(ray_session):
    import __ray_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs)
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    for name, sql in oracles.items():
        # every oracle must at least plan (EXPLAIN) on the views
        con.execute(f"EXPLAIN {sql}")


def test_sample_query_matches_oracle(ray_session):
    """One end-to-end value comparison inside pytest (fast query)."""
    import pandas as pd

    import __ray_entry__ as e

    got = e.queries()["zone_subsets"](SF)
    df = got.to_pandas().sort_values(["query_id", "zone_id"]).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW part AS SELECT * FROM read_parquet('{SF}/part.parquet')")
    exp = con.execute(e.oracle_sql()["zone_subsets"]).df().sort_values(
        ["query_id", "zone_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(df, exp)
