"""Mirror of the driver's correctness gate: run every queries() entry,
and for those with an oracle_sql() entry, compare against DuckDB on the
same parquet tables (row count + schema names + order-insensitive
values)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif np.issubdtype(pdf[c].dtype, np.floating):
            pdf[c] = pdf[c].astype(np.float64)
        elif np.issubdtype(pdf[c].dtype, np.integer):
            pdf[c] = pdf[c].astype(np.int64)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


ORACLE_KEYS = sorted(entrymod.oracle_sql().keys())


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(5).collect()
    assert df.count() > 0
    assert {"id", "Is", "q", "p_sim"} <= set(df.columns)
    assert rows


def test_every_oracle_key_has_query():
    q = entrymod.queries()
    missing = [k for k in ORACLE_KEYS if k not in q]
    assert not missing


@pytest.mark.parametrize("key", ORACLE_KEYS)
def test_query_matches_oracle(spark, sf_dir, duck, key):
    q = entrymod.queries()[key]
    sql = entrymod.oracle_sql()[key]
    got = _normalize(q(spark, sf_dir).toPandas())
    want = _normalize(duck.sql(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"{key}: columns {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{key}: rows {len(got)} vs {len(want)}"
    for c in got.columns:
        if np.issubdtype(got[c].dtype, np.floating):
            np.testing.assert_allclose(
                got[c].to_numpy(), want[c].to_numpy(),
                rtol=0, atol=2e-6, err_msg=f"{key}.{c}",
            )
        else:
            mism = (got[c].to_numpy() != want[c].to_numpy()).sum()
            assert mism == 0, f"{key}.{c}: {mism} mismatches"


NON_ORACLE = sorted(set(entrymod.queries()) - set(ORACLE_KEYS))


@pytest.mark.parametrize("key", NON_ORACLE)
def test_non_oracle_queries_run(spark, sf_dir, key):
    df = entrymod.queries()[key](spark, sf_dir)
    assert df.count() >= 0
