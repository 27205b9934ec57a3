"""Mirror of the driver's correctness gate: run every __spark_entry__ query
against its DuckDB oracle at sf0.001 and compare row-for-row.

The driver does the same at sf0.01 (CORRECTNESS_r{N}.json); catching
mismatches here first keeps the gate green.
"""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

import os

SF_DIR = os.environ.get("GDS_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    pdf = pdf.sort_values(list(pdf.columns), ignore_index=True)
    return pdf


def _compare(name, spark_pdf, oracle_pdf):
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs oracle {len(oracle_pdf)}")
    s, o = _normalize(spark_pdf), _normalize(oracle_pdf)
    assert list(s.columns) == list(o.columns), f"{name}: columns {list(s.columns)} vs {list(o.columns)}"
    for col in s.columns:
        a, b = s[col].to_numpy(), o[col].to_numpy()
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            bad = ~np.isclose(a.astype(float), b.astype(float),
                              rtol=0, atol=1e-9, equal_nan=True)
        else:
            bad = a != b
        n_bad = int(np.asarray(bad).sum())
        assert n_bad == 0, (
            f"{name}.{col}: {n_bad} mismatched values, e.g. "
            f"{list(zip(a[bad][:3], b[bad][:3]))}")


_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(spark, ddb, name):
    spark_pdf = _QUERIES[name](spark, SF_DIR).toPandas()
    oracle_pdf = ddb.sql(_ORACLES[name]).df()
    _compare(name, spark_pdf, oracle_pdf)


def test_all_oracle_keys_have_queries():
    assert set(_ORACLES) <= set(_QUERIES)


def test_rows_only_queries_run(spark):
    for name in sorted(set(_QUERIES) - set(_ORACLES)):
        df = _QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"node_id", "score"}
