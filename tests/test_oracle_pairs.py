"""Local replica of the driver's correctness gate: run every
queries()[name] on Spark and the matching oracle_sql()[name] on DuckDB
over the same parquet tables, compare row-count + schema + values
(order-insensitive).  Uses sf0.001 for speed; the driver runs sf0.01."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as E

pytestmark = pytest.mark.spark

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    cols = sorted(df.columns)
    df = df[cols]
    for c in cols:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(cols, na_position="last").reset_index(drop=True)


def compare(name, spark, con):
    got = _norm(E.queries()[name](spark, SF_DIR).toPandas())
    exp = _norm(con.execute(E.oracle_sql()[name]).df())
    assert list(got.columns) == list(exp.columns), f"{name}: columns {got.columns} vs {exp.columns}"
    assert len(got) == len(exp), f"{name}: rows {len(got)} vs {len(exp)}"
    for c in got.columns:
        g, e = got[c].to_numpy(), exp[c].to_numpy()
        if np.issubdtype(np.asarray(g).dtype, np.floating) or np.issubdtype(
            np.asarray(e).dtype, np.floating
        ):
            g = np.asarray(g, dtype=np.float64)
            e = np.asarray(e, dtype=np.float64)
            both_nan = np.isnan(g) & np.isnan(e)
            exact = g == e
            bad = ~(both_nan | exact)
            assert not bad.any(), (
                f"{name}.{c}: {bad.sum()} mismatches, first: "
                f"{got[bad][:3].to_dict()} vs {exp[bad][:3].to_dict()}"
            )
        else:
            assert (np.asarray(g) == np.asarray(e)).all(), f"{name}.{c} mismatch"


ORACLE_NAMES = sorted(E.oracle_sql().keys())


def test_registry_consistency():
    qs = E.queries()
    for name in E.oracle_sql():
        assert name in qs, f"oracle {name} has no queries() entry"


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_pair(name, spark, ddb):
    compare(name, spark, ddb)


def test_rows_only_queries_run(spark):
    qs = E.queries()
    for name in set(qs) - set(E.oracle_sql()):
        df = qs[name](spark, SF_DIR)
        assert df.count() > 0, name


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) == 8  # zones 0..7
    assert set(df.columns) == {"zone", "mean_smoothed", "mean_slope"}
