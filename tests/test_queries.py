"""Local replica of the driver's correctness gate: run every registered
query on Spark AND its oracle SQL on DuckDB over the same parquet files
(sf0.001 for speed; the driver uses sf0.01) and compare value-by-value,
order-insensitively, with columns sorted by name — same rules as the driver.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from pdf_extraction_tests_spark.queries import REGISTRY, TABLES

SF_DIR = "/root/testdata/sf0.001"


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if isinstance(v, float):
                if math.isnan(v):
                    row.append("NaN")
                else:
                    row.append(round(v, 6))
            elif v is None or v is pd.NaT:
                row.append(None)
            else:
                row.append(str(v) if not isinstance(v, (int, bool)) else v)
        rows.append(tuple(row))
    return sorted(rows, key=repr)


@pytest.mark.parametrize("spec", [s for s in REGISTRY if s.sql], ids=lambda s: s.name)
def test_query_matches_oracle(spark, spec):
    got = _canon(spec.fn(spark, SF_DIR).toPandas())
    want = _canon(_duck(spec.sql))
    assert len(got) == len(want), f"{spec.name}: row count {len(got)} != {len(want)}"
    assert got == want, f"{spec.name}: value mismatch"


@pytest.mark.parametrize("spec", [s for s in REGISTRY if not s.sql], ids=lambda s: s.name)
def test_rows_only_queries_run(spark, spec):
    df = spec.fn(spark, SF_DIR)
    assert df.count() >= 0
