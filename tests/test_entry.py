"""Smoke tests replicating the driver's checks on __spark_entry__.py."""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", Path(__file__).resolve().parents[1] / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["__spark_entry__"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_entry_runs(spark):
    mod = _load_entry()
    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) == 500  # sf0.001 documents
    assert {f.name for f in df.schema.fields} >= {
        "doc_id", "title", "abstract", "document_format", "n_spans"
    }


def test_every_oracle_key_has_query(spark):
    mod = _load_entry()
    q = mod.queries()
    o = mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 20
