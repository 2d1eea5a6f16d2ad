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


def test_udf_queries_run_in_fresh_session_without_extraction():
    """Round-7 regression: with_language_guess's Arrow kernel is pickled by
    reference to the package, so a session that never ran an extraction
    (which would have shipped the package via addPyFile) must STILL be able
    to run the LID queries — the operator now ships the package itself.
    Runs in a subprocess so the session is genuinely fresh."""
    import subprocess
    import sys

    code = """
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]").appName("fresh")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.session.timeZone", "UTC").getOrCreate())
d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
from pdf_extraction_tests_spark.operators.text_analysis import with_language_guess
n = with_language_guess(d).select("doc_id", "lang_guess").count()
print("ROWS", n)
spark.stop()
"""
    res = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, cwd="/tmp", timeout=300)
    assert "ROWS 500" in res.stdout, res.stderr[-2000:]
