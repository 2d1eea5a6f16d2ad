"""Guardrail (SURVEY §7): no per-row Python UDFs anywhere on the hot path.

The north rule forbids per-row Python; only Arrow-vectorized pandas UDFs
(``mapInPandas`` / ``applyInPandas`` / ``@pandas_udf``) and native column
expressions are allowed.  This test greps the package source.
"""

from __future__ import annotations

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parents[1] / "pdf_extraction_tests_spark"

ROW_UDF_RE = re.compile(r"(?<!pandas_)\budf\s*\(|@F\.udf\b|F\.udf\s*\(")


def test_no_row_at_a_time_udfs():
    offenders = []
    for path in PKG.rglob("*.py"):
        for i, line in enumerate(path.read_text().splitlines(), 1):
            code = line.split("#")[0]
            if ROW_UDF_RE.search(code):
                offenders.append(f"{path.name}:{i}: {line.strip()}")
    assert not offenders, "row-at-a-time UDFs found:\n" + "\n".join(offenders)


def test_no_driver_side_collect_loops():
    """`.collect()` in package transforms would de-distribute an operator;
    sanctioned uses are checkpoint bookkeeping in pipeline.py and lines
    explicitly marked ``bounded-sample ok`` (driver-side training samples
    behind a limit())."""
    allowed = {"pipeline.py"}
    offenders = []
    for path in PKG.rglob("*.py"):
        if path.name in allowed:
            continue
        for i, line in enumerate(path.read_text().splitlines(), 1):
            code = line.split("#")[0]
            if ".collect()" in code and "bounded-sample ok" not in line:
                offenders.append(f"{path.name}:{i}: {line.strip()}")
    assert not offenders, "driver-side collect in operators:\n" + "\n".join(offenders)
