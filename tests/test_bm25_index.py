"""Index-backed BM25 (operators/bm25.py build_term_index /
bm25_topk_indexed): result parity with the scan path, partition-pruned
probe plan, snapshot layout."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

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


class TestIncrementalIndex:
    """append_to_term_index: any batch split == one whole-corpus build;
    replay idempotence; crash-between-commits repair."""

    def _docs(self, spark):
        return spark.read.parquet(f"{SF}/documents.parquet").select(
            "doc_id", "text")

    def test_batch_split_equals_one_build(self, spark, tmp_path):
        from pdf_extraction_tests_spark.operators.bm25 import (
            append_to_term_index)
        docs = self._docs(spark)
        whole = str(tmp_path / "whole")
        split = str(tmp_path / "split")
        build_term_index(docs, whole)
        build_term_index(docs.filter("doc_id < 200"), split)
        append_to_term_index(spark, docs.filter("doc_id >= 200"), split)
        terms = ["join", "window", "spark"]
        a = sorted(map(tuple, bm25_topk_indexed(spark, whole, terms).collect()))
        b = sorted(map(tuple, bm25_topk_indexed(spark, split, terms).collect()))
        assert a == b and a

    def test_replayed_tag_is_noop(self, spark, tmp_path):
        from pdf_extraction_tests_spark.operators.bm25 import (
            append_to_term_index)
        from pdf_extraction_tests_spark.snapshots import read_snapshot
        docs = self._docs(spark)
        idx = str(tmp_path / "idx")
        build_term_index(docs.filter("doc_id < 200"), idx)
        delta = docs.filter("doc_id >= 200")
        append_to_term_index(spark, delta, idx, tag="epoch-7")
        n1 = read_snapshot(spark, f"{idx}/postings").count()
        s1 = read_snapshot(spark, f"{idx}/stats").collect()
        append_to_term_index(spark, delta, idx, tag="epoch-7")  # replay
        assert read_snapshot(spark, f"{idx}/postings").count() == n1
        assert read_snapshot(spark, f"{idx}/stats").collect() == s1

    def test_replay_repairs_missing_stats_commit(self, spark, tmp_path):
        """Crash between the postings append and the stats merge: the
        replayed epoch must complete the stats merge, not early-return on
        the postings tag."""
        from pdf_extraction_tests_spark.operators import bm25 as M
        from pdf_extraction_tests_spark.snapshots import (
            commit_snapshot, read_snapshot)
        docs = self._docs(spark)
        idx = str(tmp_path / "idx")
        build_term_index(docs.filter("doc_id < 200"), idx)
        stale = read_snapshot(spark, f"{idx}/stats").collect()
        # simulate the crashed first half: postings committed with the tag,
        # stats never merged
        delta = docs.filter("doc_id >= 200")
        words = delta.selectExpr(
            "doc_id", r"split(lower(text), '\\s+') AS w",
            r"size(split(lower(text), '\\s+')) AS dl")
        postings = words.selectExpr(
            "doc_id", "dl", "explode(w) AS term").groupBy(
            "term", "doc_id").agg(
            F.count("*").cast("bigint").alias("tf"),
            F.max("dl").cast("bigint").alias("dl"))
        commit_snapshot(postings, f"{idx}/postings", mode="append",
                        tag="epoch-9")
        # replayed epoch: postings tag exists, stats must still merge
        M.append_to_term_index(spark, delta, idx, tag="epoch-9")
        merged = read_snapshot(spark, f"{idx}/stats").collect()
        assert merged != stale
        assert merged[0].n_docs == 500


def test_indexed_empty_terms_and_missing_index_raise(spark, tmp_path):
    """Round-7 fix: clear errors instead of IndexError/AttributeError."""
    import pytest as _pytest

    from pdf_extraction_tests_spark.operators.bm25 import bm25_topk_indexed

    with _pytest.raises(ValueError, match="terms list is empty"):
        bm25_topk_indexed(spark, str(tmp_path / "no_index"), [])
    with _pytest.raises(ValueError, match="no stats snapshot"):
        bm25_topk_indexed(spark, str(tmp_path / "no_index"), ["word"])
