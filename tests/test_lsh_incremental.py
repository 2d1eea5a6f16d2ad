"""Incremental LSH dedup against a persisted signature index
(operators/dedup.py::lsh_index_append — round-4 verdict item 5).

Contract: feeding a corpus in ANY batch split and unioning each call's
candidate pairs equals lsh_candidate_pairs over the whole corpus in one
batch.  The index is a snapshot table, so each call's candidate join is
pinned to the PRE-append manifest (its own append can never self-pair).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_extraction_tests_spark import snapshots as S
from pdf_extraction_tests_spark.operators import dedup as D

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").filter(
        F.col("doc_id") < 200)


def _pairs(df) -> set:
    return {(r.doc_a, r.doc_b) for r in df.collect()}


class TestLshIncremental:
    def test_batch_equals_incremental_union(self, spark, docs, tmp_path):
        idx = str(tmp_path / "lsh_index")
        batch = _pairs(D.lsh_candidate_pairs(D.minhash_signatures(docs)))

        a = docs.filter(F.col("doc_id") % 2 == 0)
        b = docs.filter(F.col("doc_id") % 2 == 1)
        inc = _pairs(D.lsh_index_append(spark, idx, a))
        inc |= _pairs(D.lsh_index_append(spark, idx, b))
        assert inc == batch
        assert len(batch) > 0  # the corpus actually has near-dups

    def test_three_way_split_order_independent(self, spark, docs, tmp_path):
        batch = _pairs(D.lsh_candidate_pairs(D.minhash_signatures(docs)))
        for order in ((0, 1, 2), (2, 0, 1)):
            idx = str(tmp_path / f"idx_{order[0]}{order[1]}{order[2]}")
            inc: set = set()
            for k in order:
                part = docs.filter(F.col("doc_id") % 3 == k)
                inc |= _pairs(D.lsh_index_append(spark, idx, part))
            assert inc == batch

    def test_index_grows_by_delta_only(self, spark, docs, tmp_path):
        idx = str(tmp_path / "lsh_index")
        a = docs.filter(F.col("doc_id") < 50)
        b = docs.filter((F.col("doc_id") >= 50) & (F.col("doc_id") < 80))
        D.lsh_index_append(spark, idx, a).count()
        n1 = S.read_snapshot(spark, idx).count()
        D.lsh_index_append(spark, idx, b).count()
        n2 = S.read_snapshot(spark, idx).count()
        n_a = D.minhash_signatures(a).count()
        n_b = D.minhash_signatures(b).count()
        assert n1 == 4 * n_a           # bands x docs (docs with signatures)
        assert n2 - n1 == 4 * n_b      # the append added ONLY the delta
        # two snapshots: one per ingest — time travel sees the first alone
        assert [m["version"] for m in S.list_snapshots(idx)] == [1, 2]

    def test_empty_delta_is_safe(self, spark, docs, tmp_path):
        idx = str(tmp_path / "lsh_index")
        none = docs.filter(F.lit(False))
        assert _pairs(D.lsh_index_append(spark, idx, none)) == set()

    def test_commit_race_retries_against_fresh_index(self, spark, docs,
                                                     tmp_path, monkeypatch):
        """A lost commit race must re-read the index: retrying only the
        write would miss cross pairs against the winner's delta."""
        idx = str(tmp_path / "lsh_index")
        a = docs.filter(F.col("doc_id") < 60)
        b = docs.filter((F.col("doc_id") >= 60) & (F.col("doc_id") < 120))
        D.lsh_index_append(spark, idx, a).count()

        real_commit = S.commit_snapshot
        state = {"raced": False}

        def racing_commit(df, table_dir, **kw):
            if not state["raced"]:
                state["raced"] = True
                raise S.ConcurrentCommitError("simulated race")
            return real_commit(df, table_dir, **kw)

        monkeypatch.setattr(S, "commit_snapshot", racing_commit)
        got = _pairs(D.lsh_index_append(spark, idx, b))
        monkeypatch.undo()
        assert state["raced"]
        want = _pairs(D.lsh_candidate_pairs(
            D.minhash_signatures(docs.filter(F.col("doc_id") < 120))))
        prior = _pairs(D.lsh_candidate_pairs(D.minhash_signatures(a)))
        assert prior | got == want


def test_candidate_pairs_duplicate_id_rows_no_self_pairs(spark):
    """Round-7 guard: a signatures frame with a duplicated doc_id must not
    emit (x, x) pairs from the bucket-pair generation (the old strict-<
    self-join never could)."""
    from pyspark.sql import functions as F

    from pdf_extraction_tests_spark.operators import dedup as D

    sig = spark.createDataFrame(
        [(1, 10, 11, 12, 13, 14, 15),
         (1, 10, 11, 12, 13, 14, 15),   # duplicated id row
         (2, 10, 11, 99, 98, 97, 96)],  # shares band 0 with doc 1
        "doc_id long, h0 long, h1 long, h2 long, h3 long, h4 long, h5 long")
    pairs = {(r.doc_a, r.doc_b)
             for r in D.lsh_candidate_pairs(sig, bands=3, rows_per_band=2).collect()}
    assert pairs == {(1, 2)}
