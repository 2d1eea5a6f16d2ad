"""Distributed-vs-oracle differential tests for the Spark pipeline.

The invariant (BASELINE.json): exact span-sequence equality
(kind, text, media_ref, order) per doc_id between the Spark job and the
single-process pandas oracle, at any parallelism, with or without the
chunked skew path engaged.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pdf_extraction_tests_spark import extract_core as ec
from pdf_extraction_tests_spark import pipeline as pl
from pdf_extraction_tests_spark.corpus import corpus_pandas, make_document
from pdf_extraction_tests_spark.schema import DOCS
from tests import fixtures as fx


def _docs_df(spark, docs):
    pdf = pd.DataFrame([{"doc_id": d["doc_id"], "spans": d["spans"]} for d in docs])
    return spark.createDataFrame(pdf, schema=DOCS)


def _spans_key(rows):
    return {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in r["spans"]]
        for r in rows
    }


def _oracle(docs):
    pdf = pd.DataFrame([{"doc_id": d["doc_id"], "spans": d["spans"]} for d in docs])
    out = ec.extract_docs_frame(pdf)
    return {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in r["spans"]]
        for _, r in out.iterrows()
    }


@pytest.fixture(scope="module")
def synthetic_docs():
    src = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    return corpus_pandas(src.head(60))


class TestDirectPath:
    def test_fixtures_match_oracle(self, spark):
        df = pl.extract_docs(_docs_df(spark, fx.ALL_FIXTURES), num_parts=4)
        got = _spans_key([r.asDict(recursive=True) for r in df.collect()])
        assert got == _oracle(fx.ALL_FIXTURES)

    def test_corpus_matches_oracle(self, spark, synthetic_docs):
        docs = [
            {"doc_id": r.doc_id, "spans": r.spans}
            for r in synthetic_docs.itertuples(index=False)
        ]
        df = pl.extract_docs(_docs_df(spark, docs), num_parts=8)
        got = _spans_key([r.asDict(recursive=True) for r in df.collect()])
        assert got == _oracle(docs)

    def test_sections_match_oracle(self, spark, synthetic_docs):
        docs = [
            {"doc_id": r.doc_id, "spans": r.spans}
            for r in synthetic_docs.itertuples(index=False)
        ]
        df = pl.extract_docs(_docs_df(spark, docs), num_parts=8)
        got = {
            r["doc_id"]: (r["title"], r["abstract"], r["main_text"], r["document_format"],
                          r["boundary_start"], r["boundary_end"])
            for r in (row.asDict() for row in df.collect())
        }
        pdf = pd.DataFrame(docs)
        oracle = ec.extract_docs_frame(pdf)
        want = {
            r["doc_id"]: (r["title"], r["abstract"], r["main_text"], r["document_format"],
                          r["boundary_start"], r["boundary_end"])
            for _, r in oracle.iterrows()
        }
        assert got == want


class TestChunkedPath:
    def test_chunked_equals_direct(self, spark):
        """Force every doc through the oversize path; results identical."""
        docs = fx.ALL_FIXTURES
        direct = pl.extract_docs(_docs_df(spark, docs), num_parts=4,
                                 oversize_chars=10**12)
        chunked = pl.extract_docs(_docs_df(spark, docs), num_parts=4,
                                  oversize_chars=0, chunk_spans=2)
        a = _spans_key([r.asDict(recursive=True) for r in direct.collect()])
        b = _spans_key([r.asDict(recursive=True) for r in chunked.collect()])
        assert a == b
        assert a == _oracle(docs)

    def test_media_at_chunk_boundary(self, spark):
        """A media span opening a chunk must still anchor to the previous
        chunk's last block (reanchor_media runs post-assembly)."""
        doc = fx.GENERIC_DOC
        chunked = pl.extract_docs(_docs_df(spark, [doc]), num_parts=2,
                                  oversize_chars=0, chunk_spans=3)
        got = _spans_key([r.asDict(recursive=True) for r in chunked.collect()])
        assert got == _oracle([doc])


class TestCheckpointResume:
    def test_run_and_resume(self, spark, tmp_path, synthetic_docs):
        docs = [
            {"doc_id": r.doc_id, "spans": r.spans}
            for r in synthetic_docs.head(20).itertuples(index=False)
        ]
        df = _docs_df(spark, docs)
        out = str(tmp_path / "out")
        m1 = pl.run_pipeline(spark, df, out, run_id="r1", num_parts=4)
        assert m1["docs"] == 20
        assert m1["resumed_parts_skipped"] == 0
        # resume with the same run_id: everything already done -> no new work
        m2 = pl.run_pipeline(spark, df, out, run_id="r1", num_parts=4)
        assert m2["resumed_parts_skipped"] > 0
        assert m2["docs"] == 20  # totals unchanged — nothing double-counted

    def test_distinct_runs_not_cross_attributed(self, spark, tmp_path):
        """Two different run_ids appending into one output dir: the second
        run's checkpoint metrics must count only its own rows (regression:
        metrics recomputed from the whole dir double-counted)."""
        docs = fx.ALL_FIXTURES[:3]
        df = _docs_df(spark, docs)
        out = str(tmp_path / "shared")
        m1 = pl.run_pipeline(spark, df, out, run_id="runA", num_parts=4)
        m2 = pl.run_pipeline(spark, df, out, run_id="runB", num_parts=4)
        assert m1["docs"] == 3
        assert m2["docs"] == 3  # not 6

    def test_crash_between_data_and_checkpoint_invisible(self, spark, tmp_path):
        """Duplicate-append window (round-1 advice): a run that dies AFTER
        the data write but BEFORE the checkpoint append must not double-
        expose rows when resumed — the orphan attempt partition stays
        invisible to read_extracted and to metrics."""
        from pyspark.sql import functions as F

        from pdf_extraction_tests_spark.tables import write_table

        docs = fx.ALL_FIXTURES[:3]
        df = _docs_df(spark, docs)
        out = str(tmp_path / "crash")
        # simulate the dead run: data written under an attempt, no checkpoint
        orphan = (
            pl.extract_docs(pl.with_part_key(df, 4), 4)
            .withColumn("run_id", F.lit("rC"))
            .withColumn("attempt_id", F.lit("dead_attempt"))
        )
        write_table(orphan, f"{out}/extracted", mode="append",
                    partition_by=["run_id", "attempt_id"])
        # resume with the same run_id: no checkpoint rows -> everything
        # re-processes under a fresh attempt_id
        m = pl.run_pipeline(spark, df, out, run_id="rC", num_parts=4)
        assert m["docs"] == 3  # metrics count this attempt only, not 6
        committed = pl.read_extracted(spark, out)
        assert committed.count() == 3  # orphan rows invisible
        assert committed.select("doc_id").distinct().count() == 3

    def test_lineage_rows_written(self, spark, tmp_path):
        docs = fx.ALL_FIXTURES
        out = str(tmp_path / "out2")
        pl.run_pipeline(spark, _docs_df(spark, docs), out, run_id="rX", num_parts=4)
        ckpt = spark.read.parquet(f"{out}/checkpoint")
        rows = ckpt.collect()
        assert {r.status for r in rows} == {"done"}
        assert sum(r.docs for r in rows) == len(docs)
        assert sum(r.parse_failures for r in rows) == 1  # fix_broken


class TestHostileInputs:
    def test_null_and_empty_spans_not_dropped(self, spark):
        """A NULL spans array must route through the pipeline and emit an
        empty extraction — not silently vanish from both size-routing paths
        (regression: F.aggregate over NULL returned NULL total_chars)."""
        pdf = pd.DataFrame(
            [
                {"doc_id": "null_spans", "spans": None},
                {"doc_id": "empty", "spans": []},
                {"doc_id": "only_media",
                 "spans": [{"kind": "media", "text": "", "media_ref": "m://x",
                            "offset": 0}]},
            ]
        )
        from pdf_extraction_tests_spark.schema import DOCS

        df = spark.createDataFrame(pdf, schema=DOCS)
        rows = {r.doc_id: r for r in pl.extract_docs(df, num_parts=2).collect()}
        assert set(rows) == {"null_spans", "empty", "only_media"}
        assert len(rows["only_media"].spans) == 1


class TestOversizedDoc:
    def test_multi_mb_doc(self, spark):
        """A deliberately huge doc (SURVEY §7 risk) goes through chunking."""
        big_text = "word " * 2000
        spans = []
        for i in range(600):
            spans.append(
                {"kind": "region", "media_ref": None, "offset": i,
                 "text": f"1,200,{100 + i * 10},2000,50,plain text|{big_text}{i}"}
            )
        doc = {"doc_id": "huge", "spans": spans}
        df = pl.extract_docs(_docs_df(spark, [doc]), num_parts=2,
                             oversize_chars=100_000, chunk_spans=100)
        rows = [r.asDict(recursive=True) for r in df.collect()]
        assert len(rows) == 1
        assert _spans_key(rows) == _oracle([doc])

    def test_few_giant_spans_split_by_char_budget(self, spark):
        """A doc of FEW huge spans must still split into many parse chunks
        (char-budget chunking; span-count alone would make it one chunk)."""
        giant = "tok " * 50_000  # ~200k chars per span
        spans = [
            {"kind": "region", "media_ref": None, "offset": i,
             "text": f"1,200,{100 + i * 200},2000,150,plain text|{giant}{i}"}
            for i in range(6)
        ]
        doc = {"doc_id": "giant_spans", "spans": spans}
        df = pl.extract_docs(_docs_df(spark, [doc]), num_parts=2,
                             oversize_chars=100_000, chunk_chars=200_000)
        rows = [r.asDict(recursive=True) for r in df.collect()]
        assert len(rows) == 1
        assert _spans_key(rows) == _oracle([doc])


class TestLayoutTable:
    def test_layout_rows(self, spark):
        lay = pl.extract_layout(_docs_df(spark, [fx.GENERIC_DOC, fx.BROKEN_DOC]))
        rows = lay.collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        # GENERIC: every span (incl. abandon + media) has a layout row
        assert len(by_doc["fix_generic"]) == len(fx.GENERIC_DOC["spans"])
        assert any(r.element_type == "abandon" for r in by_doc["fix_generic"])
        assert any(r.element_type == "media" for r in by_doc["fix_generic"])
        # BROKEN: the malformed span appears as a parse_failure row
        assert sum(r.parse_failure for r in by_doc["fix_broken"]) == 1


class TestDualExtractorStage:
    def test_dual_equals_joined_pipelines(self, spark, synthetic_docs):
        """The single-pass dual stage must produce exactly the agreement
        rows the two-pipeline + join form would (same kernels, one parse)."""
        docs = [
            {"doc_id": r.doc_id, "spans": r.spans}
            for r in synthetic_docs.itertuples(index=False)
        ][:30]
        df = _docs_df(spark, docs)
        dual = {
            r.doc_id: (r.title_match, r.n_spans_smart, r.n_spans_simple,
                       r.main_len_ratio)
            for r in pl.extract_docs_dual(df, num_parts=4).collect()
        }
        smart = {r.doc_id: r for r in pl.extract_docs(df, num_parts=4).collect()}
        simple = {
            r.doc_id: r for r in pl.extract_docs_simple(df, num_parts=4).collect()
        }
        assert set(dual) == set(smart) == set(simple)
        for doc_id, got in dual.items():
            sm, si = smart[doc_id], simple[doc_id]
            want = (
                sm.title == si.title,
                len(sm.spans),
                len(si.spans),
                round(len(sm.main_text) / max(len(si.main_text), 1), 4),
            )
            assert got == want, doc_id


class TestDebugBoundaries:
    def test_boundaries_agree_with_extractor(self, spark, synthetic_docs):
        docs = [
            {"doc_id": r.doc_id, "spans": r.spans}
            for r in synthetic_docs.itertuples(index=False)
        ][:30]
        df = _docs_df(spark, docs)
        dbg = pl.debug_boundaries(df).collect()
        extracted = {r.doc_id: r for r in pl.extract_docs(df, num_parts=4).collect()}
        assert dbg, "debug relation came back empty"
        seen = set()
        for r in dbg:
            seen.add(r.doc_id)
            e = extracted[r.doc_id]
            # the debug rows carry the extractor's own boundaries
            assert (r.boundary_start, r.boundary_end) == \
                (e.boundary_start, e.boundary_end)
            # context window and flags are self-consistent
            assert (abs(r.row_id - r.boundary_start) <= 3
                    or abs(r.row_id - r.boundary_end) <= 3)
            assert r.in_slice == (r.boundary_start <= r.row_id < r.boundary_end)
            assert len(r.text_preview) <= 80
        assert len(seen) > 10  # most docs produce boundary context rows
