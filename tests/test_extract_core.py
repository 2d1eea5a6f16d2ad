"""Unit tests for the pure-pandas extraction kernel (no Spark needed)."""

from __future__ import annotations

import pandas as pd
import pytest

from pdf_extraction_tests_spark import extract_core as ec
from tests import fixtures as fx


def spans_tuples(result):
    return [(s["kind"], s["text"], s["media_ref"], s["order"]) for s in result["spans"]]


class TestParsing:
    def test_region_payload_roundtrip(self):
        p = ec.parse_region_payload("2,10,20,300,40,plain text|hello | world")
        assert p == (2, 10, 20, 300, 40, "plain text", "hello | world")

    def test_region_payload_malformed(self):
        assert ec.parse_region_payload("nope") is None
        assert ec.parse_region_payload("1,2|x") is None

    def test_spans_to_regions_counts_failures(self):
        df = ec.spans_to_regions(fx.BROKEN_DOC["spans"])
        assert df["parse_failure"].sum() == 1
        assert (df["parse_failure"] == 0).sum() == 2


class TestHtml:
    def test_strip_html_blocks(self):
        blocks = ec.strip_html_blocks(fx.HTML_DOC["spans"][0]["text"])
        assert blocks == [
            ("title", "Synthetic Page Heading"),
            ("plain text", "The main article content paragraph is long enough to keep."),
            ("plain text", "A second content paragraph that should also be kept intact."),
        ]

    def test_link_density_drops_linkfarm(self):
        html = "<p>read <a href='x'>this whole thing is one big link text</a></p>"
        assert ec.strip_html_blocks(html) == []

    def test_short_blocks_dropped(self):
        assert ec.strip_html_blocks("<p>tiny</p>") == []


class TestFilters:
    def test_filter_regions(self):
        df = ec.spans_to_regions(fx.GENERIC_DOC["spans"])
        kept = ec.filter_regions(df)
        # abandon on page 2 dropped; media kept
        assert not ((kept["element_type"] == "abandon") & (kept["page"] > 1)).any()
        assert (kept["element_type"] == "media").sum() == 1


class TestReadingOrder:
    def test_two_column_order(self):
        df = ec.spans_to_regions(fx.TWO_COL_DOC["spans"])
        ordered = ec.reading_order(ec.filter_regions(df))
        assert list(ordered["text"]) == fx.TWO_COL_EXPECTED_ORDER
        assert list(ordered["column"]) == [1, 1, 2, 2]

    def test_single_column_when_gap_small(self):
        rows = []
        for i in range(6):
            rows.append(
                {"kind": "region", "media_ref": None, "offset": i,
                 "text": f"1,{200 + i * 30},{100 * i},900,100,plain text|"
                         f"block number {i} with plenty of characters inside"}
            )
        ordered = ec.reading_order(ec.filter_regions(ec.spans_to_regions(rows)))
        assert (ordered["column"] == 1).all()

    def test_deterministic_tiebreak(self):
        # identical coordinates: offset breaks the tie
        rows = [
            {"kind": "region", "media_ref": None, "offset": 1,
             "text": "1,100,100,500,50,plain text|second by offset"},
            {"kind": "region", "media_ref": None, "offset": 0,
             "text": "1,100,100,500,50,plain text|first by offset"},
        ]
        ordered = ec.reading_order(ec.filter_regions(ec.spans_to_regions(rows)))
        assert list(ordered["text"]) == ["first by offset", "second by offset"]


class TestFormatDetection:
    def test_mdpi_detected(self):
        df = ec.spans_to_regions(fx.MDPI_DOC["spans"])
        assert ec.detect_document_format(ec.filter_regions(df)) == "mdpi"

    def test_generic_default(self):
        df = ec.spans_to_regions(fx.GENERIC_DOC["spans"])
        assert ec.detect_document_format(ec.filter_regions(df)) == "generic_academic"


class TestCleaning:
    def test_citation_strip(self):
        assert ec.clean_text("results [1] and [2, 3] shown") == "results and shown"

    def test_dehyphenation(self):
        assert ec.clean_text("exper- iment", "academic") == "experiment"

    def test_ph_nm(self):
        assert ec.clean_text("at p H 7 and 500  nm", "academic") == "at pH 7 and 500 nm"

    def test_dedupe_sentences(self):
        assert ec.dedupe_sentences("A b. C d. A b. E f") == "A b. C d. E f"


class TestEndToEnd:
    def test_generic_golden_spans(self):
        res = ec.extract_document(fx.GENERIC_DOC["doc_id"], fx.GENERIC_DOC["spans"])
        assert spans_tuples(res) == fx.GENERIC_GOLDEN["spans"]
        assert res["title"] == fx.GENERIC_GOLDEN["title"]
        assert res["authors"] == fx.GENERIC_GOLDEN["authors"]
        assert res["abstract"] == fx.GENERIC_GOLDEN["abstract"]
        assert res["document_format"] == "generic_academic"
        assert res["total_pages"] == 2
        assert res["parse_failures"] == 0

    def test_generic_main_text(self):
        res = ec.extract_document(fx.GENERIC_DOC["doc_id"], fx.GENERIC_DOC["spans"])
        assert res["main_text"] == fx.GENERIC_GOLDEN["main_text"]

    def test_mdpi_boilerplate_stripped(self):
        res = ec.extract_document(fx.MDPI_DOC["doc_id"], fx.MDPI_DOC["spans"])
        texts = [s["text"] for s in res["spans"] if s["kind"] != "media"]
        assert texts == fx.MDPI_EXPECTED_TEXTS
        assert res["document_format"] == "mdpi"

    def test_html_golden(self):
        res = ec.extract_document(fx.HTML_DOC["doc_id"], fx.HTML_DOC["spans"])
        assert spans_tuples(res) == fx.HTML_EXPECTED

    def test_broken_doc_isolated(self):
        res = ec.extract_document(fx.BROKEN_DOC["doc_id"], fx.BROKEN_DOC["spans"])
        assert res["parse_failures"] == 1
        assert res["title"] == "Valid Title Region Here"
        assert len(res["spans"]) == 2

    def test_empty_doc(self):
        res = ec.extract_document("empty", [])
        assert res["spans"] == []
        assert res["total_pages"] == 0

    def test_batch_frame(self):
        pdf = pd.DataFrame(
            [{"doc_id": d["doc_id"], "spans": d["spans"]} for d in fx.ALL_FIXTURES]
        )
        out = ec.extract_docs_frame(pdf)
        assert list(out["doc_id"]) == [d["doc_id"] for d in fx.ALL_FIXTURES]
        assert out["parse_failures"].sum() == 1


class TestDeterminism:
    def test_twice_identical(self):
        a = ec.extract_document(fx.GENERIC_DOC["doc_id"], fx.GENERIC_DOC["spans"])
        b = ec.extract_document(fx.GENERIC_DOC["doc_id"], fx.GENERIC_DOC["spans"])
        assert a == b
