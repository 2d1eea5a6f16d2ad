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
        recs = ec.spans_to_regions(fx.BROKEN_DOC["spans"])
        assert sum(r["parse_failure"] for r in recs) == 1
        assert sum(1 for r in recs if not r["parse_failure"]) == 2


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
        recs = ec.spans_to_regions(fx.GENERIC_DOC["spans"])
        kept = ec.filter_regions(recs)
        # abandon on page 2 dropped; media kept
        assert not any(r["element_type"] == "abandon" and r["page"] > 1 for r in kept)
        assert sum(1 for r in kept if r["element_type"] == "media") == 1


class TestReadingOrder:
    def test_two_column_order(self):
        recs = ec.spans_to_regions(fx.TWO_COL_DOC["spans"])
        ordered = ec.reading_order(ec.filter_regions(recs))
        assert [r["text"] for r in ordered] == fx.TWO_COL_EXPECTED_ORDER
        assert [r["column"] for r in ordered] == [1, 1, 2, 2]

    def test_single_column_when_gap_small(self):
        rows = []
        for i in range(6):
            rows.append(
                {"kind": "region", "media_ref": None, "offset": i,
                 "text": f"1,{200 + i * 30},{100 * i},900,100,plain text|"
                         f"block number {i} with plenty of characters inside"}
            )
        ordered = ec.reading_order(ec.filter_regions(ec.spans_to_regions(rows)))
        assert all(r["column"] == 1 for r in ordered)

    def test_deterministic_tiebreak(self):
        # identical coordinates: offset breaks the tie
        rows = [
            {"kind": "region", "media_ref": None, "offset": 1,
             "text": "1,100,100,500,50,plain text|second by offset"},
            {"kind": "region", "media_ref": None, "offset": 0,
             "text": "1,100,100,500,50,plain text|first by offset"},
        ]
        ordered = ec.reading_order(ec.filter_regions(ec.spans_to_regions(rows)))
        assert [r["text"] for r in ordered] == ["first by offset", "second by offset"]


class TestKmeansFallback:
    def test_clean_bimodal_accepted(self):
        xs = [450, 470, 500, 520, 550, 560, 1850, 1870, 1900, 1920, 1950, 1960]
        b = ec.kmeans_1d_boundary(xs, 2400)
        assert b is not None and 600 < b < 1800

    def test_bridged_case_where_gap_method_declines(self):
        # max rounded-unique gap is 100 px < 0.15 * 2400, so the primary
        # largest-gap method declines; 2-means still separates the mass
        xs = [450, 500, 550, 600] + list(range(700, 1800, 100)) + [1850, 1900, 1950]
        b = ec.kmeans_1d_boundary(xs, 2400)
        assert b is not None and 700 < b < 1800

    def test_uniform_rejected(self):
        xs = list(range(400, 2000, 100))
        # uniform spread: weak separation must be rejected (v10.R:551 rule)
        b = ec.kmeans_1d_boundary(xs, 2400)
        if b is not None:  # if accepted, both sides must be non-trivial
            left = sum(1 for x in xs if x < b)
            assert 0 < left < len(xs)

    def test_single_cluster_rejected(self):
        assert ec.kmeans_1d_boundary([500, 510, 520, 530, 540], 2400) is None


class TestFormatDetection:
    def test_mdpi_detected(self):
        recs = ec.spans_to_regions(fx.MDPI_DOC["spans"])
        assert ec.detect_document_format(ec.filter_regions(recs)) == "mdpi"

    def test_generic_default(self):
        recs = ec.spans_to_regions(fx.GENERIC_DOC["spans"])
        assert ec.detect_document_format(ec.filter_regions(recs)) == "generic_academic"


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


class TestBandedFormats:
    def test_nature_boxed_abstract(self):
        res = ec.extract_document(fx.NATURE_DOC["doc_id"], fx.NATURE_DOC["spans"])
        assert res["document_format"] == "nature"
        assert res["abstract"] == fx.NATURE_ABS
        assert res["title"] == "A Nature Banded Synthetic Article"

    def test_jac_structured_abstract(self):
        res = ec.extract_document(fx.JAC_DOC["doc_id"], fx.JAC_DOC["spans"])
        assert res["document_format"] == "jac"
        assert res["abstract"] == fx.JAC_EXPECTED_ABSTRACT

    def test_elsevier_right_column_abstract(self):
        res = ec.extract_document(fx.ELSEVIER_DOC["doc_id"], fx.ELSEVIER_DOC["spans"])
        assert res["document_format"] == "elsevier"
        assert res["abstract"] == fx.ELSEVIER_EXPECTED_ABSTRACT

    def test_band_assignment(self):
        recs = ec.reading_order(
            ec.filter_regions(ec.spans_to_regions(fx.ELSEVIER_DOC["spans"]))
        )
        ec.assign_bands(recs, "elsevier")
        bands = {r["text"][:16]: r["band"] for r in recs if r["page"] == 1}
        assert bands["Article history:"] == "article_info"
        assert bands["Abstract The els"] == "abstract"

    def test_mdpi_xzone_filter(self):
        body = [
            {"x": 100, "text": "left mini column badge", "row_id": 0},
            {"x": 600, "text": "m" * 150, "row_id": 1},
            {"x": 620, "text": "n" * 150, "row_id": 2},
        ]
        kept = ec.mdpi_xzone_filter(body)
        assert [r["row_id"] for r in kept] == [1, 2]

    def test_lookahead_end_scan(self):
        body = [
            {"text": "intro", "row_id": 0},
            {"text": "registered clinical trial NCT01", "row_id": 1},
            {"text": "some trailing text", "row_id": 2},
            {"text": "References", "row_id": 3},
        ]
        assert ec.lookahead_end_scan(body, 0, 10) == 2
        # no end-matter within 5 rows => unchanged
        body2 = body[:2] + [{"text": f"t{i}", "row_id": 2 + i} for i in range(6)]
        assert ec.lookahead_end_scan(body2, 0, 10) == 10

    def test_legacy_area_quantile(self):
        page = [
            {"element_type": "plain text", "w": 10, "h": 10, "text": "tiny"},
            {"element_type": "plain text", "w": 100, "h": 100, "text": "a"},
            {"element_type": "plain text", "w": 100, "h": 120, "text": "b"},
            {"element_type": "plain text", "w": 100, "h": 140, "text": "c"},
            {"element_type": "abandon", "w": 1, "h": 1, "text": "hdr"},
        ]
        kept = ec.detect_page_layout_legacy(page, 0.3)
        texts = [r["text"] for r in kept]
        assert "tiny" not in texts and "hdr" in texts


class TestDeterminism:
    def test_twice_identical(self):
        a = ec.extract_document(fx.GENERIC_DOC["doc_id"], fx.GENERIC_DOC["spans"])
        b = ec.extract_document(fx.GENERIC_DOC["doc_id"], fx.GENERIC_DOC["spans"])
        assert a == b
