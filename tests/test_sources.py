"""Binary-file source: directory of raw docs -> extraction, end to end."""

from __future__ import annotations

import pytest

from pdf_extraction_tests_spark.pipeline import extract_docs
from pdf_extraction_tests_spark.sources.binary_docs import (
    bytes_to_spans,
    read_binary_docs,
    write_spdf,
)


@pytest.fixture(scope="module")
def doc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("rawdocs")
    write_spdf(
        str(d / "a.spdf"),
        [
            "1,200,150,2000,90,title|A Binary Sourced Title Document",
            "1,200,420,2000,200,plain text|Abstract " + "body text " * 30,
            "1,200,700,2000,50,title|1. Introduction",
            "MEDIA:img://bin/0",
            "1,200,900,2000,180,plain text|First body paragraph from binary.",
        ],
    )
    (d / "b.html").write_text(
        "<h1>Html Sourced Heading</h1><p>A paragraph long enough to keep here.</p>"
        "<footer>junk footer</footer>"
    )
    (d / "c.pdf").write_bytes(b"%PDF-1.4 fake binary content")
    return str(d)


def test_binary_source_roundtrip(spark, doc_dir):
    docs = read_binary_docs(spark, doc_dir)
    out = {r.doc_id.split("/")[-1]: r
           for r in extract_docs(docs, num_parts=4).collect()}
    assert set(out) == {"a.spdf", "b.html", "c.pdf"}
    a = out["a.spdf"]
    assert a.title == "A Binary Sourced Title Document"
    assert [s.kind for s in a.spans] == ["title", "text", "title", "media", "text"]
    b = out["b.html"]
    assert b.title == "Html Sourced Heading"
    # unsupported binary (real PDF): parse-failure isolated, not a crash
    c = out["c.pdf"]
    assert c.parse_failures == 1
    assert c.spans == []


def test_glob_filter(spark, doc_dir):
    docs = read_binary_docs(spark, doc_dir, glob="*.spdf")
    assert docs.count() == 1


def test_bytes_dispatch():
    assert bytes_to_spans(None) == []
    assert bytes_to_spans(b"  <html><p>x</p></html>")[0]["kind"] == "html"
    assert bytes_to_spans(b"\x00\x01binary")[0]["text"] == "UNSUPPORTED_BINARY"
