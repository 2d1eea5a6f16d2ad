"""WARC ingestion source (sources/warc_min.py): framing round-trips,
gzip-member layout, HTTP routing, totality under mutation, and the
distributed explode into the extraction pipeline."""

from __future__ import annotations

import random

import pytest

from pdf_extraction_tests_spark.sources import warc_min as W

DOCS = [
    ("http://a.example/page", "text/html",
     b"<html><body><p>alpha beta gamma delta content here</p>"
     b"<nav>skip me</nav></body></html>"),
    ("http://b.example/plain", "text/plain",
     b"plain text body with several words"),
    ("http://c.example/logo", "image/png", b"\x89PNG fakebytes"),
    ("http://d.example/app", "application/octet-stream", b"\x00\x01"),
]


class TestFraming:
    def test_round_trip_plain(self):
        blob = W.build_warc(DOCS)
        recs = W.iter_warc_records(blob)
        # warcinfo + 4 responses
        assert [r["type"] for r in recs] == ["warcinfo"] + ["response"] * 4
        assert recs[1]["uri"] == "http://a.example/page"

    def test_round_trip_gzip_members(self):
        blob = W.build_warc(DOCS, gzipped=True)
        assert blob[:2] == b"\x1f\x8b"
        recs = W.iter_warc_records(blob)
        assert len(recs) == 5
        assert recs[2]["payload"].endswith(b"several words")

    def test_warc_1_1_version_accepted(self):
        recs = W.iter_warc_records(W.build_warc(DOCS[:1], version="WARC/1.1"))
        assert len(recs) == 2

    def test_docs_routing(self):
        docs = dict(W.warc_to_docs(W.build_warc(DOCS)))
        assert set(docs) == {u for u, _, _ in DOCS[:3]}   # octet-stream skipped
        assert docs["http://a.example/page"][0]["kind"] == "html"
        assert docs["http://b.example/plain"][0]["kind"] == "text"
        media = docs["http://c.example/logo"][0]
        assert media["kind"] == "media"
        assert media["media_ref"] == "http://c.example/logo"

    def test_conversion_record_taken_as_text(self):
        rec = (b"WARC/1.0\r\nWARC-Type: conversion\r\n"
               b"WARC-Target-URI: http://e/x\r\nContent-Type: text/plain\r\n"
               b"Content-Length: 9\r\n\r\nconverted\r\n\r\n")
        docs = dict(W.warc_to_docs(rec))
        assert docs["http://e/x"][0]["text"] == "converted"


class TestTotality:
    def test_malformed_blob_is_one_parse_failure_doc(self):
        for bad in (b"not a warc", b"WARC/1.0\r\nno-length\r\n\r\n",
                    b"WARC/1.0\r\nContent-Length: 10\r\n\r\nxx",
                    b"\x1f\x8btruncated-gzip"):
            docs = W.warc_to_docs(bad)
            assert len(docs) == 1
            assert docs[0][1][0]["text"] == "UNSUPPORTED_BINARY"

    def test_mutation_fuzz_total(self):
        base = W.build_warc(DOCS)
        gz = W.build_warc(DOCS, gzipped=True)
        rng = random.Random(7)
        for seed_blob in (base, gz):
            for _ in range(200):
                b = bytearray(seed_blob)
                for _m in range(rng.randint(1, 8)):
                    i = rng.randrange(len(b))
                    b[i] = rng.randrange(256)
                out = W.warc_to_docs(bytes(b))   # must never raise
                assert isinstance(out, list)

    def test_resource_ceiling(self):
        with pytest.raises(W.UnsupportedWarcError):
            W.iter_warc_records(b"\x00" * (W._MAX_BLOB + 1))

    def test_gzip_bomb_bounded(self):
        import gzip as _g
        bomb = _g.compress(b"\x00" * (W._MAX_BLOB + 100))
        docs = W.warc_to_docs(bomb)   # ceiling -> labeled failure doc
        assert docs[0][1][0]["text"] == "UNSUPPORTED_BINARY"


class TestSparkEndToEnd:
    def test_explode_and_extract(self, spark, tmp_path):
        from pdf_extraction_tests_spark.pipeline import extract_docs

        (tmp_path / "a.warc").write_bytes(W.build_warc(DOCS))
        (tmp_path / "b.warc.gz").write_bytes(
            W.build_warc([("http://z.example/p2", "text/html",
                           b"<p>zeta eta theta iota kappa words</p>")],
                         gzipped=True))
        docs = W.read_warc_docs(spark, str(tmp_path))
        rows = {r.doc_id: r.spans for r in docs.collect()}
        # 3 document-bearing records from a.warc + 1 from b.warc.gz
        assert len(rows) == 4
        assert "http://z.example/p2" in rows

        out = extract_docs(docs)
        got = {r.doc_id for r in out.collect()}
        assert got == set(rows)   # every archived doc extracted, none lost


class TestPerRecordIsolation:
    def test_one_bad_record_keeps_the_rest(self):
        good = W.build_warc(DOCS)
        bad_rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
                   b"WARC-Target-URI: http://bad.example/x\r\n"
                   b"Content-Length: 7\r\n\r\nnothttp\r\n\r\n")
        docs = dict(W.warc_to_docs(good + bad_rec, blob_id="f.warc"))
        # all three good documents survive; the bad RECORD becomes its own
        # labeled failure doc instead of sinking the blob
        assert {u for u, _, _ in DOCS[:3]} <= set(docs)
        assert docs["http://bad.example/x"][0]["text"] == "UNSUPPORTED_BINARY"

    def test_blob_failure_doc_is_keyed_by_blob_id(self):
        a = W.warc_to_docs(b"junk", blob_id="/data/a.warc")
        b = W.warc_to_docs(b"junk", blob_id="/data/b.warc")
        assert a[0][0] == "/data/a.warc#unparseable"
        assert b[0][0] == "/data/b.warc#unparseable"
        assert a[0][0] != b[0][0]
