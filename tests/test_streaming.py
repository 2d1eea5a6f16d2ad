"""Streaming extraction: same results as batch, exactly-once on resume."""

from __future__ import annotations

import pandas as pd
import pytest

from pdf_extraction_tests_spark import extract_core as ec
from pdf_extraction_tests_spark.corpus import corpus_pandas
from pdf_extraction_tests_spark.schema import DOCS
from pdf_extraction_tests_spark.streaming.incremental import stream_extract


@pytest.fixture(scope="module")
def corpus_path(spark, tmp_path_factory):
    src = pd.read_parquet("/root/testdata/sf0.001/documents.parquet").head(40)
    pdf = corpus_pandas(src)
    path = str(tmp_path_factory.mktemp("stream") / "docs")
    # two files => at least two micro-batches with maxFilesPerTrigger=1
    spark.createDataFrame(pdf.iloc[:20], schema=DOCS).write.parquet(path)
    spark.createDataFrame(pdf.iloc[20:], schema=DOCS).write.mode("append").parquet(path)
    return path, pdf


def test_streaming_matches_batch_kernel(spark, corpus_path, tmp_path):
    path, pdf = corpus_path
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = stream_extract(spark, path, out, ckpt, num_parts=4, max_files_per_trigger=1)
    q.awaitTermination()
    got = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["order"])
                      for s in r["spans"]]
        for r in (row.asDict(recursive=True)
                  for row in spark.read.parquet(out).collect())
    }
    oracle_df = ec.extract_docs_frame(pdf)
    want = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["order"])
                      for s in r["spans"]]
        for _, r in oracle_df.iterrows()
    }
    assert got == want


def test_streaming_restart_is_exactly_once(spark, corpus_path, tmp_path):
    path, pdf = corpus_path
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    q1 = stream_extract(spark, path, out, ckpt, num_parts=4)
    q1.awaitTermination()
    n1 = spark.read.parquet(out).count()
    # restart with same checkpoint: no new input -> no duplicate output
    q2 = stream_extract(spark, path, out, ckpt, num_parts=4)
    q2.awaitTermination()
    n2 = spark.read.parquet(out).count()
    assert n1 == len(pdf)
    assert n2 == n1
