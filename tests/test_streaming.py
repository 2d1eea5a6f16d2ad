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


def test_streaming_dedup_matches_batch(spark, tmp_path):
    """stream_dedup emits exactly one row per distinct text (first arrival),
    with bounded watermark state — result set == batch exact dedup."""
    import datetime

    from pyspark.sql import functions as F, types as T

    from pdf_extraction_tests_spark.streaming.incremental import stream_dedup

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(30):
        rows.append({
            "doc_id": f"d{i}",
            "text": f"content {i % 10}",            # each text repeats 3x
            "ingest_ts": base + datetime.timedelta(minutes=i),
        })
    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("ingest_ts", T.TimestampType()),
    ])
    src = str(tmp_path / "feed")
    spark.createDataFrame(pd.DataFrame(rows), schema=schema).write.parquet(src)
    out = str(tmp_path / "deduped")
    q = stream_dedup(spark, src, out, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    texts = [r.text for r in got.collect()]
    assert sorted(texts) == sorted(f"content {i}" for i in range(10))
    # batch equivalence: same distinct digest set
    batch = (spark.read.parquet(src)
             .select(F.md5("text").alias("digest")).distinct().count())
    assert got.select("digest").distinct().count() == batch == 10


def test_snapshot_sink_matches_batch_and_travels(spark, corpus_path, tmp_path):
    """stream_extract_snapshot: exactly-once into an atomic snapshot table;
    each micro-batch is one epoch-tagged snapshot, history time-travels."""
    from pdf_extraction_tests_spark import snapshots as S
    from pdf_extraction_tests_spark.streaming.incremental import (
        stream_extract_snapshot)

    path, pdf = corpus_path
    table = str(tmp_path / "snap_tbl")
    ckpt = str(tmp_path / "snap_ckpt")
    q = stream_extract_snapshot(spark, path, table, ckpt, num_parts=4,
                                max_files_per_trigger=1)
    q.awaitTermination()
    got = {r.doc_id for r in S.read_snapshot(spark, table).collect()}
    assert got == set(pdf["doc_id"])
    snaps = S.list_snapshots(table)
    assert len(snaps) >= 2                      # one snapshot per micro-batch
    assert all(m["tag"].startswith("epoch-") for m in snaps)
    # time travel: the first epoch alone holds a strict subset
    first = {r.doc_id
             for r in S.read_snapshot(spark, table, snaps[0]["version"]).collect()}
    assert first < got


def test_snapshot_sink_replayed_epoch_is_noop(spark, corpus_path, tmp_path):
    """The exactly-once hole the plain append sink has: a replayed epoch
    (crash between sink write and checkpoint commit) must not duplicate
    rows — the epoch tag makes the second commit a no-op."""
    from pdf_extraction_tests_spark import snapshots as S
    from pdf_extraction_tests_spark.schema import DOCS
    from pdf_extraction_tests_spark.streaming.incremental import (
        snapshot_batch_committer)

    path, pdf = corpus_path
    table = str(tmp_path / "replay_tbl")
    commit = snapshot_batch_committer(table, num_parts=4)
    batch = spark.read.schema(DOCS).parquet(path)
    commit(batch, 0)
    n1 = S.read_snapshot(spark, table).count()
    commit(batch, 0)                            # replay after simulated crash
    assert S.read_snapshot(spark, table).count() == n1
    assert len(S.list_snapshots(table)) == 1
    commit(batch, 1)                            # a NEW epoch still appends
    assert S.read_snapshot(spark, table).count() == 2 * n1


def test_stream_lsh_dedup_matches_batch(spark, tmp_path):
    """stream_lsh_dedup: union of per-epoch pairs snapshots == batch LSH
    candidate pairs over everything ingested; index holds one banded key
    row per (band, doc)."""
    from pdf_extraction_tests_spark import snapshots as S
    from pdf_extraction_tests_spark.operators import dedup as D
    from pdf_extraction_tests_spark.streaming.incremental import (
        stream_lsh_dedup)

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .filter("doc_id < 120").select("doc_id", "text"))
    src = str(tmp_path / "feed")
    # several files -> several micro-batches at maxFilesPerTrigger=1
    docs.repartition(3).write.parquet(src)
    index_dir = str(tmp_path / "lsh_index")
    pairs_dir = str(tmp_path / "lsh_pairs")
    q = stream_lsh_dedup(spark, src, index_dir, pairs_dir,
                         str(tmp_path / "ckpt"), max_files_per_trigger=1)
    q.awaitTermination(180)

    got = {(r.doc_a, r.doc_b)
           for r in S.read_snapshot(spark, pairs_dir).collect()}
    want = {(r.doc_a, r.doc_b)
            for r in D.lsh_candidate_pairs(
                D.minhash_signatures(docs)).collect()}
    assert got == want and len(want) > 0
    n_sigs = D.minhash_signatures(docs).count()
    assert S.read_snapshot(spark, index_dir).count() == 4 * n_sigs


def test_lsh_dedup_replayed_epoch_is_noop(spark, tmp_path):
    """Crash-replay at any point: neither the index nor the pairs table
    duplicates an epoch's rows."""
    from pdf_extraction_tests_spark import snapshots as S
    from pdf_extraction_tests_spark.streaming.incremental import (
        lsh_dedup_batch_committer)

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .filter("doc_id < 60").select("doc_id", "text"))
    index_dir = str(tmp_path / "idx")
    pairs_dir = str(tmp_path / "pairs")
    commit = lsh_dedup_batch_committer(spark, index_dir, pairs_dir)
    commit(docs, 0)
    n_idx = S.read_snapshot(spark, index_dir).count()
    n_pairs = S.read_snapshot(spark, pairs_dir).count()
    commit(docs, 0)                       # full replay: both tags present
    assert S.read_snapshot(spark, index_dir).count() == n_idx
    assert S.read_snapshot(spark, pairs_dir).count() == n_pairs
    # crash BETWEEN the two commits: index tag landed, pairs did not —
    # simulate by dropping the pairs table and replaying the epoch
    import shutil
    shutil.rmtree(pairs_dir)
    commit(docs, 0)
    assert S.read_snapshot(spark, index_dir).count() == n_idx  # no re-append
    assert S.read_snapshot(spark, pairs_dir).count() == n_pairs  # recomputed
