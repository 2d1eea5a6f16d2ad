"""Streaming curation (streaming/curation.py): batch-split == one-shot,
exactly-once replay, end-to-end availableNow drain."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_extraction_tests_spark.streaming.curation import (
    curate_batch,
    curation_batch_committer,
    stream_curate,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_stream_drain_equals_one_shot(spark, tmp_path):
    from pdf_extraction_tests_spark.snapshots import read_snapshot

    docs = _docs(spark)
    inp = str(tmp_path / "in")
    # two landing files -> at least two micro-batches at 1 file/trigger
    docs.filter("doc_id < 250").repartition(1).write.parquet(inp)
    docs.filter("doc_id >= 250").repartition(1).write.mode("append").parquet(inp)
    table = str(tmp_path / "curated")
    # lang=None: the streaming-machinery contract is under test, not the
    # LID expression (whose analysis cost re-pays per epoch); the full
    # stack incl. LID runs once in test_kept_rows_are_scrubbed_and_gated
    q = stream_curate(spark, inp, table,
                      str(tmp_path / "ckpt"), max_files_per_trigger=1,
                      lang=None)
    q.processAllAvailable()
    q.stop()

    got = sorted(map(tuple, read_snapshot(spark, table).collect()))
    want = sorted(map(tuple, curate_batch(docs, lang=None).collect()))
    assert got == want
    assert want, "gates must keep a non-empty subset"
    assert len(want) < docs.count(), "gates must drop something"


def test_replayed_epoch_is_noop(spark, tmp_path):
    from pdf_extraction_tests_spark.snapshots import (
        current_version, read_snapshot)

    table = str(tmp_path / "curated")
    commit = curation_batch_committer(table, lang=None)
    batch = _docs(spark).filter("doc_id < 100")
    commit(batch, 0)
    v1 = current_version(table)
    n1 = read_snapshot(spark, table).count()
    commit(batch, 0)                      # crash-replay of the same epoch
    assert current_version(table) == v1   # no second snapshot
    assert read_snapshot(spark, table).count() == n1
    commit(_docs(spark).filter("doc_id >= 100"), 1)
    assert current_version(table) == v1 + 1


def test_kept_rows_are_scrubbed_and_gated(spark):
    kept = curate_batch(
        _docs(spark).withColumn(
            "text",
            F.concat("text", F.lit(" reach me at a@b.example now")),
        )
    ).limit(20).collect()
    assert kept
    for r in kept:
        assert "@" not in r.clean_text          # PII scrub applied
        assert r.lang_guess == "en"
        assert float(r.quality) >= 1.0
