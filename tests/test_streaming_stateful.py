"""Stateful span assembly: state accumulates across micro-batches AND
across stream restarts (checkpointed), emitting each doc exactly once."""

from __future__ import annotations

import pandas as pd

from pdf_extraction_tests_spark.streaming.stateful import (
    SPAN_EVENTS,
    assemble_spans_stream,
)


def _events(rows):
    return pd.DataFrame(
        rows, columns=["doc_id", "kind", "text", "media_ref", "offset", "is_last"]
    )


def _run_available(spark, src_dir, out_dir, ckpt):
    stream = (
        spark.readStream.schema(SPAN_EVENTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        assemble_spans_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_assembly_across_batches_and_restart(spark, tmp_path):
    src = str(tmp_path / "events")
    out = str(tmp_path / "assembled")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: doc B completes; doc A stays open (no terminal marker yet)
    b1 = _events(
        [
            ("A", "region", "1,1,10,5,5,plain text|a first", None, 0, False),
            ("A", "region", "1,1,20,5,5,plain text|a second", None, 1, False),
            ("B", "region", "1,1,10,5,5,plain text|b first", None, 0, False),
            ("B", "media", "", "img://b/0", 1, True),
        ]
    )
    # one file per logical batch: availableNow processes files in an
    # arbitrary order, so a multi-file write could deliver a doc's terminal
    # marker before its earlier spans (real feeds order by event time)
    spark.createDataFrame(b1, schema=SPAN_EVENTS).coalesce(1).write.parquet(src)
    _run_available(spark, src, out, ckpt)
    got1 = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert set(got1) == {"B"}  # A is still open — nothing emitted
    assert got1["B"].complete is True
    assert [s.offset for s in got1["B"].spans] == [0, 1]

    # batch 2 in a RESTARTED stream (same checkpoint): A's tail arrives —
    # the earlier spans must come back from checkpointed state
    b2 = _events(
        [
            ("A", "region", "1,1,30,5,5,plain text|a third", None, 2, True),
        ]
    )
    spark.createDataFrame(b2, schema=SPAN_EVENTS).coalesce(1).write.mode(
        "append").parquet(src)
    _run_available(spark, src, out, ckpt)
    got2 = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert set(got2) == {"A", "B"}
    a = got2["A"]
    assert a.complete is True
    assert [s.offset for s in a.spans] == [0, 1, 2]  # all three, input order
    assert [s.text.split("|")[-1] for s in a.spans] == [
        "a first", "a second", "a third"
    ]

    # restart with no new input: exactly-once — nothing re-emitted
    _run_available(spark, src, out, ckpt)
    assert spark.read.parquet(out).count() == 2
