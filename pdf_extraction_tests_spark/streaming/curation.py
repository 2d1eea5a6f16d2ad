"""Streaming corpus curation: per-document gates applied as data lands.

The batch curation funnel (queries.q59) composes corpus-LEVEL signals
(learned boilerplate df, cross-doc canonicalization) with per-DOCUMENT
gates (language ID, quality score, within-doc repetition, PII scrub).
Only the per-document half is micro-batch-expressible: a batch cannot
know the corpus's gram document frequencies.  This module streams that
half — each arriving batch is gated, scrubbed, and appended to a
snapshot table with epoch-tagged exactly-once commits (the
snapshot_batch_committer contract from streaming/incremental.py) — and
the corpus-level half runs downstream over the curated table (batch q59,
or dedup.lsh_index_append for incremental near-dup).

Because every gate is per-document, ANY batch split produces exactly the
rows of a one-shot run (pinned in tests/test_streaming_curation.py) —
the streaming path changes scheduling, never results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

DOCUMENTS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("source", T.StringType(), True),
    T.StructField("n_chars", T.LongType(), True),
])


def curate_batch(docs: DataFrame,
                 lang: str | None = "en",
                 min_quality: float = 1.0,
                 max_dup_trigram: float = 0.05,
                 max_top_bigram: float = 0.1) -> DataFrame:
    """The per-document gate stack over one (micro-)batch.

    Returns the KEPT documents as (doc_id, clean_text, lang_guess,
    quality, top_bigram_frac, dup_trigram_frac) — clean_text is
    PII-scrubbed.  Same operators as the standalone queries
    (q29/q30/q57/q56), so the streaming path cannot drift from them.

    ``lang=None`` disables the language gate AND skips building the LID
    expression entirely (lang_guess reads NULL): the 18-language score
    tree is by far the most expensive part of the plan to ANALYZE, and a
    foreachBatch sink re-plans it per epoch — pipelines that gate on
    language elsewhere should not pay it here.
    """
    from pdf_extraction_tests_spark.operators.pii import scrub_pii
    from pdf_extraction_tests_spark.operators.repetition import (
        repetition_signals)
    from pdf_extraction_tests_spark.operators.text_analysis import (
        with_language_guess, with_quality_score)

    if lang is None:
        scored = docs.withColumn(
            "lang_guess", F.lit(None).cast("string"))
        lang_gate = F.lit(True)
    else:
        scored = with_language_guess(docs)
        lang_gate = F.col("lang_guess") == lang
    base = with_quality_score(scored).select(
        "doc_id", "text", "lang_guess", "quality")
    rep = repetition_signals(docs).select(
        "doc_id", "top_bigram_frac", "dup_trigram_frac")
    scrubbed = scrub_pii(docs).select("doc_id", "clean_text")
    return (
        base.join(rep, "doc_id")
        .join(scrubbed, "doc_id")
        .filter(
            lang_gate
            & (F.col("quality") >= min_quality)
            & (F.col("dup_trigram_frac") <= max_dup_trigram)
            & (F.col("top_bigram_frac") <= max_top_bigram)
        )
        .select("doc_id", "clean_text", "lang_guess", "quality",
                "top_bigram_frac", "dup_trigram_frac")
    )


def curation_batch_committer(table_dir: str, **gate_kwargs):
    """foreachBatch body: gate the batch, append the keepers as one
    epoch-tagged snapshot (replay after a crash is a no-op)."""

    def process_batch(batch_df, epoch_id: int) -> None:
        from pdf_extraction_tests_spark import snapshots as S

        tag = f"epoch-{int(epoch_id)}"
        if tag in S.committed_tags(table_dir):
            return
        kept = curate_batch(batch_df, **gate_kwargs)
        S.commit_snapshot(kept, table_dir, mode="append", tag=tag)

    return process_batch


def stream_curate(spark: SparkSession, input_path: str, table_dir: str,
                  checkpoint_path: str, max_files_per_trigger: int = 8,
                  **gate_kwargs):
    """Available-now streaming curation over a growing parquet directory
    of documents; exactly-once into the snapshot table."""
    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )
    return (
        stream.writeStream
        .foreachBatch(curation_batch_committer(table_dir, **gate_kwargs))
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
