"""Plan-shape regression tests: the physical plans scale requires.

Results being right is not enough — these pin that filters push into the
parquet scan, dimensions broadcast, column pruning holds, and the extraction
pipeline performs exactly one shuffle (its salted repartition).
"""

from __future__ import annotations

import pytest

from pdf_extraction_tests_spark.plans.audit import (
    count_exchanges,
    formatted_plan,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
)
from pdf_extraction_tests_spark.queries import queries

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def q(spark):
    return {name: fn(spark, SF) for name, fn in queries().items()
            if name in ("q01_pricing_summary", "q02_filter_project",
                        "q03_revenue_by_nation", "q17_band_join")}


def test_filter_pushdown_reaches_scan(q):
    plan = formatted_plan(q["q02_filter_project"])
    pf = pushed_filters(plan)
    assert "l_quantity" in pf and "l_discount" in pf, plan


def test_column_pruning(q):
    cols = read_schema_columns(formatted_plan(q["q02_filter_project"]))
    # 5 needed columns, not all 11 of lineitem
    assert set(cols) == {"l_orderkey", "l_linenumber", "l_quantity",
                         "l_extendedprice", "l_discount"}


def test_date_filter_pushdown(q):
    plan = formatted_plan(q["q01_pricing_summary"])
    assert "l_shipdate" in pushed_filters(plan)


def test_dims_broadcast(q):
    plan = formatted_plan(q["q03_revenue_by_nation"])
    assert has_broadcast_join(plan)


def test_band_join_is_broadcast(q):
    plan = formatted_plan(q["q17_band_join"])
    assert has_broadcast_join(plan)
    assert count_exchanges(plan) <= 1  # only the final groupBy shuffle


def test_contamination_screen_broadcasts_holdout(spark):
    """q43: the (small) holdout shingle set must broadcast — the corpus
    side stays a single scan with no corpus-wide shuffle before the
    per-doc aggregation."""
    plan = formatted_plan(queries()["q43_contamination_screen"](spark, SF))
    assert has_broadcast_join(plan)


def test_stratified_sample_filter_is_scan_side(spark):
    """q44: the keep-rate predicate is a pure scan-side filter — no
    exchange before the final per-source count."""
    plan = formatted_plan(queries()["q44_stratified_sample"](spark, SF))
    assert count_exchanges(plan) <= 1, plan  # only the groupBy('source')


def test_bucketed_embedding_dedup_no_cartesian(spark):
    """q40 must NOT contain a cartesian/nested-loop join over the corpus:
    candidates come from the banded equi-join on (band, bucket)."""
    plan = formatted_plan(
        queries()["q40_embedding_dedup_bucketed"](spark, SF))
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan \
        or "BroadcastHashJoin" in plan, plan


def test_extraction_single_shuffle(spark):
    """The happy-path extraction plan: exactly one exchange (the salted
    part_key repartition) between scan and the Arrow stage."""
    from pdf_extraction_tests_spark.corpus import corpus_pandas
    from pdf_extraction_tests_spark.pipeline import extract_docs
    from pdf_extraction_tests_spark.schema import DOCS
    import pandas as pd

    src = pd.read_parquet(f"{SF}/documents.parquet").head(8)
    docs = spark.createDataFrame(corpus_pandas(src), schema=DOCS)
    out = extract_docs(docs, num_parts=4, oversize_chars=10**12)
    plan = formatted_plan(out)
    # The Union's first branch (":-" prefixed tree lines) is the small path:
    # exactly one Exchange feeding MapInPandas.  The chunked branch owns the
    # other exchanges but processes zero rows (empty after the size filter).
    small_branch = [ln for ln in plan.splitlines() if ln.lstrip().startswith(":")]
    assert sum("Exchange" in ln for ln in small_branch) == 1, plan
    assert any("MapInPandas" in ln for ln in small_branch), plan
    assert count_exchanges(plan) == 3, plan  # 1 small + 2 chunked-path


def test_extraction_scan_prunes_to_needed_columns(spark):
    from pdf_extraction_tests_spark.corpus import corpus_spark

    docs = corpus_spark(spark, SF)
    cols = read_schema_columns(formatted_plan(docs))
    assert set(cols) == {"doc_id", "text"}  # not lang/source/n_chars


def test_token_budget_head_no_global_corpus_window(spark):
    """q45: the running sum must NOT be a global-ordered window over the
    corpus (single-task sort).  Corpus-sized window work is partitioned on
    (quality, _sub); the only single-partition exchange feeds the tiny
    bucket-totals window (input = one row per bucket, i.e. an aggregate)."""
    plan = formatted_plan(queries()["q45_token_budget_head"](spark, SF))
    # the per-row running sum is a PARTITIONED window
    assert "partitionBy=[quality" in plan.replace(" ", "") or \
        "hashpartitioning(quality" in plan, plan
    # at most one SinglePartition exchange, and the offsets side broadcasts
    assert plan.count("Exchange SinglePartition") <= 1, plan
    assert has_broadcast_join(plan), plan


def test_ivf_partitioned_probe_is_partition_pruned(spark, tmp_path):
    """The at-scale IVF layout: writing bucketed by ivf_list and probing
    must plan a PartitionFilters-pruned scan (not a full scan + filter),
    and return exactly what the in-memory IVF probe returns."""
    from pdf_extraction_tests_spark.operators import similarity as S

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = S.ivf_centroids(emb, n_lists=8, seed=7)
    path = str(tmp_path / "ivf")
    S.write_ivf_partitioned(emb, cents, path)
    qvec = [float(x) for x in emb.orderBy("vec_id").first().embedding]

    got = S.ivf_topk_partitioned(spark, path, qvec, cents, k=5, n_probe=2)
    plan = formatted_plan(got)
    import re as _re

    m = _re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "ivf_list" in m.group(1), plan  # pruning actually planned

    probe = {
        (r.vec_id, r.cosine)
        for r in S.ivf_topk(emb, qvec, k=5, n_lists=8, n_probe=2, seed=7).collect()
    }
    assert {(r.vec_id, r.cosine) for r in got.collect()} == probe


def test_bucketed_join_no_shuffle(spark, tmp_path):
    """Two tables bucketed+sorted on the join key must sort-merge join with
    ZERO exchanges and zero sorts — the pay-once co-location layout for
    fact-fact joins at scale."""
    from pdf_extraction_tests_spark.tables import write_bucketed

    spark.sql("CREATE DATABASE IF NOT EXISTS bdemo "
              f"LOCATION '{tmp_path / 'bdemo'}'")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    write_bucketed(orders.withColumnRenamed("o_orderkey", "k"),
                   "bdemo.orders_b", "k", buckets=4)
    write_bucketed(lineitem.withColumnRenamed("l_orderkey", "k"),
                   "bdemo.lineitem_b", "k", buckets=4)
    a = spark.table("bdemo.orders_b").select("k", "o_totalprice")
    b = spark.table("bdemo.lineitem_b").select("k", "l_quantity")
    # merge hint: at the modeled scale BOTH sides are facts (nothing
    # broadcasts); without it the planner broadcasts the tiny test table
    # and disables bucketing entirely
    joined = a.hint("merge").join(b, "k")
    plan = formatted_plan(joined)
    assert "SortMergeJoin" in plan, plan
    assert count_exchanges(plan) == 0, plan          # co-located: no shuffle
    assert "Bucketed: true" in plan, plan
    # row-count sanity vs the unbucketed join
    n_plain = (orders.join(lineitem,
                           orders.o_orderkey == lineitem.l_orderkey).count())
    assert joined.count() == n_plain
    spark.sql("DROP TABLE bdemo.orders_b")
    spark.sql("DROP TABLE bdemo.lineitem_b")


def test_aqe_splits_skewed_join_partition(spark):
    """Runtime skew evidence: a 99%-hot join key must come out of AQE as a
    SPLIT sort-merge join (skew=true), not one straggler task — the
    config-only skew path the pipeline relies on at 100 TB (salting covers
    the aggregation side, AQE covers joins)."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16k",
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        hot = spark.range(0, 60000).select(
            F.lit(0).alias("k"), F.col("id").alias("v"))
        cold = spark.range(1, 101).select(
            F.col("id").alias("k"), F.col("id").alias("v"))
        # incompressible pad: shuffle sizes are COMPRESSED bytes, and a
        # constant pad lz4s below the skew threshold
        left = hot.unionByName(cold).withColumn(
            "pad", F.expr("concat(md5(cast(v as string)), "
                          "md5(cast(v+1 as string)))"))
        right = spark.range(0, 101).select(
            F.col("id").alias("k"), F.col("id").alias("rv"))
        j = left.join(right, "k").select(F.length("pad").alias("n"))
        assert j.count() == 60100
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_sequence_pack_no_global_corpus_window(spark):
    """q49: the packing prefix sum must be partitioned (per sub-bucket);
    the only single-partition exchange feeds the tiny bucket-totals
    window, and the offsets side broadcasts back."""
    plan = formatted_plan(queries()["q49_sequence_pack"](spark, SF))
    assert "partitionBy=[_sub" in plan.replace(" ", "") or \
        "hashpartitioning(_sub" in plan, plan
    assert plan.count("Exchange SinglePartition") <= 1, plan
    assert has_broadcast_join(plan), plan


def test_asof_join_is_single_key_shuffle(spark):
    """operators/asof.py claims ONE shuffle on the key (union + partitioned
    window, no interval cross-join): the plan must contain exactly one
    exchange hash-partitioned on the by-key and no cartesian/range join."""
    from pyspark.sql import functions as F

    from pdf_extraction_tests_spark.operators.asof import asof_join

    ev = spark.read.parquet(f"{SF}/events.parquet")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id")
    right = ev.filter(F.col("event_type") == "signup").select(
        "ts", "user_id", F.col("value").alias("signup_value"))
    plan = formatted_plan(asof_join(left, right))
    flat = plan.replace(" ", "")
    assert flat.count("hashpartitioning(_by") == 1, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan, plan


def test_hll_partial_aggregation_bounds_state(spark):
    """q95 (HLL): the register build must show partial (map-side)
    aggregation — each task reduces to <= 2^p rows before the single
    bucket shuffle — and exactly one exchange feeds the final global
    fold.  No per-distinct-value shuffle ever forms."""
    from pdf_extraction_tests_spark.operators.sketches import hll_ndv

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = formatted_plan(hll_ndv(docs, "text"))
    # two-level agg: partial HashAggregate before each exchange
    assert plan.count("HashAggregate") >= 4, plan
    assert count_exchanges(plan) <= 2, plan   # bucket shuffle + final fold
    assert "Exchange rangepartitioning" not in plan, plan


def test_boilerplate_frequent_set_broadcasts(spark):
    """q51: the learned frequent-gram set joins back as a broadcast (never
    a shuffled hash join of the exploded gram stream), and the gram df
    aggregation is two-level (map-side countDistinct partials)."""
    from pdf_extraction_tests_spark.operators.boilerplate import (
        boilerplate_fraction)

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = formatted_plan(boilerplate_fraction(docs))
    assert has_broadcast_join(plan)
    assert "CartesianProduct" not in plan, plan
    assert plan.count("HashAggregate") >= 4, plan


def test_bm25_topk_is_two_phase(spark):
    """q52: both top-k windows are present — the salted (term, _salt)
    prune before the per-term final rank — so no single task ever ranks a
    hot term's full posting list; corpus stats attach via broadcast."""
    from pdf_extraction_tests_spark.operators.bm25 import bm25_topk

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = formatted_plan(bm25_topk(docs, ["join", "window", "spark"]))
    assert plan.count("hashpartitioning(term") >= 2, plan
    assert "_salt" in plan, plan
    assert has_broadcast_join(plan)


def test_binned_quantiles_state_is_bounded(spark):
    """q53: both passes are hash aggregates with map-side partials (state
    <= bins counters per task); no global Sort of the scanned column ever
    appears (that would be the exact-percentile anti-plan)."""
    from pdf_extraction_tests_spark.operators.quantiles import (
        binned_quantiles)

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    plan = formatted_plan(binned_quantiles(li, "l_extendedprice"))
    assert "Exchange rangepartitioning" not in plan, plan
    assert plan.count("HashAggregate") >= 2, plan
    assert has_broadcast_join(plan) or "BroadcastNestedLoop" in plan, plan


def test_chunk_windows_zero_shuffle(spark):
    """q54: sliding-window chunking is a pure scan-side transform — zero
    exchanges, no Python (no ArrowEvalPython / BatchEvalPython nodes)."""
    from pdf_extraction_tests_spark.operators.chunking import chunk_documents

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = formatted_plan(chunk_documents(docs))
    assert count_exchanges(plan) == 0, plan
    assert "EvalPython" not in plan, plan


def test_dup_span_rewrite_join_is_copartitioned_not_broadcast(spark):
    """q55: the duplicate-gram join must be a shuffle join keyed on gram
    (the dup vocabulary grows with the corpus — broadcasting it is the
    100 TB anti-plan); the rewrite itself adds no Python."""
    from pdf_extraction_tests_spark.operators.substring_dedup import (
        duplicated_span_rewrite)

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = formatted_plan(duplicated_span_rewrite(docs))
    assert "hashpartitioning(gram" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_pii_scrub_zero_shuffle(spark):
    """q56: the scrubber is one codegen projection — zero exchanges,
    zero Python."""
    from pdf_extraction_tests_spark.operators.pii import scrub_pii

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = formatted_plan(scrub_pii(docs))
    assert count_exchanges(plan) == 0, plan
    assert "EvalPython" not in plan, plan


def test_repetition_aggregates_are_algebraic(spark):
    """q57: both gram pyramids are hash aggregates with map-side partials
    (no window over raw grams, no sort-based holistic state)."""
    from pdf_extraction_tests_spark.operators.repetition import (
        repetition_signals)

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = formatted_plan(repetition_signals(docs))
    assert plan.count("HashAggregate") >= 6, plan   # 2 grams x (partial+final)+fold
    assert "Exchange rangepartitioning" not in plan, plan


def test_quota_sample_is_two_phase(spark):
    """q58: both windows present — the salted (source, _salt) prune before
    the final per-source rank — so a hot domain never funnels through one
    task."""
    from pdf_extraction_tests_spark.operators.sampling import quota_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "source", "n_chars")
    plan = formatted_plan(
        quota_sample(docs, "source", "doc_id", "n_chars", 5))
    assert plan.count("hashpartitioning(source") >= 2, plan
    assert "_salt" in plan, plan


def test_curation_funnel_single_lazy_plan(spark):
    """q59: the composed funnel stays declarative — scan-side LID/quality,
    keyed shuffles only for the rep/boiler/canon signals, q51's frequent
    set still broadcast inside the composition, and no global sort.

    Round-7: the LID gate moved to the Arrow-vectorized kernel (10x;
    equivalence pinned in test_langid), so the plan legitimately carries
    ArrowEvalPython nodes — still scan-side, still zero extra shuffles.
    The pin now enforces the real invariant: no row-pickled Python
    (BatchEvalPython) ever, and the only Python nodes are the Arrow ones."""
    import importlib
    Q = importlib.import_module("pdf_extraction_tests_spark.queries")
    plan = formatted_plan(Q.queries()["q59_curation_funnel"](spark, SF))
    assert "BatchEvalPython" not in plan, plan
    # every Python node must be the vectorized Arrow flavor
    assert plan.count("EvalPython") == plan.count("ArrowEvalPython"), plan
    assert "CartesianProduct" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert has_broadcast_join(plan)


def test_kmeans_centroid_update_state_is_bounded(spark):
    """q60: assignment joins are broadcasts of the k-row centroid side
    (never a shuffle of the corpus against centroids); the update
    aggregation is a hash aggregate with map-side partials (k x dim
    counters per task); no global sort of the embedding table."""
    from pdf_extraction_tests_spark.operators.kmeans import kmeans_assign

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = formatted_plan(kmeans_assign(emb))
    assert has_broadcast_join(plan)
    assert "CartesianProduct" not in plan, plan
    assert plan.count("HashAggregate") >= 4, plan
    assert "EvalPython" not in plan, plan


def test_semantic_near_dups_no_cartesian(spark):
    """q61: the within-cluster pairwise compare must be an equi-join on
    cluster — never a cartesian over the embedding table.  (The
    BroadcastNestedLoopJoin nodes inside the plan are the k-ROW centroid
    broadcast from the embedded q60 assignment — corpus x constant, fine;
    the corpus x corpus pair join must be the SortMergeJoin.)"""
    from pdf_extraction_tests_spark.operators.kmeans import semantic_near_dups

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = formatted_plan(semantic_near_dups(emb))
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    assert "hashpartitioning(cluster" in plan, plan
