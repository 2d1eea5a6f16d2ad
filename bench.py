#!/usr/bin/env python
"""Benchmark runner.

Default mode: synthesize the interleaved corpus from
``$SPARK_GRAFT_SF_DIR/documents.parquet`` (default /root/testdata/sf0.1) to a
local parquet table once, then time (a) the extraction pipeline and (b) the
headline analytical queries on ``local[$SPARK_GRAFT_CPUS]``.  Prints ONE JSON
line::

  {"metric": "extracted_docs_per_sec", "value": N, "unit": "docs/sec",
   "queries": {...per-query sec...}, "sf": ..., "scaling": {...}}

Scaling evidence (north rule: >=0.8 throughput efficiency between N and 4N
executors; sandbox stand-in is local[N] vs local[4N] — default 3 vs 12, see
``run_scaling`` for why): included in every bench record by forking child
processes that time the identical extraction job on the same materialized
corpus, interleaved, best-per-level.  ``--no-scaling`` skips it;
``--scale-run MASTER`` is the child mode (internal).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPLICATE = int(os.environ.get("BENCH_REPLICATE", "32"))
CORPUS_DIR = os.path.join(
    REPO, ".bench",
    f'{os.path.basename(SF_DIR.rstrip("/"))}_corpus_x{REPLICATE}',
)

HEADLINE = [
    "q01_pricing_summary",
    "q03_revenue_by_nation",
    "q06_topk_per_group",
    "q07_running_sum",
    "q10_group_concat",
    "q13_dedup_tokens",
    "q21_dedup_exact",
    "q22_minhash_signatures",
    "q23_lsh_candidates",
    "q25_simhash",
    "q27_cosine_topk",
    "q30_quality_score",
]


def _session(master: str):
    from pdf_extraction_tests_spark.session import get_spark

    spark = get_spark(app="bench", master=master,
                      shuffle_partitions=int(master.split("[")[1].rstrip("]")))
    # The benchmark corpus is a few MB; the 128 MB default packs it into
    # ~4 scan partitions, serializing the scan and the shuffle-write side
    # of the salted repartition.  At real (100 TB) scale the default is
    # right — this is a small-input artifact, not a pipeline setting.
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1m")
    spark.conf.set("spark.sql.files.openCostInBytes", "64k")
    return spark


def ensure_corpus(spark) -> int:
    """Materialize the corpus parquet once; return doc count."""
    if not os.path.exists(os.path.join(CORPUS_DIR, "_SUCCESS")):
        from pyspark.sql import functions as F

        from pdf_extraction_tests_spark.corpus import corpus_spark

        base = corpus_spark(spark, SF_DIR)
        if REPLICATE > 1:
            reps = spark.range(REPLICATE).select(F.col("id").alias("_rep"))
            base = base.crossJoin(F.broadcast(reps)).select(
                F.concat_ws("#", "doc_id", "_rep").alias("doc_id"), "spans"
            )
        # many files so every scan starts parallel (documents.parquet is one
        # file -> one partition otherwise)
        base.repartition(256).write.mode("overwrite").parquet(CORPUS_DIR)
    return spark.read.parquet(CORPUS_DIR).count()


def _warmup(spark) -> None:
    """Spawn + warm every Python worker (package import from the shipped
    zip, numpy/pandas import) before any timed run — on a long-lived
    cluster these costs amortize to zero; without warmup a 10-second
    local benchmark measures worker cold-start, not the pipeline."""
    from pyspark.sql import functions as F

    from pdf_extraction_tests_spark.pipeline import extract_docs
    from pdf_extraction_tests_spark.schema import DOCS

    cores = spark.sparkContext.defaultParallelism
    docs = (
        spark.read.schema(DOCS).parquet(CORPUS_DIR)
        .limit(cores * 4)
        .repartition(cores * 2)
    )
    extract_docs(docs, num_parts=cores * 2).write.format("noop").mode(
        "overwrite"
    ).save()
    spark.range(0, cores * 4, 1, cores * 2).select(
        F.sum("id")
    ).collect()


def time_extraction(spark) -> tuple[float, int]:
    from pdf_extraction_tests_spark.pipeline import extract_docs
    from pdf_extraction_tests_spark.schema import DOCS

    docs = spark.read.schema(DOCS).parquet(CORPUS_DIR)
    n = docs.count()
    t0 = time.time()
    out = extract_docs(docs)
    out.write.format("noop").mode("overwrite").save()
    return time.time() - t0, n


def scale_run(master: str) -> None:
    """Child mode: warm up, then time extraction (best of 2 to damp
    run-to-run variance); print a tiny JSON line."""
    spark = _session(master)
    ensure_corpus(spark)
    _warmup(spark)
    best, n_total = time_extraction(spark)
    for _ in range(int(os.environ.get("BENCH_SCALE_REPEATS", "1")) - 1):
        sec, _ = time_extraction(spark)
        best = min(best, sec)
    print(json.dumps({"master": master, "docs": n_total, "sec": round(best, 3)}))
    spark.stop()


def run_scaling() -> dict:
    """N vs 4N scaling evidence.

    Default pair is local[3] vs local[12], NOT local[8] vs local[32]:
    each Spark task occupies a JVM thread (parquet decode, Arrow struct
    conversion) AND a Python worker process (the pandas kernel), plus the
    JVM's GC/shuffle/commit threads — a local[N] run keeps well over 2N
    threads runnable.  On this 32-CPU host local[16] is already slightly
    oversubscribed (measured slower than local[12]) and local[32] equals
    local[16]; 3->12 keeps both runs comfortably under the core count, so
    the measurement isolates the pipeline's scaling from host saturation.
    On a real cluster executor sizing accounts for Python workers
    explicitly and this ceiling does not apply.  A raw multiprocessing
    control (pure python spin, no Spark) measures the hardware's own
    4x-scale-up ceiling at ~0.85-0.99 (shared turbo/cache), recorded
    alongside.  Override with BENCH_SCALE_N.
    """
    n = int(os.environ.get("BENCH_SCALE_N", "3"))
    rounds = int(os.environ.get("BENCH_SCALE_ROUNDS", "3"))
    best: dict[int, float] = {}
    docs = 0
    # interleave the two levels (A,B,A,B) so a slow-host period cannot bias
    # one level; keep the best run per level
    for _ in range(rounds):
        for cores in (n, 4 * n):
            res = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--scale-run", f"local[{cores}]"],
                capture_output=True, text=True, cwd=REPO, timeout=3600,
            )
            line = [ln for ln in res.stdout.splitlines() if ln.startswith("{")][-1]
            rec = json.loads(line)
            docs = rec["docs"]
            best[cores] = min(best.get(cores, 1e18), rec["sec"])
    out = {
        f"local[{c}]": {"sec": s, "docs_per_sec": round(docs / s, 2)}
        for c, s in best.items()
    }
    t1 = out[f"local[{n}]"]["docs_per_sec"]
    t4 = out[f"local[{4 * n}]"]["docs_per_sec"]
    out["scaling_efficiency_n_to_4n"] = round((t4 / t1) / 4.0, 3)
    out["hardware_control"] = _hardware_scaling_control(n)
    return out


def _hardware_scaling_control(n: int) -> dict:
    """Pure-python multiprocessing spin: the hardware's own N->4N ceiling."""
    import multiprocessing as mp

    def _measure(procs: int) -> float:
        with mp.Pool(procs) as pool:
            return float(sum(pool.map(_burn, range(procs))))

    lo, hi = _measure(n), _measure(4 * n)
    return {"procs": [n, 4 * n],
            "efficiency_ceiling": round((hi / lo) / 4.0, 3)}


def _burn(_) -> int:
    end = time.time() + 1.5
    x = 0
    while time.time() < end:
        x += 1
    return x


def main() -> None:
    if "--scale-run" in sys.argv:
        scale_run(sys.argv[sys.argv.index("--scale-run") + 1])
        return

    from pdf_extraction_tests_spark.queries import queries

    # scaling children run FIRST, while no other JVM exists in this process
    # tree — a live multi-GB parent session polluted child measurements
    scaling = None
    if "--no-scaling" not in sys.argv:
        boot = _session(f"local[{CPUS}]")
        ensure_corpus(boot)
        boot.stop()
        scaling = run_scaling()

    spark = _session(f"local[{CPUS}]")
    n_docs = ensure_corpus(spark)
    _warmup(spark)

    per_query: dict[str, float] = {}
    extract_sec, n_docs = time_extraction(spark)
    per_query["extract_pipeline"] = round(extract_sec, 3)

    qmap = queries()
    for name in HEADLINE:
        fn = qmap[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        per_query[name] = round(time.time() - t0, 3)

    result = {
        "metric": "extracted_docs_per_sec",
        "value": round(n_docs / extract_sec, 2),
        "unit": "docs/sec",
        "queries": per_query,
        "sf": SF_DIR,
        "docs": n_docs,
        "cpus": CPUS,
        "total_query_sec": round(sum(per_query.values()), 3),
    }
    if scaling is not None:
        # the north-rule scaling evidence ships in every bench record
        result["scaling"] = scaling
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
