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
executors; sandbox stand-in is local[8] vs local[32]): run with
``--scaling`` to fork two child processes that each time the identical
extraction job on the same materialized corpus at the two core counts.
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
CORPUS_DIR = os.path.join(REPO, ".bench", os.path.basename(SF_DIR.rstrip("/")) + "_corpus")

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

    return get_spark(app="bench", master=master,
                     shuffle_partitions=int(master.split("[")[1].rstrip("]")))


def ensure_corpus(spark) -> int:
    """Materialize the corpus parquet once; return doc count."""
    if not os.path.exists(os.path.join(CORPUS_DIR, "_SUCCESS")):
        from pdf_extraction_tests_spark.corpus import corpus_spark

        corpus_spark(spark, SF_DIR).write.mode("overwrite").parquet(CORPUS_DIR)
    return spark.read.parquet(CORPUS_DIR).count()


def time_extraction(spark) -> tuple[float, int]:
    from pdf_extraction_tests_spark.pipeline import extract_docs
    from pdf_extraction_tests_spark.schema import DOCS

    docs = spark.read.schema(DOCS).parquet(CORPUS_DIR)
    t0 = time.time()
    out = extract_docs(docs, num_parts=64)
    out.write.format("noop").mode("overwrite").save()
    return time.time() - t0, spark.read.parquet(CORPUS_DIR).count()


def scale_run(master: str) -> None:
    """Child mode: time extraction only, print a tiny JSON line."""
    spark = _session(master)
    n = ensure_corpus(spark)
    sec, _ = time_extraction(spark)
    print(json.dumps({"master": master, "docs": n, "sec": round(sec, 3)}))
    spark.stop()


def run_scaling() -> dict:
    out = {}
    for cores in (8, 32):
        res = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scale-run", f"local[{cores}]"],
            capture_output=True, text=True, cwd=REPO, timeout=3600,
        )
        line = [ln for ln in res.stdout.splitlines() if ln.startswith("{")][-1]
        rec = json.loads(line)
        out[f"local[{cores}]"] = {
            "sec": rec["sec"],
            "docs_per_sec": round(rec["docs"] / rec["sec"], 2),
        }
    t8 = out["local[8]"]["docs_per_sec"]
    t32 = out["local[32]"]["docs_per_sec"]
    out["scaling_efficiency_8_to_32"] = round((t32 / t8) / 4.0, 3)
    return out


def main() -> None:
    if "--scale-run" in sys.argv:
        scale_run(sys.argv[sys.argv.index("--scale-run") + 1])
        return

    from pdf_extraction_tests_spark.queries import queries

    spark = _session(f"local[{CPUS}]")
    n_docs = ensure_corpus(spark)

    per_query: dict[str, float] = {}
    extract_sec, _ = time_extraction(spark)
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
    if "--scaling" in sys.argv:
        result["scaling"] = run_scaling()
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
