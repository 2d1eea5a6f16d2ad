#!/usr/bin/env python
"""Extra benchmarks (round 7 optimization evidence) — bench.py is FROZEN for
the driver's measurement, so per-query isolation, full-surface timing and
plan capture live here (guide §1.1/§1.4/§1.5).

* Times EVERY declared query (``__spark_entry__.queries()``) with the noop
  sink, best-of-N repeats, with job descriptions set.
* ``--plans DIR [--suffix before|after]`` writes ``.explain("formatted")``
  for each query to ``DIR/<query>_<suffix>.txt``.
* Session/conf methodology matches bench.py exactly (same task-slot cap,
  same small-input maxPartitionBytes override) so numbers are comparable
  with the driver's headline queries.

Usage:
  python bench_extra.py                      # time all queries at sf0.1
  python bench_extra.py --queries q23_lsh_candidates,q22_minhash_signatures
  python bench_extra.py --plans plans/r07 --suffix before --no-timing
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import bench  # noqa: E402 — reuse session/_warmup/corpus methodology


def _explain_formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default="",
                    help="comma-separated names (default: all declared)")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--plans", default="", help="dir for explain output")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-timing", action="store_true")
    ap.add_argument("--extract", action="store_true",
                    help="also time the extraction pipeline on the bench corpus")
    ap.add_argument("--out", default="", help="write JSON here too")
    args = ap.parse_args()

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py"))
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    spark = bench._session(f"local[{bench._effective_tasks()}]")
    qmap = entry.queries()
    names = [n for n in args.queries.split(",") if n] or list(qmap)
    unknown = [n for n in names if n not in qmap]
    if unknown:
        raise SystemExit(f"unknown query names: {unknown} "
                         f"(declared: {sorted(qmap)[:5]}...)")

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for name in names:
            if name not in qmap:
                continue
            try:
                df = qmap[name](spark, args.sf)
                text = _explain_formatted(df)
            except Exception as e:  # noqa: BLE001
                text = f"PLAN FAILED: {e!r}"
            with open(os.path.join(
                    args.plans, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(text)
            print(f"plan: {name}", flush=True)

    result: dict = {"sf": args.sf, "repeats": args.repeats}
    if not args.no_timing:
        # warm the workers exactly like bench.py so the first timed query
        # doesn't pay Python-worker cold start
        bench.ensure_corpus(spark)
        bench._warmup(spark)
        times: dict[str, list[float]] = {}
        with bench._StealMeter() as sm:
            for name in names:
                if name not in qmap:
                    continue
                fn = qmap[name]
                runs = []
                for _ in range(args.repeats):
                    spark.sparkContext.setJobDescription(f"bench_extra:{name}")
                    t0 = time.time()
                    df = fn(spark, args.sf)
                    df.write.format("noop").mode("overwrite").save()
                    runs.append(round(time.time() - t0, 3))
                spark.sparkContext.setJobDescription(None)
                times[name] = runs
                print(f"  {name}: {min(runs)} {runs}", flush=True)
        result["queries_best"] = {n: min(r) for n, r in times.items()}
        result["queries_all"] = times
        result["steal_pct"] = sm.steal_pct
        result["total_best_sec"] = round(
            sum(result["queries_best"].values()), 2)

    if args.extract:
        bench.ensure_corpus(spark)
        bench._warmup(spark)
        runs = []
        for _ in range(args.repeats):
            with bench._StealMeter() as sm:
                sec, n = bench.time_extraction(spark)
            runs.append({"sec": round(sec, 3), "steal_pct": sm.steal_pct})
        result["extract"] = {"runs": runs, "docs": n,
                             "best_sec": min(r["sec"] for r in runs)}

    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
