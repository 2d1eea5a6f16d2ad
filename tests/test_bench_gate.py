"""Unit tests for bench.py's per-query regression gate (pure function —
no Spark, no subprocess)."""

from __future__ import annotations

import bench


class TestRegressionFlags:
    def test_flags_only_past_threshold(self):
        prior = {"q1": 1.0, "q2": 2.0, "q3": 0.5}
        now = {"q1": 1.4, "q2": 3.2, "q3": 0.8}
        flags = bench.regression_flags(now, prior, threshold=1.5)
        assert [f["query"] for f in flags] == ["q2", "q3"]
        assert flags[0]["ratio"] == 1.6
        assert flags[1]["prior_sec"] == 0.5

    def test_sorted_worst_first(self):
        prior = {"a": 1.0, "b": 1.0}
        flags = bench.regression_flags({"a": 2.0, "b": 5.0}, prior)
        assert [f["query"] for f in flags] == ["b", "a"]

    def test_new_queries_never_flagged(self):
        flags = bench.regression_flags({"brand_new": 100.0}, {"old": 1.0})
        assert flags == []

    def test_zero_or_missing_prior_safe(self):
        flags = bench.regression_flags({"q": 3.0}, {"q": 0.0})
        assert flags == []

    def test_no_flags_when_faster(self):
        assert bench.regression_flags({"q": 0.4}, {"q": 1.0}) == []

    def test_latest_bench_record_reads_newest(self):
        got = bench._latest_bench_record()
        assert got is not None
        name, queries = got
        # round 4 is the newest committed record as this test is written;
        # assert shape, not the specific round number
        assert name.startswith("BENCH_r") and name.endswith(".json")
        assert "extract_pipeline" in queries
        assert all(isinstance(v, (int, float)) for v in queries.values())
