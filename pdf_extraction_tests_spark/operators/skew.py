"""Skew tools: salted two-phase aggregation for hot keys.

Spark's AQE splits skewed JOIN partitions automatically, and hash
aggregates with algebraic functions (count/sum/min/max) already combine
map-side — but HOLISTIC aggregates (collect_list / ordered group-concat)
funnel every row of a hot key through one task, and that is exactly the
aggregate the extraction domain needs (reading-ordered text assembly per
document/site/domain).  The classic fix: aggregate (key, salt) partials
first, then merge the ``salt`` partials per key — no task ever holds more
than ~1/salt of the hottest key's rows.

Two exchanges instead of one, both bounded; equivalence with the direct
single-phase form is pinned in tests/test_operators.py::TestSaltedAgg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_ordered_concat(df: DataFrame, key: str, order_col: str,
                          val_col: str, salt: int = 32,
                          sep: str = " ") -> DataFrame:
    """Ordered group-concat that survives hot keys.

    Phase 1 groups by (key, pmod(xxhash64(order_col), salt)) and collects
    (order, val) structs per salt bucket; phase 2 flattens + sorts the
    (at most ``salt``) partial arrays per key and joins.  Result is
    identical to ``array_join(array_sort(collect_list(struct(order, val))))``
    grouped by key alone — the A1 ordered-concat semantics — while the
    biggest single aggregation state is ~hottest_key/salt rows.
    """
    # salt on (order, val): hashing the order column alone collapses every
    # row sharing an order value into ONE bucket — a hot key with few
    # distinct order values would defeat the bound.  Correctness is salt-
    # independent (phase 2 re-sorts globally per key).
    salted = df.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.col(order_col), F.col(val_col)), F.lit(salt)),
    )
    partial = salted.groupBy(key, "_salt").agg(
        F.collect_list(F.struct(F.col(order_col).alias("o"),
                                F.col(val_col).alias("v"))).alias("_part")
    )
    merged = partial.groupBy(key).agg(
        F.flatten(F.collect_list("_part")).alias("_all")
    )
    return merged.select(
        key,
        F.array_join(
            F.transform(F.array_sort("_all"), lambda s: s["v"]), sep
        ).alias("concat"),
    )
