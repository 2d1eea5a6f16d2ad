"""As-of join: for each left row, the single most recent right row at or
before the left row's time, per key — the temporal-enrichment join Spark
has no built-in operator for (attach "the user's last signup as of this
purchase", "the model checkpoint as of this sample", ...).

Spark-first formulation: NOT an interval cross-join (which explodes on hot
keys) and NOT a per-key collect.  Both sides are tagged and unioned on the
(key, time) axis, then one partitioned window computes
``last(right_payload, ignorenulls=True)`` over rows ordered by
(time, tag) — right rows sort before left rows at equal timestamps, so the
match is inclusive, exactly DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``
semantics (the pytest oracle).  Cost: ONE shuffle on the key, window state
bounded per key — the same shape as sessionization, safe at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str = "ts",
              by: str = "user_id", tolerance: Column | None = None,
              suffix: str = "_asof") -> DataFrame:
    """Backward as-of LEFT join.

    Output: every left row with each non-key right column appended as
    ``<col><suffix>`` (and the matched right time as ``<on><suffix>``),
    NULL when no right row precedes it.  ``tolerance`` (an interval
    Column, e.g. ``F.expr("INTERVAL 1 HOUR")``) voids matches older than
    ``left.on - tolerance``.

    NULL semantics match DuckDB's ASOF JOIN: right rows with a NULL key or
    NULL time never match anything (filtered before the union); left rows
    with a NULL key or time are emitted unenriched.

    Ties: right rows at the exact left timestamp DO match (inclusive); two
    right rows at the same timestamp resolve deterministically to the
    greatest right payload (the window orders by (time, tag, payload
    struct) — field-wise comparison, so right columns must be orderable
    types; maps are not).
    """
    reserved = {"_by", "_on", "_tag", "_l", "_r", "_m"}
    clash = reserved & set(left.columns) | reserved & set(right.columns)
    if clash:
        raise ValueError(f"asof_join reserves column names {sorted(clash)}")
    rcols = [c for c in right.columns if c not in (on, by)]
    out_names = {f"{on}{suffix}", *(f"{c}{suffix}" for c in rcols)}
    dup = out_names & set(left.columns)
    if dup:  # else the output silently carries duplicate column names
        raise ValueError(
            f"asof_join output names {sorted(dup)} collide with left "
            f"columns — pass a different suffix"
        )
    r_struct = F.struct(F.col(on).alias(on),
                        *[F.col(c).alias(c) for c in rcols]).alias("_r")
    r_type = right.select(r_struct).schema["_r"].dataType
    l_struct = F.struct(*[F.col(c).alias(c) for c in left.columns]).alias("_l")
    l_type = left.select(l_struct).schema["_l"].dataType

    lu = left.select(
        F.col(by).alias("_by"), F.col(on).alias("_on"),
        F.lit(1).alias("_tag"), l_struct, F.lit(None).cast(r_type).alias("_r"),
    )
    ru = (
        right
        # NULL key/time rows can never be an as-of match (DuckDB: the ON
        # comparison is NULL) — without this they'd sort nulls-first into
        # every frame of their partition
        .filter(F.col(by).isNotNull() & F.col(on).isNotNull())
        .select(
            F.col(by).alias("_by"), F.col(on).alias("_on"),
            F.lit(0).alias("_tag"), F.lit(None).cast(l_type).alias("_l"),
            r_struct,
        )
    )
    w = (
        # _r in the ordering: a deterministic tiebreak between right rows
        # sharing a timestamp (otherwise `last` picks by partition layout)
        W.partitionBy("_by").orderBy(F.asc("_on"), F.asc("_tag"),
                                     F.asc_nulls_first("_r"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = (
        lu.unionByName(ru)
        .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_tag") == 1)
    )
    if tolerance is not None:
        matched = matched.withColumn(
            "_m",
            F.when(F.col(f"_m.{on}") >= F.col("_on") - tolerance, F.col("_m")),
        )
    out_cols = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col(f"_m.{on}").alias(f"{on}{suffix}"))
    out_cols.extend(F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in rcols)
    return matched.select(*out_cols)
