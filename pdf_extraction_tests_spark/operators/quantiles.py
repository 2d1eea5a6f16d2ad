"""Two-pass fixed-bin histogram quantiles — scale-safe percentiles.

Exact percentiles need a global sort (or a single-task ``percentile``
holistic aggregate); at corpus scale both are non-starters.  The classic
two-pass estimator bounds state by construction:

  pass 1 — min/max/count (algebraic, map-side combinable, O(1) state);
  pass 2 — fixed-B equi-width histogram (groupBy bin: at most B groups of
           O(1) state each), then linear interpolation inside the target
           bin.

Both passes are full scans but NEVER hold more than B counters per task,
at any corpus size.  The cumulative step windows over exactly B rows —
bounded by the ``bins`` parameter, not by the data.  (Spark's own
``approx_percentile`` solves this with a KLL/GK sketch; this operator is
the deterministic, cross-engine-replayable variant: every arithmetic step
is plain double math DuckDB reproduces bit for bit, so the oracle is an
equality check, not a tolerance band.)

No driver-side materialization: pass-1 stats are re-attached via
crossJoin(broadcast) so the whole thing stays one lazy plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

DEFAULT_BINS = 64
DEFAULT_QS = (0.5, 0.9, 0.99)


def binned_quantiles(
    df: DataFrame,
    col: str,
    bins: int = DEFAULT_BINS,
    qs: tuple[float, ...] = DEFAULT_QS,
) -> DataFrame:
    """Histogram-interpolated quantile estimates of ``df[col]``.

    Returns (q, est) — one row per requested quantile, est rounded to 4 dp.
    Estimate convention: with target = q * count, find the first bin whose
    cumulative count reaches target and interpolate linearly within it:
    ``est = lo + (target - cum_before) / bin_count * width``.

    Quantiles must satisfy 0 < q <= 1: q = 0.0 has target 0, which no bin's
    ``cum_before < target`` interval contains — the row would VANISH
    silently (identically in the DuckDB twin, so the oracle could not
    catch it).  Rejected loudly instead; use min() for the exact minimum.
    """
    if not all(0.0 < float(q) <= 1.0 for q in qs):
        raise ValueError(f"quantiles must be in (0, 1], got {qs!r}")
    stats = df.agg(
        F.min(col).cast("double").alias("lo"),
        F.max(col).cast("double").alias("hi"),
        F.count(col).cast("double").alias("n"),
    )
    binned = (
        df.select(F.col(col).cast("double").alias("x"))
        .crossJoin(F.broadcast(stats))
        .select(
            F.least(
                F.floor((F.col("x") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / bins)),
                F.lit(bins - 1),
            ).cast("bigint").alias("bin")
        )
        .groupBy("bin")
        .agg(F.count("*").cast("double").alias("cnt"))
    )
    cum = binned.withColumn(
        # at most `bins` rows — the single-partition window is bounded by
        # the parameter, not the data
        "cum", F.sum("cnt").over(W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0))
    ).withColumn("cum_before", F.col("cum") - F.col("cnt"))

    q_rows = (
        df.sparkSession.range(1)
        .select(F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"))
    )
    target = F.col("q") * F.col("n")
    return (
        q_rows.crossJoin(F.broadcast(stats))
        .join(
            F.broadcast(cum),
            (F.col("cum") >= F.col("q") * F.col("n"))
            & (F.col("cum") - F.col("cnt") < F.col("q") * F.col("n")),
        )
        .select(
            "q",
            F.round(
                F.col("lo")
                + (F.col("bin") + (target - F.col("cum_before")) / F.col("cnt"))
                * ((F.col("hi") - F.col("lo")) / bins),
                4,
            ).alias("est"),
        )
    )


def binned_quantiles_sql(
    table: str,
    col: str,
    bins: int = DEFAULT_BINS,
    qs: tuple[float, ...] = DEFAULT_QS,
) -> str:
    """DuckDB oracle for :func:`binned_quantiles` — identical binning and
    interpolation arithmetic (same doubles, same rounding)."""
    q_values = ", ".join(f"({float(q)})" for q in qs)
    return f"""
    WITH stats AS (
      SELECT CAST(min({col}) AS DOUBLE) AS lo,
             CAST(max({col}) AS DOUBLE) AS hi,
             CAST(count({col}) AS DOUBLE) AS n
      FROM {table}
    ),
    binned AS (
      SELECT CAST(least(floor((CAST({col} AS DOUBLE) - s.lo)
                              / ((s.hi - s.lo) / {bins})),
                        {bins - 1}) AS BIGINT) AS bin,
             CAST(count(*) AS DOUBLE) AS cnt
      FROM {table}, stats s
      GROUP BY 1
    ),
    cum AS (
      SELECT bin, cnt,
             sum(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum
      FROM binned
    )
    SELECT q.q,
           round(s.lo + (c.bin + (q.q * s.n - (c.cum - c.cnt)) / c.cnt)
                        * ((s.hi - s.lo) / {bins}), 4) AS est
    FROM (VALUES {q_values}) q(q), stats s
    JOIN cum c ON c.cum >= q.q * s.n AND c.cum - c.cnt < q.q * s.n
    """
