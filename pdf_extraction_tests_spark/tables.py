"""Table persistence abstraction: Iceberg when available, Parquet otherwise.

The engine targets Iceberg tables (north rule).  The sandbox image has no
``iceberg-spark-runtime`` jar, so writes fall back to partitioned Parquet
directories behind the same three-call interface; swapping in Iceberg on a
real cluster is a config change (catalog + ``USE_ICEBERG=1``), not a code
change.  Replaces the reference's per-document ``.RData`` side-effect files
(Document_Processor_DocLayout_YOLO_Code_v10.R:194-207, 738-739).

When the table-format PROPERTIES matter (atomic commit, snapshot
isolation, time travel, optimistic concurrency, expiry), use
:mod:`.snapshots` — Iceberg-style manifest snapshots over the same
parquet fallback, tested in tests/test_snapshots.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    if os.environ.get("USE_ICEBERG") != "1":
        return False
    try:
        spark._jvm.org.apache.iceberg.spark.SparkCatalog  # noqa: SLF001
        return True
    except Exception:
        return False


def write_table(df: DataFrame, location: str, mode: str = "append",
                partition_by: list[str] | None = None) -> None:
    """Append/overwrite a table.  ``location`` is a path (parquet fallback)
    or a catalog identifier (iceberg)."""
    spark = df.sparkSession
    if iceberg_available(spark):
        writer = df.writeTo(location)
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(location)


def read_table(spark: SparkSession, location: str, schema=None) -> DataFrame | None:
    """Read a table; None if it does not exist yet (first run)."""
    if iceberg_available(spark):
        try:
            return spark.read.table(location)
        except Exception:
            return None
    try:
        r = spark.read
        if schema is not None:
            r = r.schema(schema)
        return r.parquet(location)
    except Exception:
        return None


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int = 16,
                   sort: bool = True) -> None:
    """Materialize a table BUCKETED (and sorted) by the join key — the
    co-located-join layout: two tables bucketed the same way join with NO
    exchange (and no sort when ``sort=True``) on any cluster size whose
    ``spark.sql.shuffle.partitions`` the bucket count divides evenly.

    At 100 TB this is how the fact-fact joins (orders x lineitem, doc x
    spans-by-doc) avoid re-shuffling terabytes per query: pay the shuffle
    once at write time, amortize it over every downstream join.  Plan
    pinned in tests/test_plans.py::test_bucketed_join_no_shuffle.
    """
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)
