"""Iceberg catalog gate (S10/S12 production sinks).

The production deployment stores transcripts, stats, postings and
result caches as Iceberg tables (bucketed by term hash for partition
pruning, snapshot-per-build for resumability). The Iceberg runtime
jars are not in this container, so every call degrades to the
parquet-segment layout of ``operators/postings.py:write_index`` when
the catalog is unavailable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_CONF = {
    # spark-submit --conf equivalents for a real cluster:
    "spark.sql.extensions": (
        "org.apache.iceberg.spark.extensions"
        ".IcebergSparkSessionExtensions"
    ),
    "spark.sql.catalog.eqx": "org.apache.iceberg.spark.SparkCatalog",
    "spark.sql.catalog.eqx.type": "hadoop",
}


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def write_table(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    fallback_path: str,
    bucket_col: str | None = None,
    buckets: int = 64,
) -> str:
    """Write ``df`` as an Iceberg table (bucketed when ``bucket_col``
    given) or as parquet under ``fallback_path``. Returns the sink
    identifier actually used."""
    if iceberg_available(spark):
        writer = df.writeTo(f"eqx.{name}").using("iceberg")
        if bucket_col is not None:
            from pyspark.sql.functions import bucket, col

            writer = writer.partitionedBy(bucket(buckets, col(bucket_col)))
        writer.createOrReplace()
        return f"eqx.{name}"
    df.write.mode("overwrite").parquet(f"{fallback_path}/{name}")
    return f"{fallback_path}/{name}"


def read_table(spark: SparkSession, identifier: str) -> DataFrame:
    if identifier.startswith("eqx."):
        return spark.read.table(identifier)
    return spark.read.parquet(identifier)
