"""SparkSession factory tuned for this engine.

Local mode is a stand-in for a multi-executor cluster: every knob set
here (AQE, skew-join handling, shuffle partition count, Arrow batch
size) is the one we would ship in ``spark-submit --conf`` form on a
1000-executor cluster; nothing relies on single-JVM behavior.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def ship_package(spark: SparkSession) -> None:
    """Make this package importable on executors.

    The production deployment is ``spark-submit --py-files eqx.zip``;
    this is the programmatic equivalent (zip the package, addPyFile)
    so UDFs deserialize on executor Python workers regardless of the
    driver's cwd.
    """
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    # unique per process so a stale zip never shadows edited code
    zip_path = os.path.join(
        tempfile.gettempdir(),
        f"efficient_query_expansion_spark-{os.getpid()}.zip",
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fname in files:
                    if not fname.endswith(".py"):
                        continue
                    full = os.path.join(root, fname)
                    rel = os.path.join(
                        "efficient_query_expansion_spark",
                        os.path.relpath(full, pkg_dir),
                    )
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zip_path)


def get_spark(
    app_name: str = "efficient_query_expansion_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) or
    ``local[*]``. Shuffle partitions default to the core count: at
    cluster scale this would instead be sized so that each shuffle
    partition holds ~128-256MB (AQE coalescing then trims small ones).
    """
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or None
    master = f"local[{cores}]" if cores else "local[*]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or cores or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # AQE: runtime coalescing + skew-join splitting. The hot-term
        # skew in posting-list construction is additionally handled by
        # explicit salting (operators/postings.py); AQE covers joins.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # UTC everywhere so DuckDB-oracle timestamp comparison is exact.
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for every pandas_udf / applyInPandas / createDataFrame.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ship_package(spark)
    return spark
