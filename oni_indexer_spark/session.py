"""SparkSession factory used by tests, bench, and the driver contract."""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_shipped: set[int] = set()


def ship_package(spark: SparkSession) -> None:
    """Make ``oni_indexer_spark`` importable on executors.

    The engine's Arrow UDFs (tokenize, varint encode/decode) are module
    functions, so cloudpickle serializes them by reference — workers must
    be able to ``import oni_indexer_spark``. This is the programmatic
    equivalent of ``spark-submit --py-files oni_indexer_spark.zip``
    (north_rule), and makes the package work from any cwd and with a
    SparkSession the caller built themselves (e.g. the grading driver).
    """
    key = id(spark.sparkContext)
    if key in _shipped:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    zpath = os.path.join(tempfile.gettempdir(), "oni_indexer_spark_pkg.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        for dirpath, _, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    zf.write(full, os.path.relpath(full, root))
    spark.sparkContext.addPyFile(zpath)
    _shipped.add(key)


def get_spark(
    master: str | None = None,
    app_name: str = "oni-indexer-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build a local SparkSession with the engine's standard config.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    AQE is on: it coalesces the small shuffles the query path produces and
    splits skewed partitions at runtime; the index build additionally
    handles hot-term skew explicitly (see index/build.py).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else cpus
        shuffle_partitions = 32 if n == "*" else max(8, int(n))
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    ship_package(spark)
    return spark
