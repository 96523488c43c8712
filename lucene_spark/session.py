"""SparkSession factory with scale-appropriate defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def make_pyfiles_zip(out_dir: str | None = None) -> str:
    """Zip the lucene_spark package for ``spark-submit --py-files`` /
    ``sparkContext.addPyFile`` shipment to executors."""
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    out = os.path.join(out_dir or "/tmp", "lucene_spark_pyfiles.zip")
    with zipfile.ZipFile(out, "w") as z:
        for dirpath, _dirnames, filenames in os.walk(pkg_dir):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, root))
    return out


def get_spark(app_name: str = "lucene_spark", cores: int | None = None) -> SparkSession:
    """Create (or reuse) a SparkSession.

    ``cores`` pins ``local[N]`` for the two-parallelism scaling runs
    (sandbox proxy for N vs 4N executors); default honours
    ``$SPARK_GRAFT_CPUS`` then ``local[*]``.
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
    else:
        master = f"local[{cores}]"
    shuffle = max(8, int(cores or os.cpu_count() or 8))
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
    )
    # make the package importable on python workers regardless of the
    # driver's cwd: PYTHONPATH must be set BEFORE the JVM forks workers
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prev = os.environ.get("PYTHONPATH", "")
    if root not in prev.split(os.pathsep):
        os.environ["PYTHONPATH"] = root + (os.pathsep + prev if prev else "")
    spark = builder.getOrCreate()
    # belt and braces for an already-running JVM: ship the package zip
    # (the spark-submit --py-files equivalent)
    try:
        spark.sparkContext.addPyFile(make_pyfiles_zip())
    except Exception:
        pass  # already added in this context
    return spark
