"""SparkSession factory with scale-appropriate defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def make_pyfiles_zip(out_dir: str | None = None) -> str:
    """Zip the lucene_spark package for ``spark-submit --py-files`` /
    ``sparkContext.addPyFile`` shipment to executors.

    The archive is deterministic (fixed entry timestamps, sorted walk)
    and written to a CONTENT-ADDRESSED path: Spark compares a fetched
    --py-files artifact byte-for-byte against its cached copy, so a
    fixed path that gets rewritten while a job referencing it is still
    running fails the fetch with "exists and does not match contents".
    A name keyed by the package hash never mutates under a live job.
    """
    import hashlib
    import io
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for dirpath, dirnames, filenames in sorted(os.walk(pkg_dir)):
            dirnames.sort()
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    info = zipfile.ZipInfo(os.path.relpath(full, root))
                    info.date_time = (1980, 1, 1, 0, 0, 0)
                    with open(full, "rb") as fh:
                        z.writestr(info, fh.read())
    data = buf.getvalue()
    tag = hashlib.sha256(data).hexdigest()[:12]
    out = os.path.join(out_dir or "/tmp", f"lucene_spark_pyfiles_{tag}.zip")
    if not os.path.exists(out):
        tmp = f"{out}.tmp.{os.getpid()}"
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.replace(tmp, out)
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
