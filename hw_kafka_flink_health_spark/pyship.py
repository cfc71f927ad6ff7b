"""Ship this package to executor Python workers.

Pure-expression queries never need Python on the executors, but the
pandas-UDF path (mapInPandas feature extraction) pickles functions that
live in this package — workers must be able to import it regardless of
the driver process's cwd/sys.path. Zipping the package and addPyFile-ing
it is the standard, cluster-safe way (works identically on local mode
and a 1000-executor deployment).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[int] = set()


def ship_package(spark: SparkSession) -> None:
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    import hw_kafka_flink_health_spark as pkg

    pkg_dir = os.path.dirname(os.path.abspath(pkg.__file__))
    zpath = os.path.join(
        tempfile.gettempdir(), f"hw_kafka_flink_health_spark-{os.getpid()}.zip"
    )
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.join(
                        "hw_kafka_flink_health_spark", os.path.relpath(full, pkg_dir)
                    )
                    z.write(full, rel)
    sc.addPyFile(zpath)
    _SHIPPED.add(key)
