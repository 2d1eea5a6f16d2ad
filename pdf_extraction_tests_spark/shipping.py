"""Ship the package to Spark python workers.

On a real cluster the job is submitted as ``spark-submit --py-files
pipeline.zip job.py`` (north rule).  When the engine is embedded in an
externally-created SparkSession (the driver harness, notebooks), the UDF
closures are pickled *by reference* to this package, so executors must be
able to import it — :func:`ship_package` zips the package once per process
and registers it with ``sparkContext.addPyFile``.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_shipped: set[int] = set()


def ship_package(spark) -> None:
    sc = spark.sparkContext
    key = id(sc)
    if key in _shipped:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    zip_path = os.path.join(
        tempfile.gettempdir(), f"{pkg_name}-{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if not fn.endswith(".py"):
                        continue
                    full = os.path.join(root, fn)
                    rel = os.path.join(pkg_name, os.path.relpath(full, pkg_dir))
                    zf.write(full, rel)
    sc.addPyFile(zip_path)
    _shipped.add(key)
