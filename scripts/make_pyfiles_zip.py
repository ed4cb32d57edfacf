"""Package the engine for spark-submit --py-files (north rule: launched
via spark-submit --py-files on a multi-executor cluster).

    python scripts/make_pyfiles_zip.py [out.zip]
    spark-submit --py-files blacklab_spark.zip your_job.py

Pure-python package: the zip is the entire deployment artifact; executors
need only pyspark's own runtime + numpy/pandas/pyarrow (standard on any
Spark image)."""

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, "blacklab_spark.zip")

with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
    pkg = os.path.join(REPO, "blacklab_spark")
    for root, dirs, files in os.walk(pkg):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for fn in sorted(files):
            if fn.endswith(".py"):
                p = os.path.join(root, fn)
                z.write(p, os.path.relpath(p, REPO))
print(OUT, os.path.getsize(OUT), "bytes")
