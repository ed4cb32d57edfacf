"""Per-stage build profile at one parallelism level — where does the flat
(non-scaling) time go? Prints the build meta's stage_s dict as one JSON line.

usage: python scripts/profile_build.py <cpus> [n_docs] [n_shards]
(corpus parquet is generated once under /dev/shm and reused)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from blacklab_spark.session import get_spark  # noqa: E402

CPUS = sys.argv[1] if len(sys.argv) > 1 else "32"
N_DOCS = int(sys.argv[2]) if len(sys.argv) > 2 else 400_000
N_SHARDS = int(sys.argv[3]) if len(sys.argv) > 3 else 128
WORK = "/dev/shm/blacklab_profile"
PAGES = f"{WORK}/pages_{N_DOCS}"


def main() -> None:
    os.makedirs(WORK, exist_ok=True)
    if not os.path.exists(f"{PAGES}/_SUCCESS"):
        from blacklab_spark.fixtures import pages_df

        spark = get_spark("local[32]", app_name="gen_profile_pages")
        pages_df(spark, "bench", N_DOCS).write.mode("overwrite").parquet(PAGES)
        spark.stop()

    spark = get_spark(
        f"local[{CPUS}]",
        app_name=f"profile_{CPUS}",
        shuffle_partitions=128,
        extra_conf={
            "spark.local.dir": f"{WORK}/spark_local",
            "spark.driver.memory": "32g",
        },
    )
    from blacklab_spark.build import build_index

    pages = spark.read.parquet(PAGES)
    pages.limit(100).count()  # warm scheduler
    out = f"{WORK}/ix_prof_{CPUS}"
    best = None
    for rep in range(int(os.environ.get("PROFILE_REPS", "2"))):
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        meta = build_index(spark, pages, out, n_shards=N_SHARDS)
        wall = time.time() - t0
        if best is None or wall < best["wall_s"]:
            best = {"wall_s": round(wall, 2), "stage_s": meta["stage_s"]}
    print(json.dumps({"cpus": CPUS, "n_docs": N_DOCS, "n_shards": N_SHARDS, **best}))
    spark.stop()


if __name__ == "__main__":
    main()
