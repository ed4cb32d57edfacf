"""Does Spark's python-worker path itself thread-scale on this box?

Runs synthetic workloads through mapInPandas at one parallelism level:
- cpu:   pure-python busy loop (no memory traffic)
- numpy: memory-streaming numpy work (bandwidth-bound)
- arrow: ship a wide string column JVM->Python and back (transfer-bound)

usage: python scripts/profile_sparkinfra.py <cpus>
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from blacklab_spark.session import get_spark  # noqa: E402

CPUS = sys.argv[1] if len(sys.argv) > 1 else "32"


def _cpu_kernel(batches):
    import pandas as pd

    for pdf in batches:
        t0 = time.time()
        x = 0
        while time.time() - t0 < 0.4:
            x += sum(range(10000))
        yield pd.DataFrame({"r": [x]})


def _numpy_kernel(batches):
    import numpy as np
    import pandas as pd

    for pdf in batches:
        a = np.arange(12_000_000, dtype=np.int64)
        s = 0
        for _ in range(6):
            b = a.copy()  # ~96MB rw per iter
            s += int(b[-1])
        yield pd.DataFrame({"r": [s]})


def _sort_kernel(batches):
    import numpy as np
    import pandas as pd

    rng = None
    for pdf in batches:
        rng = np.random.default_rng(0)
        k = rng.integers(0, 1 << 30, size=6_000_000).astype(np.int32)
        o = np.argsort(k, kind="stable")
        yield pd.DataFrame({"r": [int(o[0])]})


def main() -> None:
    spark = get_spark(
        f"local[{CPUS}]", app_name=f"infra_{CPUS}", shuffle_partitions=128,
        extra_conf={"spark.driver.memory": "32g"},
    )
    df = spark.range(0, 128, 1, numPartitions=128)
    res = {}
    for name, kern in (("cpu", _cpu_kernel), ("numpy", _numpy_kernel), ("sort", _sort_kernel)):
        best = None
        for _ in range(2):
            t0 = time.time()
            df.mapInPandas(kern, schema="r long").count()
            w = time.time() - t0
            best = w if best is None else min(best, w)
        res[name] = round(best, 2)
    print(json.dumps({"cpus": CPUS, **res}))
    spark.stop()


if __name__ == "__main__":
    main()
