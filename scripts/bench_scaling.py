"""Two-parallelism-level scaling bench -> BENCH/BASELINE.md.

Stands in for the north rule's "N vs 4N executors" criterion (no real cluster
in this sandbox, see BASELINE.md §3): the SAME build+query job (same input
parquet, same n_shards, same shuffle partitions) runs at local[8] and
local[32]; efficiency = docs_per_sec_32 / (4 * docs_per_sec_8), target >= 0.8.

usage: python scripts/bench_scaling.py [n_docs]
"""

from __future__ import annotations

import datetime as dt
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
# tmpfs: isolate the CPU-scaling measurement from virtio disk jitter
WORK = "/dev/shm/blacklab_scaling" if os.path.isdir("/dev/shm") else "/tmp/blacklab_scaling"
PAGES = f"{WORK}/pages_bench"


def main() -> None:
    os.makedirs(WORK, exist_ok=True)
    if not os.path.exists(f"{PAGES}/_SUCCESS"):
        from blacklab_spark.fixtures import pages_df
        from blacklab_spark.session import get_spark

        spark = get_spark("local[32]", app_name="gen_bench_pages")
        pages_df(spark, "bench", N_DOCS).write.mode("overwrite").parquet(PAGES)
        spark.stop()

    results = {}
    for cpus in ("8", "32"):
        out = subprocess.run(
            [sys.executable, str(REPO / "scripts/bench_one_level.py"), cpus, PAGES, WORK],
            capture_output=True, text=True, check=True,
        )
        line = out.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
        print(line)

    r8, r32 = results["8"], results["32"]
    eff = r32["docs_per_sec"] / (4 * r8["docs_per_sec"])
    ts = dt.datetime.now(dt.timezone.utc).isoformat(timespec="seconds")

    os.makedirs(REPO / "BENCH", exist_ok=True)
    md = f"""# BENCH/BASELINE — scaling-efficiency evidence

North-rule criterion: throughput scaling efficiency >= 0.8 between N and 4N
executors. Sandbox protocol (BASELINE.md §3): identical build+query job on the
same {r8['n_docs']:,}-doc synthetic pages corpus (FIXTURES.md tier C, seed=42)
at two parallelism levels, fresh JVM each. Job config fixed across levels:
n_shards={r8['n_shards']}, spark.sql.shuffle.partitions={r8['shuffle_partitions']},
AQE on, Arrow on, zstd parquet.

Run: {ts}

| level | build wall (s) | indexed docs/sec | query p50 (s) | query p95 (s) |
|---|---|---|---|---|
| local[8]  (N)  | {r8['build_s']} | {r8['docs_per_sec']:,} | {r8['query_p50']} | {r8['query_p95']} |
| local[32] (4N) | {r32['build_s']} | {r32['docs_per_sec']:,} | {r32['query_p50']} | {r32['query_p95']} |

**Scaling efficiency = {r32['docs_per_sec']:,} / (4 x {r8['docs_per_sec']:,}) =
{eff:.3f}** (target >= 0.8: {"PASS" if eff >= 0.8 else "MISS"})

Per-query latency (s):

| query | local[8] | local[32] |
|---|---|---|
""" + "\n".join(
        f"| {q} | {r8['query_lat'][q]} | {r32['query_lat'][q]} |" for q in r8["query_lat"]
    ) + f"""

Raw JSON:

```json
{json.dumps(results, indent=2)}
```
"""
    (REPO / "BENCH/BASELINE.md").write_text(md)
    print(f"efficiency={eff:.3f} -> BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
