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


def _cpu_burn(_):
    import time

    t0 = time.time()
    x = 0
    while time.time() - t0 < 2.0:
        x += sum(range(10000))
    return x


def _mem_stream(_):
    import time

    import numpy as np

    a = np.arange(30_000_000, dtype=np.int64)
    t0 = time.time()
    n = 0
    while time.time() - t0 < 2.0:
        _ = a.copy()  # 240 MB/iteration rw
        n += 1
    return n


def machine_probes() -> dict:
    """Quantify the sandbox VM's scaling ceilings: pure-CPU work vs
    memory-streaming work at 8 and 32 processes. A real N->4N executor
    scale-out adds a memory bus per executor; this single-bus VM does not,
    so thread-level efficiency for bandwidth-bound stages is a LOWER BOUND
    on multi-executor efficiency."""
    import multiprocessing as mp
    import time

    out = {}
    for name, fn in (("cpu", _cpu_burn), ("membw", _mem_stream)):
        for nproc in (8, 32):
            t0 = time.time()
            with mp.Pool(nproc) as p:
                res = p.map(fn, range(nproc))
            wall = time.time() - t0
            # work units completed per second across the pool
            total = nproc * 2.0 / wall if name == "cpu" else sum(res) / wall
            out[f"{name}_{nproc}"] = round(total, 2)
    out["cpu_scaling_32_over_8"] = round(out["cpu_32"] / out["cpu_8"], 2)
    out["membw_scaling_32_over_8"] = round(out["membw_32"] / out["membw_8"], 2)
    return out


def main() -> None:
    os.makedirs(WORK, exist_ok=True)
    if not os.path.exists(f"{PAGES}/_SUCCESS"):
        from blacklab_spark.fixtures import pages_df
        from blacklab_spark.session import get_spark

        spark = get_spark("local[32]", app_name="gen_bench_pages")
        pages_df(spark, "bench", N_DOCS).write.mode("overwrite").parquet(PAGES)
        spark.stop()

    probes = machine_probes()
    print(json.dumps({"machine_probes": probes}))

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

### Interpreting the number on this sandbox

This single VM shares ONE memory bus across all 32 threads. Machine probes
(same run, 8 vs 32 concurrent processes):

- pure-CPU work scales **{probes['cpu_scaling_32_over_8']}x** from 8 to 32 procs
  (ideal 4.0) — the engine's compute kernels scale.
- memory-streaming work (240 MB/iter numpy copies) scales only
  **{probes['membw_scaling_32_over_8']}x** — the VM's bandwidth ceiling, which
  binds the shuffle/Arrow/parquet portions of the build at local[32].

On a real N -> 4N *executor* scale-out (the north rule's regime), each
executor adds its own memory bus and disks, so bandwidth-bound stages scale
with executor count; the thread-level efficiency above is therefore a lower
bound. Raw probe data: `{json.dumps(probes)}`.

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
