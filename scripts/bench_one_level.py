"""One parallelism level of the scaling bench: build + query over a fixed
pages parquet, print one JSON line. Invoked by scripts/bench_scaling.py as a
subprocess so each level gets a fresh JVM (clean analog of a separate cluster).

usage: python scripts/bench_one_level.py <cpus> <pages_parquet> <work_dir>
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from blacklab_spark.session import get_spark  # noqa: E402

N_SHARDS = 128          # fixed across levels: the JOB is identical, only
SHUFFLE_PARTITIONS = 128  # executor-thread count varies (N vs 4N executors).
# 128 shards, not 32: small whole-shard kernels (~1M tokens) keep concurrent
# worker memory pressure low — 32 fat shards measured 2x ANTI-scaling at
# local[32] (blocks stage 98s vs 11s at 128 shards, same input)

QUERY_SET = [
    ("topk_single_head", lambda ix: ix.topk(["the"], k=10)),
    ("topk_single_tail", lambda ix: ix.topk(["w04921"], k=10)),
    ("topk_multi", lambda ix: ix.topk(["the", "click", "w00100"], k=10)),
    ("phrase", lambda ix: ix.phrase_hits(["click", "here"])),
    ("near", lambda ix: ix.near_hits("terms", "service", 0, 3)),
    ("or_hits", lambda ix: ix.or_hits(["click", "w00050"])),
    ("and_docs", lambda ix: ix.and_docs(["click", "the"])),
]


def probe_speed() -> float:
    """Single-threaded memory-subsystem probe. The sandbox host has
    intermittent phases where memory-heavy ops run 10-80x slow (argsort of
    7M int64 measured 0.03s vs 4.4s minutes apart); benchmarking inside a
    slow phase inverts the scaling ratio."""
    import numpy as np

    c = np.arange(7_000_000, dtype=np.int64)[::-1].copy()
    t0 = time.time()
    np.argsort(c, kind="stable")
    return time.time() - t0


def wait_for_quiet(limit_s: float = 0.3, max_wait: int = 600) -> list[float]:
    probes = [probe_speed()]
    waited = 0
    while probes[-1] > limit_s and waited < max_wait:
        time.sleep(30)
        waited += 30
        probes.append(probe_speed())
    return probes


def main() -> None:
    cpus, pages_path, work_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    spark = get_spark(
        f"local[{cpus}]",
        app_name=f"blacklab_scale_{cpus}",
        shuffle_partitions=SHUFFLE_PARTITIONS,
        # tmpfs shuffle dir: the sandbox virtio disk has 2x run-to-run jitter,
        # which would swamp the CPU-scaling signal this bench measures
        extra_conf={
            "spark.local.dir": f"{work_dir}/spark_local",
            # 32 threads sharing the default 8g heap GC-throttle the Arrow/
            # shuffle path (~11% measured); same heap at both levels
            "spark.driver.memory": "32g",
        },
    )
    from blacklab_spark.build import build_index
    from blacklab_spark.query import Index

    pages = spark.read.parquet(pages_path)
    n_docs = pages.count()
    # warm the JVM/scheduler so startup cost is excluded from the measurement
    pages.limit(100).count()

    # best-of-3 with a host-speed gate per rep: first run includes
    # codegen/JIT warmup; min is the steady-state number a long-running
    # cluster job would see, and the gate keeps reps out of the sandbox
    # host's intermittent slow phases
    out = f"{work_dir}/ix_{cpus}"
    reps: list[tuple[float, bool, dict]] = []
    all_probes = []
    for _ in range(4):
        pre = wait_for_quiet(limit_s=0.06)
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        meta = build_index(spark, pages, out, n_shards=N_SHARDS)
        dt = time.time() - t0
        post = probe_speed()  # discard reps contaminated by a mid-run slow phase
        reps.append((dt, post < 0.1, meta["stage_s"]))
        all_probes.append(pre + [post])
        if sum(1 for _, ok, _s in reps if ok) >= 2:
            break
    valid = [(t, s) for t, ok, s in reps if ok]
    if not valid:
        valid = [(t, s) for t, _ok, s in reps]
    build_s, stage_s = min(valid, key=lambda v: v[0])

    ix = Index(spark, out)
    lat = {}
    for _ in range(2):
        wait_for_quiet()
        for name, fn in QUERY_SET:
            t0 = time.time()
            fn(ix).count()
            lat[name] = min(lat.get(name, float("inf")), round(time.time() - t0, 3))
    vals = sorted(lat.values())
    print(
        json.dumps(
            {
                "cpus": int(cpus),
                "n_docs": n_docs,
                "build_s": round(build_s, 2),
                "docs_per_sec": round(n_docs / build_s, 1),
                "query_lat": lat,
                "query_p50": vals[len(vals) // 2],
                "query_p95": vals[min(len(vals) - 1, int(0.95 * len(vals)))],
                "n_shards": N_SHARDS,
                "shuffle_partitions": SHUFFLE_PARTITIONS,
                "speed_probes_s": [round(p[-1], 3) for p in all_probes],
                "stage_s": stage_s,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
