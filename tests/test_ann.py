"""IVF ANN (ann.py): deterministic coarse quantizer, exhaustive-probe
exactness vs brute force, recall behavior on separated clusters, and the
partition-pruned probe plan shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from blacklab_spark import ann


@pytest.fixture(scope="module")
def clustered(spark):
    """60 vectors in 3 well-separated clusters (20 each), dim 8.
    vec_id // 20 = true cluster."""
    rng = np.random.default_rng(7)
    centers = np.array(
        [[10.0] * 8, [-10.0] * 8, [10.0, -10.0] * 4], dtype=np.float64
    )
    rows = []
    for i in range(60):
        v = centers[i // 20] + rng.normal(0, 0.5, 8)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def brute_topk(spark, emb, qid, topk):
    e = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    qv = e.filter(F.col("vec_id") == qid).select(F.col("v").alias("qv"))
    j = e.crossJoin(F.broadcast(qv)).filter(F.col("vec_id") != qid)
    dot = F.aggregate(F.zip_with("v", "qv", lambda a, b: a * b), F.lit(0.0), lambda s, x: s + x)
    nv = F.aggregate(F.transform("v", lambda a: a * a), F.lit(0.0), lambda s, x: s + x)
    nq = F.aggregate(F.transform("qv", lambda a: a * a), F.lit(0.0), lambda s, x: s + x)
    return (
        j.select("vec_id", F.round(dot / F.sqrt(nv * nq), 6).alias("cos"))
        .orderBy(F.col("cos").desc(), "vec_id")
        .limit(topk)
        .collect()
    )


def test_train_deterministic(spark, clustered):
    c1 = sorted(map(tuple, ((r["cell"], tuple(r["c"])) for r in ann.train_ivf(clustered, k=4).collect())))
    c2 = sorted(map(tuple, ((r["cell"], tuple(r["c"])) for r in ann.train_ivf(clustered, k=4).collect())))
    assert c1 == c2


def test_assignments_cover_all_vectors(spark, clustered):
    cents, assign = ann.build_ivf(clustered, k=4, n_iter=2)
    rows = assign.collect()
    assert len(rows) == 60 and len({r["vec_id"] for r in rows}) == 60
    cells = {r["cell"] for r in cents.collect()}
    assert all(r["cell"] in cells for r in rows)


def test_exhaustive_probe_equals_brute_force(spark, clustered):
    K = 5
    cents, assign = ann.build_ivf(clustered, k=K, n_iter=2)
    got = ann.ivf_search(clustered, cents, assign, query_vec_id=3, nprobe=K, topk=10).collect()
    want = brute_topk(spark, clustered, 3, 10)
    assert [(r["vec_id"], r["cos"]) for r in got] == [
        (r["vec_id"], r["cos"]) for r in want
    ]
    assert [r["rank"] for r in got] == list(range(1, 11))


def test_separated_clusters_nprobe1_perfect_recall(spark, clustered):
    """With clusters far apart and k = 3 true clusters, probing ONE cell
    already returns the true top-k: all near neighbors share the query's
    cluster, and k-means recovers the separated clusters."""
    cents, assign = ann.build_ivf(clustered, k=3, n_iter=3)
    got = ann.ivf_search(clustered, cents, assign, query_vec_id=5, nprobe=1, topk=10).collect()
    want = brute_topk(spark, clustered, 5, 10)
    assert {r["vec_id"] for r in got} == {r["vec_id"] for r in want}
    # and every candidate came from the query's true cluster
    assert all(r["vec_id"] // 20 == 0 for r in got)


def test_nprobe_recall_monotone(spark, clustered):
    """Recall@10 may only grow as nprobe grows (a superset of cells is
    probed), reaching 1.0 at nprobe=K."""
    K = 6
    cents, assign = ann.build_ivf(clustered, k=K, n_iter=2)
    want = {r["vec_id"] for r in brute_topk(spark, clustered, 42, 10)}
    last = -1.0
    for nprobe in (1, 3, K):
        got = {
            r["vec_id"]
            for r in ann.ivf_search(
                clustered, cents, assign, query_vec_id=42, nprobe=nprobe, topk=10
            ).collect()
        }
        rec = len(got & want) / len(want)
        assert rec >= last
        last = rec
    assert last == 1.0


def test_probe_plan_no_cartesian_on_assignments(spark, clustered):
    """The candidate fetch must be a (broadcastable) semi-join on cell —
    never a cartesian/BNLJ against the assignments table."""
    cents, assign = ann.build_ivf(clustered, k=4, n_iter=1)
    import re as _re

    plan = ann.ivf_search(
        clustered, cents, assign, query_vec_id=0, nprobe=2, topk=5
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the only nested-loop joins allowed are the deliberate 1-row broadcasts
    # (query vector / probed cells); candidates vs assignments must join on
    # cell (LeftSemi), never loop
    for m in _re.finditer(r"BroadcastNestedLoopJoin[^\n]*", plan):
        assert "Cross" in m.group(0)
    assert "LeftSemi" in plan
