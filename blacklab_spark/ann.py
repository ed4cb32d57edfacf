"""IVF (inverted-file) approximate-nearest-neighbor over an embedding column.

The coarse-quantizer scale path that complements the hyperplane-LSH variants
(entry_queries sim_ann_lsh / sim_ann_multiprobe): K centroids partition the
vectors into cells; a query probes only the `nprobe` nearest cells and exact
cosine rescoring runs over those candidates alone. The public design is
IVF-Flat (Johnson et al., "Billion-scale similarity search with GPUs";
Jegou et al., "Product quantization for nearest neighbor search" — design
only, no code derived), re-expressed as DataFrame ops:

- training (Lloyd iterations) is assign + re-average — a broadcast join over
  K tiny centroid rows plus one posexplode/groupBy mean per iteration, never
  a driver-side loop over vectors;
- the assignments table carries (vec_id, cell); at cluster scale it is
  written `partitionBy("cell")` so a probe becomes a partition-pruned scan +
  equi-join (the on-disk inverted-file layout) — `ivf_search` itself only
  ever touches the probed cells' rows;
- centroid count K follows sqrt(N) (the standard IVF sizing), so the
  broadcast stays tiny even at 10^9 vectors (K ~ 3*10^4 rows).

Everything is deterministic: centroid init takes the K smallest vec_ids,
ties in assignment break on cell id, so train/search reproduce bit-exactly —
the property the oracle entry (sim_ann_ivf, nprobe=K == exhaustive ==
brute-force top-k) verifies end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _sqdist(a, b):
    """Elementwise squared L2 between two array<double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _cosine(a, b):
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x)
    nb = F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, x: s + x)
    return dot / F.sqrt(na * nb)


def _as_double(df: DataFrame, vec_col: str) -> DataFrame:
    return df.select(
        "vec_id", F.transform(vec_col, lambda x: x.cast("double")).alias("v")
    )


def assign_cells(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, cell): nearest centroid per vector. One broadcast join over
    the K centroid rows + a min_by aggregate — no window, no shuffle of the
    vector payload beyond the hash agg on vec_id."""
    j = emb.crossJoin(F.broadcast(centroids))
    d = j.select(
        "vec_id",
        "cell",
        _sqdist(F.col("v"), F.col("c")).alias("dist"),
    )
    # deterministic argmin: distance ties break on cell id
    return d.groupBy("vec_id").agg(
        F.min_by("cell", F.struct("dist", "cell")).alias("cell")
    )


def _init_centroids(e: DataFrame, k: int) -> DataFrame:
    """Deterministic spread init: one TakeOrdered job pulls a hash-ordered
    candidate sample (32*K rows, bounded), then greedy farthest-point
    selection runs driver-side in numpy over that sample. Naive first-K-ids
    init collapses when the smallest ids share a cluster; per-step
    distributed farthest-point would cost K jobs — this is one job and still
    spreads the seeds across clusters, deterministically (hash order + ties
    to the first index)."""
    import numpy as np

    cand = (
        e.orderBy(F.xxhash64(F.col("vec_id")), "vec_id")
        .limit(max(32 * k, k))
        .collect()
    )
    X = np.array([r["v"] for r in cand], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in cand])
    sel = [int(np.argmin(ids))]
    d = ((X - X[sel[0]]) ** 2).sum(axis=1)
    for _ in range(min(k, len(cand)) - 1):
        nxt = int(np.argmax(d))  # ties -> first index: deterministic
        sel.append(nxt)
        d = np.minimum(d, ((X - X[nxt]) ** 2).sum(axis=1))
    return e.sparkSession.createDataFrame(
        [(i, [float(x) for x in X[s]]) for i, s in enumerate(sel)],
        "cell int, c array<double>",
    )


def train_ivf(
    emb: DataFrame, vec_col: str = "embedding", k: int = 16, n_iter: int = 2
) -> DataFrame:
    """Deterministic k-means coarse quantizer -> (cell int, c array<double>).

    Init = deterministic farthest-point over a hash-ordered candidate sample
    (_init_centroids); each Lloyd iteration is assign (broadcast argmin) +
    re-average (posexplode -> per-(cell, dim) mean -> re-assembled arrays).
    A cell that loses all members is dropped (K shrinks), matching standard
    k-means behavior."""
    e = _as_double(emb, vec_col)
    spark = emb.sparkSession
    centroids = _init_centroids(e, k)

    def _materialize(c: DataFrame) -> DataFrame:
        # truncate lineage each iteration: without this the plan embeds the
        # previous centroids' full lineage twice per Lloyd step (exponential
        # plan depth in n_iter). The collect is K rows — sqrt(N)-bounded by
        # design (~15 MB at 10^9 vectors), never the data.
        rows = [(int(r["cell"]), list(r["c"])) for r in c.collect()]
        return spark.createDataFrame(rows, "cell int, c array<double>")

    centroids = _materialize(centroids)
    for _ in range(max(0, n_iter)):
        assigned = assign_cells(e, centroids).join(e, "vec_id")
        centroids = _materialize(
            assigned.select("cell", F.posexplode("v").alias("i", "x"))
            .groupBy("cell", "i")
            .agg(F.avg("x").alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "m"))),
                    lambda s: s["m"],
                ).alias("c")
            )
        )
    return centroids


def build_ivf(
    emb: DataFrame, vec_col: str = "embedding", k: int = 16, n_iter: int = 2
) -> tuple[DataFrame, DataFrame]:
    """(centroids, assignments). At scale, persist both:
    `assignments.write.partitionBy("cell")` gives the partition-pruned
    inverted-file layout; centroids are K rows (broadcast side)."""
    e = _as_double(emb, vec_col)
    centroids = train_ivf(emb, vec_col, k=k, n_iter=n_iter)
    return centroids, assign_cells(e, centroids)


def ivf_search(
    emb: DataFrame,
    centroids: DataFrame,
    assignments: DataFrame,
    query_vec_id: int,
    nprobe: int = 2,
    topk: int = 10,
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors of `query_vec_id`, probing the nprobe nearest
    cells only. Plan shape: tiny probed-cell frame (nprobe rows) broadcasts
    into a semi-join against the assignments table (partition-pruned when the
    table is stored partitionBy(cell)); exact rescoring touches candidate
    rows only. nprobe == K degenerates to exhaustive search == brute force —
    the exactness anchor the oracle checks."""
    e = _as_double(emb, vec_col)
    qv = e.filter(F.col("vec_id") == query_vec_id).select(F.col("v").alias("qv"))
    probed = (
        centroids.crossJoin(F.broadcast(qv))
        .select("cell", _sqdist(F.col("c"), F.col("qv")).alias("dist"))
        .orderBy("dist", "cell")
        .limit(nprobe)
        .select("cell")
    )
    cand = assignments.join(F.broadcast(probed), "cell", "left_semi").filter(
        F.col("vec_id") != query_vec_id
    )
    scored = (
        cand.join(e, "vec_id")
        .crossJoin(F.broadcast(qv))
        .select("vec_id", F.round(_cosine(F.col("v"), F.col("qv")), 6).alias("cos"))
    )
    from .rank import rank_head

    return rank_head(
        scored, [("cos", False), ("vec_id", True)], 0, topk, "rank"
    ).select(F.col("rank").cast("int"), "vec_id", "cos")
