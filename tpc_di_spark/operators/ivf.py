"""IVF (inverted-file) approximate nearest neighbors.

The second scale path for embedding similarity next to hyperplane LSH
(`operators/similarity.py`): partition the corpus into ``nlist`` Voronoi
cells around centroids, search only the ``nprobe`` cells nearest the
query. Candidate fraction ~ nprobe/nlist with data-adaptive cells —
higher recall per candidate than LSH when the corpus is clustered.

Spark-first decomposition — every stage is a DataFrame op:

- **Assignment** (`ivf_assign`): broadcast the centroid table (nlist
  rows), exact-DECIMAL squared distance per (vector, centroid),
  ``row_number() == 1`` per vector. Deterministic and bit-identical
  across engines (ties break on centroid id) — the same discipline as
  the hyperplane buckets, so the search is SQL-oracle-checkable.
- **Search** (`ivf_topk`): queries keep their ``nprobe`` nearest cells,
  explode, join cell-to-cell against the inverted lists (a key-
  partitioned equi-join — never a cartesian), exact cosine + top-k.
- **Training** (`kmeans_fit`): Lloyd iterations driven from the driver;
  per-cluster component sums are exact DECIMAL aggregates (associative →
  partition-invariant), the division happens once per component in
  Python, and the next iteration's centroids ship as plan literals.
  State per iteration is nlist x dim numbers — driver-sized at any
  corpus scale; the heavy work (assignment + partial aggregation) stays
  distributed.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

_DEC = "decimal(38,12)"


def _centroid_df(spark, centroids: Sequence[Sequence[float]]) -> DataFrame:
    rows = [(i, [float(x) for x in c]) for i, c in enumerate(centroids)]
    return spark.createDataFrame(rows, "centroid_id int, centroid array<double>")


def _sq_dist(v, c):
    """Exact squared L2 distance: inputs quantized to DECIMAL(8,6), the
    difference/square/sum then pure decimal arithmetic — comparisons (and
    therefore argmin assignment) are engine- and partitioning-independent
    (same portability argument as similarity._dot, including the small
    exact accumulator that avoids Spark's precision-loss rounding)."""
    q = "decimal(8,6)"
    acc_t = "decimal(20,12)"

    def term(x, y):
        d = x.cast("double").cast(q) - y.cast("double").cast(q)
        return d * d

    d = F.zip_with(v, c, term)
    return F.aggregate(d, F.lit(0).cast(acc_t), lambda acc, t: (acc + t).cast(acc_t))


def ivf_assign(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: Sequence[Sequence[float]],
    keep_rank: int = 1,
) -> DataFrame:
    """Nearest-centroid assignment (``keep_rank=1``) or the ``keep_rank``
    nearest cells (the query-side nprobe expansion). Ties break on the
    lower centroid id."""
    from tpc_di_spark.operators.dedup import spread_small_input

    spark = emb.sparkSession
    cents = _centroid_df(spark, centroids)
    # Single-file corpora scan as ONE partition, serializing the nlist x
    # dim exact-DECIMAL distance work; spread is a no-op for inputs
    # already at the session's parallelism (see spread_small_input).
    emb = spread_small_input(emb, id_col)
    j = emb.crossJoin(F.broadcast(cents)).withColumn(
        "_dist", _sq_dist(F.col(vec_col), F.col("centroid"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_dist"), F.col("centroid_id"))
    return (
        j.withColumn("_rank", F.row_number().over(w))
        .filter(F.col("_rank") <= keep_rank)
        .select(F.col(id_col), F.col(vec_col), "centroid_id", F.col("_rank").alias("probe_rank"))
    )


def ivf_topk(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: Sequence[Sequence[float]],
    k: int = 5,
    nprobe: int = 4,
) -> DataFrame:
    """Approximate cosine top-k via inverted lists: candidates = vectors
    whose cell is one of the query's ``nprobe`` nearest cells."""
    from tpc_di_spark.operators.similarity import _dot, _norm

    # Norms projected ONCE per vector on each side — inside the cell join
    # they would be recomputed per candidate pair (3x the exact-decimal
    # work); same expression on the same vector, so cosines stay
    # bit-identical.
    # ONE assignment pass serves both sides: the inverted lists are
    # exactly the probe expansion's rank-1 rows (same window, same tie
    # break), so computing keep_rank=nprobe once and filtering is bit-
    # identical to two ivf_assign calls — and halves the corpus x nlist
    # exact-DECIMAL distance work, which dominates this operator.
    # Persisted because the cell join's two sides are independent
    # subtrees to Catalyst.
    from tpc_di_spark.operators.dedup import invocation_scoped

    assigned = invocation_scoped(
        ivf_assign(emb, id_col, vec_col, centroids, keep_rank=nprobe)
        .withColumn("_n", _norm(F.col(vec_col)))
    ).persist()
    lists = assigned.filter(F.col("probe_rank") == 1).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"),
        "centroid_id", F.col("_n").alias("_nc"),
    )
    probes = assigned.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"),
        "centroid_id", F.col("_n").alias("_nq"),
    )
    cands = probes.join(lists, ["centroid_id"]).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cands = cands.withColumn(
        "cosine",
        F.try_divide(
            _dot(F.col("qv"), F.col("cv")).cast("double"),
            F.col("_nq") * F.col("_nc"),
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def kmeans_fit(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    nlist: int,
    iters: int = 3,
    dim: int | None = None,
) -> list[list[float]]:
    """Deterministic Lloyd's k-means for IVF centroids.

    Init: a deterministic hash-sample — keep rows with
    ``pmod(xxhash64(id), 64) == 0`` (an id-distribution-independent ~1.6%
    subset), then the ``nlist`` smallest xxhash64 values within it. The
    order-by-limit compiles to TakeOrderedAndProject over the filtered
    scan (per-partition top-k + driver merge — no full sort, no shuffle),
    and the hash decorrelates the seeds from id assignment order. Falls
    back to the unfiltered corpus when the sample is smaller than
    ``nlist`` (tiny inputs). Each iteration: one distributed assignment +
    one exact-DECIMAL component-sum aggregation; the nlist x dim division
    runs in Python so no engine-specific decimal division semantics leak
    into the centroids. Empty cells keep their previous centroid."""
    h = F.xxhash64(F.col(id_col))
    base = emb.select(F.col(id_col), F.col(vec_col), h.alias("_h"))
    init = (
        base.filter(F.pmod(F.col("_h"), F.lit(64)) == 0)
        .orderBy("_h", id_col)
        .limit(nlist)
        .collect()
    )
    if len(init) < nlist:
        init = base.orderBy("_h", id_col).limit(nlist).collect()
    centroids = [[float(x) for x in r[1]] for r in init]
    dim = dim or len(centroids[0])
    for _ in range(iters):
        assigned = ivf_assign(emb, id_col, vec_col, centroids, keep_rank=1)
        parts = (
            assigned.select(
                "centroid_id", F.posexplode(F.col(vec_col)).alias("pos", "x")
            )
            .groupBy("centroid_id", "pos")
            .agg(
                F.sum(F.col("x").cast(_DEC)).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        new = [list(c) for c in centroids]
        by_cluster: dict[int, dict[int, tuple]] = {}
        for r in parts:
            by_cluster.setdefault(r["centroid_id"], {})[r["pos"]] = (r["s"], r["n"])
        for cid, comps in by_cluster.items():
            for pos, (s, n) in comps.items():
                new[cid][pos] = float(s) / n
        centroids = new
    return centroids


def trained_centroids_sf001() -> list[list[float]]:
    """Centroids trained ONCE offline by ``tools/train_ivf_centroids.py``
    (deterministic kmeans_fit on the sf0.01 embeddings fixture) and
    checked in as literals. Used by the q41 contract query: the oracle
    inlines the same literals into static SQL, and the cells are balanced
    — the data-independent ``pseudo_centroids`` degenerated to one giant
    cell on this corpus (~N^2 candidates, 69.8s at sf0.01 in BENCH_r02)."""
    import json
    import os

    path = os.path.join(os.path.dirname(__file__), "ivf_centroids_sf001.json")
    with open(path) as f:
        return json.load(f)["centroids"]


def pseudo_centroids(nlist: int, dim: int, seed: str = "ivf") -> list[list[float]]:
    """Deterministic data-independent centroids in [-1, 1]^dim (md5-derived
    plan-time constants, same discipline as the LSH hyperplanes). Used by
    the oracle-checked contract query; real deployments train with
    ``kmeans_fit`` — the search machinery is identical either way."""
    import hashlib

    return [
        [
            (int(hashlib.md5(f"{seed}|{c}|{i}".encode()).hexdigest()[:8], 16) % 2001 - 1000)
            / 1000.0
            for i in range(dim)
        ]
        for c in range(nlist)
    ]
