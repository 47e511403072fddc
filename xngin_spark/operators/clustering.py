"""Distributed k-means + IVF approximate nearest-neighbor search.

Beyond-reference capability (the reference has no vector surface at
all). The IVF (inverted-file) index is the classic ANN scale path:

1. TRAIN: k-means over a sample of the corpus → ``nlist`` centroids.
   Lloyd iterations run as DataFrame jobs: centroids broadcast (tiny),
   assignment is a map-side argmin, the update is one groupBy(cluster)
   shuffle of per-dimension sums. O(iters) jobs, each a single shuffle
   of k×d doubles per partition — scales to any corpus size.
2. INDEX: assign every corpus vector to its nearest centroid (map-side,
   broadcast centroids) → the "inverted list" column.
3. SEARCH: a query probes only the ``nprobe`` nearest lists, scoring
   |corpus|·nprobe/nlist candidates instead of |corpus| — the same
   bucket-local join shape as the LSH variant, with learned buckets.

All JVM expressions (zip_with/aggregate); queries broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xngin_spark.operators.util import fan_out


def _sq_dist(a, b):
    """Squared L2 distance of two array columns, plain double (k-means
    needs no cross-engine determinism — the tie-break on cluster id
    keeps assignment deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _nearest(vec_col, centroids: list[list[float]]):
    """(cluster_id, sq_dist) struct of the nearest centroid — map-side
    argmin over a centroid array literal."""
    carr = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in centroids])
    scored = F.transform(
        F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
        lambda i: F.struct(
            _sq_dist(vec_col, F.element_at(carr, i + 1)).alias("d"), i.alias("c")
        ),
    )
    return F.array_min(scored)  # struct compare: min d, then min c


def kmeans_fit(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    max_iter: int = 8,
    sample_fraction: float | None = None,
    seed: int = 42,
) -> list[list[float]]:
    """Lloyd's k-means; returns centroids as plain lists (driver-side
    k×d floats — broadcastable by literal).

    Init: deterministic sample of k rows. Each iteration: one broadcast
    (centroids as literals), one groupBy(cluster) shuffle of
    per-dimension decimal-free sums. Empty clusters keep their previous
    centroid. The training set may be a sample — at 100 TB you fit on
    ~1M sampled rows and index the full corpus with the frozen
    centroids.
    """
    vecs = df.select(F.col(vec_col).alias("v"))
    if sample_fraction:
        vecs = vecs.sample(fraction=sample_fraction, seed=seed)
    vecs = fan_out(vecs)
    centroids = [
        [float(x) for x in r.v]
        for r in vecs.toDF("v").orderBy(F.xxhash64(F.col("v").cast("string"))).limit(k).collect()
    ]
    dim = len(centroids[0])
    for _ in range(max_iter):
        assigned = vecs.withColumn("cl", _nearest(F.col("v"), centroids)["c"])
        # update step: explode to (cl, dim, x) and aggregate narrow —
        # one small fixed-shape plan per iteration (a dim-wide column
        # aggregate recompiles dim sum expressions every iteration and
        # dominates wall-clock)
        sums = (
            assigned.select("cl", F.posexplode("v").alias("i", "x"))
            .groupBy("cl", "i")
            .agg(F.sum(F.col("x").cast("double")).alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        acc: dict[int, list[float]] = {}
        cnt: dict[int, int] = {}
        for r in sums:
            acc.setdefault(r.cl, [0.0] * dim)[r.i] = r.s
            cnt[r.cl] = r.n
        new = list(centroids)
        for cl, vec in acc.items():
            new[cl] = [x / cnt[cl] for x in vec]
        if new == centroids:
            break
        centroids = new
    return centroids


def ivf_index(
    corpus: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Corpus + ``ivf_list`` column (nearest-centroid id) — map-side."""
    return fan_out(corpus).withColumn("ivf_list", _nearest(F.col(vec_col), centroids)["c"])


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
    centroids: list[list[float]] | None = None,
    max_iter: int = 8,
) -> DataFrame:
    """Approximate cosine top-k through an IVF index.

    Each query expands to its ``nprobe`` nearest lists (broadcast), the
    candidate join is list-local, and only candidates are scored —
    |corpus|·nprobe/nlist distance computations. Recall rises with
    nprobe (nprobe = nlist ⇒ exact).
    """
    from xngin_spark.operators.similarity import vec_dot, vec_norm

    if centroids is None:
        centroids = kmeans_fit(corpus, nlist, vec_col, max_iter=max_iter)
    indexed = ivf_index(corpus, centroids, vec_col)

    carr = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in centroids])
    probe_lists = F.slice(
        F.transform(
            F.array_sort(
                F.transform(
                    F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
                    lambda i: F.struct(
                        _sq_dist(F.col(vec_col), F.element_at(carr, i + 1)).alias("d"),
                        i.alias("c"),
                    ),
                )
            ),
            lambda s: s["c"],
        ),
        1,
        nprobe,
    )
    q = queries.select(
        F.col(query_id_col).alias("qid"),
        F.col(vec_col).alias("qvec"),
        F.explode(probe_lists).alias("ivf_list"),
    )
    scored = indexed.join(F.broadcast(q), "ivf_list").withColumn(
        "cosine",
        vec_dot(F.col(vec_col), F.col("qvec"))
        / (vec_norm(F.col(vec_col)) * vec_norm(F.col("qvec"))),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.select("qid", id_col, "cosine")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
