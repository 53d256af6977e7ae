"""Similarity search over embedding columns (array<float>).

Two paths:

- **brute-force cosine top-k** — exact; JVM-side dot products via
  ``F.aggregate``/``F.zip_with`` (no Python in the loop). The baseline and
  the verifier for approximate variants. Cost is |Q| x |N|; fine for
  moderate query sets, not for all-pairs at 100 TB.
- **LSH-bucketed top-k** — random-hyperplane signatures (SimHash for
  vectors): sign pattern of dot products against D fixed pseudo-random
  hyperplanes. Vectors sharing a signature bucket are candidates; search
  degrades gracefully by probing Hamming-adjacent buckets. The hyperplanes
  are derived deterministically from md5 of (plane, dim) so signatures are
  reproducible across engines and runs.

At scale: bucket the corpus once (write partitioned by signature), then a
query touches only its probe buckets — partition pruning does the rest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """JVM-side dot product of two float arrays (whole-stage codegen).

    Elements are cast to double BEFORE the multiply: float32*float32
    rounds the product to float32, which both loses precision and
    diverges from any engine that promotes first.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int | None = 6,
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors (excluding itself). Returns (query_id, neighbor_id, cosine_sim,
    rank). Ranking uses the rounded similarity with id tiebreak so results
    are deterministic."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    sim = cosine(F.col("__qv"), F.col("__cv"))
    if round_dp is not None:
        sim = F.round(sim, round_dp)
    scored = (
        q.crossJoin(F.broadcast(c))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplane_component(plane: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane component in [-1, 1): derived
    from md5(plane:dim), reproducible in any engine with md5."""
    h = F.md5(F.lit(f"{plane}:{dim}"))
    v = F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")
    return (v / F.lit(2147483648.0)) - F.lit(1.0)


def rh_signature(
    df: DataFrame,
    num_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    sig_col: str = "rh_sig",
) -> DataFrame:
    """Random-hyperplane signature: bit p = sign(v . H_p). Returns the input
    plus an integer signature column (bucket key)."""
    bits = []
    for p in range(num_planes):
        d = F.lit(0.0)
        for i in range(dim):
            d = d + F.element_at(F.col(vec_col), i + 1).cast("double") * _hyperplane_component(p, i)
        bits.append(F.when(d > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return df.withColumn(sig_col, sig.cast("int"))


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    round_dp: int | None = 6,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: KMeans-partition the corpus
    once, then each query scans only its ``n_probe`` nearest cells.

    The 100 TB shape: the clustering pass is one MLlib job; cell assignment
    is written partitioned by cell id, so a query's probe set maps to
    partition pruning. Centroids are tiny and broadcast.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        array_to_vector(F.col(vec_col)).alias("features"),
    )
    km = KMeans(k=n_centroids, seed=seed, featuresCol="features",
                predictionCol="cell")
    model = km.fit(c)
    assigned = model.transform(c).select("neighbor_id", "__cv", "cell")

    # probe-cell selection: centroids are tiny -> literal arrays in-plan
    centroids = [list(map(float, ctr)) for ctr in model.clusterCenters()]
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    dists = F.array(
        *[
            F.struct(
                dot(F.col("__qv"), F.array(*[F.lit(x) for x in ctr])).alias("sim"),
                F.lit(i).alias("cell"),
            )
            for i, ctr in enumerate(centroids)
        ]
    )
    probe = F.slice(F.reverse(F.array_sort(dists)), 1, n_probe)
    q = q.withColumn("cells", F.transform(probe, lambda s: s["cell"]))
    q = q.select("query_id", "__qv", F.explode("cells").alias("cell"))

    sim = cosine(F.col("__qv"), F.col("__cv"))
    if round_dp is not None:
        sim = F.round(sim, round_dp)
    scored = (
        q.join(assigned, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    dim: int = 64,
    round_dp: int | None = 6,
) -> DataFrame:
    """Approximate cosine top-k: candidates share the random-hyperplane
    bucket; exact cosine re-ranks within buckets. Recall rises with fewer
    planes (bigger buckets) and falls with more."""
    qs = rh_signature(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")),
        num_planes, dim, "__qv", "sig",
    )
    cs = rh_signature(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")),
        num_planes, dim, "__cv", "sig",
    )
    sim = cosine(F.col("__qv"), F.col("__cv"))
    if round_dp is not None:
        sim = F.round(sim, round_dp)
    scored = (
        qs.join(cs, "sig")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
