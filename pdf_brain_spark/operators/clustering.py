"""Clustering operators — the reference's RAPTOR-style k-means stack
(src/services/Clustering.ts) re-expressed on MLlib:

  * k-means (Lloyd's + k-means++ init, Clustering.ts:233-320) →
    pyspark.ml.clustering.KMeans (distributed Lloyd's, k-means|| init).
    The reference's mini-batch variant (Clustering.ts:411-508) exists only
    because it is single-process; distributed KMeans supersedes it.
  * BIC model selection (Clustering.ts:336-359,657-676):
    BIC = n·ln(RSS/n) + params·ln(n), params = k·(dim+1); argmin over k.
  * soft clustering (Clustering.ts:217-224,520-557): softmax(-distance/T)
    over centroids per point, temperature 0.5, filter p ≥ minProbability.
  * cluster summaries (ClusterSummarizer.ts extractive fallback):
    per-cluster centroid + member count + representative members.
  * cluster→concept mapping (ClusterConceptMapper.ts:80-117): argmax
    cosine(centroid, concept_embedding) with threshold — a crossJoin against
    broadcast concepts + rank-1 window.

Scale: KMeans shuffles per iteration on cluster assignment (unavoidable);
centroids are always driver-small and broadcast into the softmax/assignment
expressions, so scoring N vectors is a map-only stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SOFTMAX_TEMPERATURE = 0.5  # Clustering.ts:217-224


def _to_mllib_vectors(emb: DataFrame, vec_col: str) -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    return emb.withColumn("_features", array_to_vector(F.col(vec_col).cast("array<double>")))


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    max_iter: int = 20,
    tol: float = 5e-3,
):
    """Fit KMeans and return (assignments DF with `cluster_id` and
    `distance` to own centroid, centroids list). tol=5e-3 (vs MLlib's
    1e-4 default): on embedding-scale data the centroid drift past that
    point is noise — measured WSSSE is identical while Lloyd's stops
    several iterations (and cluster-wide passes) earlier."""
    from pyspark.ml.clustering import KMeans

    # cache: Lloyd's iterations + k-means|| init each rescan the features;
    # uncached this re-runs the parquet scan + array→vector per job
    feats = _to_mllib_vectors(emb, vec_col).cache()
    model = KMeans(k=k, seed=seed, maxIter=max_iter, tol=tol, featuresCol="_features").fit(feats)
    centroids = [c.tolist() for c in model.clusterCenters()]
    assigned = model.transform(feats).withColumnRenamed("prediction", "cluster_id")
    # distance to own centroid via broadcast centroid array lookup
    cent_arr = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in centroids])
    from pdf_brain_spark.functions.vector import euclidean_distance

    assigned = assigned.withColumn(
        "distance",
        euclidean_distance(
            F.col(vec_col),
            F.element_at(cent_arr, F.col("cluster_id") + 1),
            dim=len(centroids[0]) if centroids else None,
        ),
    ).drop("_features")
    return assigned, centroids


def kmeans_rss(assigned: DataFrame) -> float:
    """Residual sum of squares Σ distance² (BIC input)."""
    return float(assigned.select(F.sum(F.col("distance") ** 2).alias("rss")).collect()[0]["rss"])


def bic_select_k(
    emb: DataFrame,
    k_range: range,
    seed: int = 42,
    vec_col: str = "embedding",
    max_iter: int = 10,
) -> tuple[int, dict[int, float]]:
    """BIC = n·ln(RSS/n) + k·(dim+1)·ln(n); argmin over k
    (Clustering.ts:657-676). Coarse fits (max_iter=10) rank k reliably;
    refit the winner at full iterations for the final model."""
    import math

    n = emb.count()
    dim = len(emb.select(vec_col).first()[0])
    scores: dict[int, float] = {}
    for k in k_range:
        assigned, _ = kmeans_assign(emb, k=k, seed=seed, vec_col=vec_col, max_iter=max_iter)
        rss = kmeans_rss(assigned)
        params = k * (dim + 1)
        scores[k] = n * math.log(max(rss, 1e-12) / n) + params * math.log(n)
    best = min(scores, key=scores.get)
    return best, scores


def soft_assignments(
    emb: DataFrame,
    centroids: list[list[float]],
    temperature: float = SOFTMAX_TEMPERATURE,
    min_probability: float = 0.1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Softmax(-distance/T) membership probabilities, max-shifted for
    stability exactly like the reference (Clustering.ts:217-224); rows with
    p < min_probability dropped."""
    from pdf_brain_spark.functions.vector import euclidean_distance

    cent_arr = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in centroids])
    k = len(centroids)
    with_d = emb.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("cluster_id"),
        F.col(vec_col).alias("_v"),
    ).withColumn(
        "neg_d",
        -euclidean_distance(
            F.col("_v"),
            F.element_at(cent_arr, F.col("cluster_id") + 1),
            dim=len(centroids[0]),
        )
        / F.lit(temperature),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col)
    shifted = with_d.withColumn("m", F.max("neg_d").over(w)).withColumn(
        "e", F.exp(F.col("neg_d") - F.col("m"))
    )
    return (
        shifted.withColumn("p", F.col("e") / F.sum("e").over(w))
        .filter(F.col("p") >= min_probability)
        .select(id_col, "cluster_id", F.round("p", 6).alias("probability"))
    )


def cluster_summaries(assigned: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Per-cluster rollup: size + mean distance + closest member (the
    extractive-summary stand-in: the medoid-ish representative)."""
    from pyspark.sql import Window

    w = Window.partitionBy("cluster_id").orderBy(F.col("distance").asc(), F.col(id_col).asc())
    rep = (
        assigned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("cluster_id", F.col(id_col).alias("representative_id"))
    )
    stats = assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("chunk_count"),
        F.round(F.avg("distance"), 6).alias("mean_distance"),
    )
    return stats.join(rep, "cluster_id")


def label_centroids(
    emb: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Deterministic per-group mean vector (label, centroid) — the
    oracle-able stand-in for k-means centroids (cluster_summaries.centroid,
    LibSQLDatabase.ts:859-870). Uses MLlib Summarizer.mean: one pass with
    map-side partial aggregation — the per-dimension shuffle is bounded by
    groups × partitions, never rows."""
    from pyspark.ml.functions import vector_to_array
    from pyspark.ml.stat import Summarizer

    v = _to_mllib_vectors(emb, vec_col)
    return (
        v.groupBy(label_col)
        .agg(Summarizer.mean(F.col("_features")).alias("_mean"))
        .select(F.col(label_col), vector_to_array(F.col("_mean")).alias("centroid"))
    )


def nearest_concept(
    centroids_df: DataFrame,
    concepts: DataFrame,
    threshold: float = 0.5,
    cent_col: str = "centroid",
    concept_vec_col: str = "embedding",
) -> DataFrame:
    """Cluster→concept: argmax cosine(centroid, concept_emb) ≥ threshold
    (ClusterConceptMapper.ts:80-117). Concepts broadcast (dimension-sized)."""
    from pyspark.sql import Window

    from pdf_brain_spark.functions.vector import cosine_similarity

    crossed = centroids_df.crossJoin(F.broadcast(concepts)).withColumn(
        "sim", cosine_similarity(F.col(cent_col), F.col(concept_vec_col))
    )
    w = Window.partitionBy("cluster_id").orderBy(F.col("sim").desc())
    return (
        crossed.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("sim") >= threshold))
        .drop("rn", cent_col, concept_vec_col)
    )
