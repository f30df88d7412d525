"""Vector search operators — the load-bearing path of the reference.

Reference behavior being re-expressed (not ported):
  * ANN top-k probe + 3-way join to chunks/documents
    (LibSQLDatabase.ts:325-376) → here: exact brute-force cosine top-k as the
    correctness baseline (deterministic, oracle-able), with the scan→score→
    TakeOrderedAndProject plan Spark already executes optimally.
  * Over-fetch heuristics: tag-filtered searches fetch limit×3 candidates
    before the post-filter (LibSQLDatabase.ts:340), multi-scale fetches
    limit×2 (LibSQLDatabase.ts:226-227). Semantic knob, replicated.
  * Score threshold pushdown: score≥t ⇒ distance ≤ 2(1-t) in the WHERE
    (LibSQLDatabase.ts:359-368) — expressed as a filter Catalyst pushes
    below the sort.

Scale posture: a single query against N vectors is a scan + TakeOrdered —
O(N/executors), no shuffle of the fact table, only k rows to the driver.
Batched queries become a broadcast nested-loop similarity join
(`similarity_join`): the query side is broadcast, the vector side streams.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pdf_brain_spark.functions.vector import (
    cosine_distance,
    distance_to_score,
    score_threshold_to_distance,
)

OVERFETCH_TAG_FILTER = 3  # LibSQLDatabase.ts:340
OVERFETCH_MULTISCALE = 2  # LibSQLDatabase.ts:226-227


def topk_by_query_df(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    query_col: str = "query_vec",
    threshold: float | None = None,
) -> DataFrame:
    """Exact cosine top-k of `vectors` against a 1-row query DataFrame.

    The query side is crossJoin-broadcast (1 row), so the plan is:
    parquet scan → codegen'd score expr → [pushed threshold filter] →
    TakeOrderedAndProject(k). No shuffle.
    """
    q = F.broadcast(query)
    scored = vectors.crossJoin(q).withColumn(
        "distance", cosine_distance(F.col(vec_col), F.col(query_col))
    )
    if threshold is not None:
        scored = scored.filter(F.col("distance") <= F.lit(score_threshold_to_distance(threshold)))
    return (
        scored.withColumn("score", distance_to_score(F.col("distance")))
        .drop(query_col)
        .orderBy(F.col("distance").asc(), F.col("vec_id").asc())
        .limit(k)
    )


def topk(
    vectors: DataFrame,
    query_vec: list[float] | Column,
    k: int = 10,
    vec_col: str = "embedding",
    threshold: float | None = None,
    post_filter: Column | None = None,
) -> DataFrame:
    """Exact cosine top-k against a literal query vector, with the
    reference's over-fetch-then-post-filter semantics when `post_filter`
    is given (fetch k×3 candidates, filter, re-limit to k)."""
    qcol = (
        F.array(*[F.lit(float(x)) for x in query_vec])
        if isinstance(query_vec, list)
        else query_vec
    )
    scored = vectors.withColumn("distance", cosine_distance(F.col(vec_col), qcol))
    if threshold is not None:
        scored = scored.filter(F.col("distance") <= F.lit(score_threshold_to_distance(threshold)))
    scored = scored.withColumn("score", distance_to_score(F.col("distance")))
    # vec_id tiebreaker everywhere: tied distances must select the same
    # candidate set as the oracle's ORDER BY d, vec_id
    if post_filter is not None:
        fetch = k * OVERFETCH_TAG_FILTER
        candidates = scored.orderBy(F.col("distance").asc(), F.col("vec_id").asc()).limit(fetch)
        return (
            candidates.filter(post_filter)
            .orderBy(F.col("distance").asc(), F.col("vec_id").asc())
            .limit(k)
        )
    return scored.orderBy(F.col("distance").asc(), F.col("vec_id").asc()).limit(k)


def similarity_join(
    queries: DataFrame,
    vectors: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    query_col: str = "query_vec",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batch top-k: every query row × every vector row, ranked per query.

    This is where Spark beats a one-query-at-a-time engine: thousands of
    queries amortize a single scan of the vector table. Query side is
    broadcast (small); rank via window partitioned by query id so the
    shuffle is on query_id — bounded by #queries×k output rows.
    """
    from pyspark.sql import Window

    scored = (
        vectors.crossJoin(F.broadcast(queries))
        .withColumn("distance", cosine_distance(F.col(vec_col), F.col(query_col)))
        .withColumn("score", distance_to_score(F.col("distance")))
    )
    w = Window.partitionBy(query_id).orderBy(F.col("distance").asc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop(query_col, vec_col)
    )
