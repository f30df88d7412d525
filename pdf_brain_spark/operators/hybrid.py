"""Hybrid search merge — the reference's vector∪FTS result merge
(src/index.ts:323-353):

  * vector results come first;
  * an FTS hit whose (docId, page, chunkIndex) key already appeared in the
    vector arm BOOSTS the vector score: min(1, vec_score * 1.2), and the
    match type becomes "hybrid";
  * otherwise the FTS row is appended with its own score;
  * final: sort by score desc, limit.

Re-expressed as a full-outer join on the dedup key — set semantics instead
of the reference's O(n²) find-in-list loop, and shuffle-free when both arms
are already top-k-sized (tiny) DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HYBRID_BOOST = 1.2  # src/index.ts:339
HYBRID_CAP = 1.0


def hybrid_merge(
    vector_results: DataFrame,
    fts_results: DataFrame,
    key_cols: list[str],
    vec_score: str = "vec_score",
    fts_score: str = "fts_score",
    limit: int = 10,
) -> DataFrame:
    """Full-outer merge with the reference's boost semantics. Input frames
    must each carry `key_cols` + their score column."""
    v = vector_results.select(*key_cols, F.col(vec_score).alias("_vs"))
    f = fts_results.select(*key_cols, F.col(fts_score).alias("_fs"))
    merged = v.join(f, key_cols, "full_outer")
    in_both = F.col("_vs").isNotNull() & F.col("_fs").isNotNull()
    return (
        merged.withColumn(
            "score",
            F.when(in_both, F.least(F.lit(HYBRID_CAP), F.col("_vs") * HYBRID_BOOST))
            .otherwise(F.coalesce(F.col("_vs"), F.col("_fs"))),
        )
        .withColumn(
            "match_type",
            F.when(in_both, F.lit("hybrid"))
            .when(F.col("_vs").isNotNull(), F.lit("vector"))
            .otherwise(F.lit("fts")),
        )
        .drop("_vs", "_fs")
        .orderBy(F.col("score").desc(), *[F.col(c).asc() for c in key_cols])
        .limit(limit)
    )
