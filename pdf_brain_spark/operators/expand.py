"""Neighbor-context expansion — the reference's expandChars feature
(LibSQLDatabase.ts:459-535 getExpandedContext; dedup of overlapping ranges
src/index.ts:356-411). The reference loops point-SELECTs for chunk_index ± i
until a char budget; in Spark this is one range self-join / window:

    hits ⋈ chunks ON same doc AND |chunk_index - hit_index| ≤ w
    → window-ordered concat truncated to the char budget

No per-row loops, no N+1 queries — one shuffle on the doc key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def expand_context(
    hits: DataFrame,
    chunks: DataFrame,
    window: int = 1,
    doc_col: str = "doc_id",
    idx_col: str = "chunk_index",
    content_col: str = "content",
    max_chars: int = 4000,
) -> DataFrame:
    """For each hit (doc_col, idx_col), gather neighbor chunks within
    ±window, ordered by chunk index, concatenated with ' ' and truncated to
    max_chars. Returns hits + expanded_content + expanded_start/end."""
    h = hits.select(
        F.col(doc_col).alias("_h_doc"), F.col(idx_col).alias("_h_idx"), *[
            c for c in hits.columns if c not in (doc_col, idx_col)
        ]
    )
    joined = h.join(
        chunks.select(
            F.col(doc_col).alias("_c_doc"),
            F.col(idx_col).alias("_c_idx"),
            F.col(content_col).alias("_c_content"),
        ),
        (F.col("_h_doc") == F.col("_c_doc"))
        & (F.col("_c_idx") >= F.col("_h_idx") - window)
        & (F.col("_c_idx") <= F.col("_h_idx") + window),
    )
    agg = (
        joined.groupBy("_h_doc", "_h_idx")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_c_idx").alias("i"), F.col("_c_content").alias("c")))
            ).alias("neighbors")
        )
        .select(
            F.col("_h_doc").alias(doc_col),
            F.col("_h_idx").alias(idx_col),
            F.substring(
                F.concat_ws(" ", F.transform(F.col("neighbors"), lambda s: s["c"])), 1, max_chars
            ).alias("expanded_content"),
            F.element_at(F.col("neighbors"), 1)["i"].alias("expanded_start"),
            F.element_at(F.col("neighbors"), -1)["i"].alias("expanded_end"),
        )
    )
    return agg
