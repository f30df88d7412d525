"""Native (JVM-side, codegen'd) vector math over ``array<float>`` columns.

The reference stores vectors as packed F32 blobs and scores with libSQL's
``vector_distance_cos`` — cosine *distance* in [0, 2] — then maps to a
similarity score with ``score = 1 - distance/2``
(reference: src/services/LibSQLDatabase.ts:205,332,386-387). We replicate
those formulas exactly as named expressions so parity is testable.

Everything here is built from ``zip_with`` / ``aggregate`` higher-order
functions — no Python UDFs — so the whole pipeline stays inside
WholeStageCodegen and scales linearly with executors. Elements are cast to
double before multiply/accumulate: float32 intermediate rounding would
otherwise diverge from any double-precision oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ in double precision, sequential (deterministic) fold."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    """L2 norm ‖a‖ in double precision."""
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_distance(a: Column | str, b: Column | str) -> Column:
    """libSQL ``vector_distance_cos`` semantics: 1 - cos_sim, range [0, 2]."""
    return F.lit(1.0) - cosine_similarity(a, b)


def distance_to_score(distance: Column) -> Column:
    """Reference score mapping: ``score = 1 - distance/2`` ∈ [0, 1]
    (LibSQLDatabase.ts:386-387)."""
    return F.lit(1.0) - distance / F.lit(2.0)


def score_threshold_to_distance(threshold: float) -> float:
    """Reference predicate pushdown: ``score ≥ t`` ⇔ ``distance ≤ 2(1-t)``
    (LibSQLDatabase.ts:359-368). Returned constant goes into a filter that
    Catalyst can push below the top-k."""
    return 2.0 * (1.0 - threshold)


def similarity_score(a: Column | str, b: Column | str) -> Column:
    """End-to-end score = 1 - cos_distance/2 = (1 + cos_sim)/2."""
    return distance_to_score(cosine_distance(a, b))


def euclidean_distance(a: Column | str, b: Column | str) -> Column:
    """√Σ(aᵢ-bᵢ)² (reference Clustering.ts:189-191)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def is_valid_embedding(a: Column | str, dim: int) -> Column:
    """Embedding validation gate (reference Ollama.ts:70-106): correct
    dimension and every component finite."""
    a = F.col(a) if isinstance(a, str) else a
    return (
        (F.size(a) == dim)
        & ~F.exists(a, lambda x: F.isnan(x) | (F.abs(x) == F.lit(float("inf"))))
    )
