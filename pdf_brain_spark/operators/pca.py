"""Exact-integer principal-direction extraction over embedding columns.

Power iteration is the canonical distributed PCA primitive (one pass to
build the Gram matrix, then tiny fixed-size iterations), but its float
form is un-oracle-able: the Gram accumulation and the matrix-vector
products sum in engine-specific order. This module quantizes BOTH:
embedding components round once to integer milli-units, the Gram matrix
is an exact int64 sum of milli² products, and each power-iteration step
is integer arithmetic with max-|component|-normalization (the HITS/
PageRank playbook applied to linear algebra) — so a SQL twin can unroll
the identical iterations and hash-match the principal direction.

Scale notes (dim d, n rows, milli quantization ≤ ~2000/component):
Gram entries ≤ n·4e6 — int64-safe to n ≈ 2e12 rows; the matvec raw
values ≤ d·|C|·1e6 — int64-safe while n·d ≤ ~2e9 at this quantization —
and the max-normalization step multiplies raw by ANOTHER 1e6 before the
truncating division, so that intermediate is ≤ d·|C|·1e12 (int64-safe
only to n·d ≈ 2e3). The driver-side iteration runs in arbitrary-
precision Python ints, so neither bound binds there; the SQL twins keep
the normalization multiply in HUGEINT (both the first-PC and deflated
oracles), so DuckDB stays exact to the GRAM bound, not the tighter
normalization one (ADVICE r8). The Gram build is the only corpus-scale work: an
Arrow-batched mapInPandas partial (BLAS int64 V^T V per batch, d² rows
emitted per partition) + one (i,j) sum — the same partial-aggregate
shape as the batched similarity join. The iteration itself runs on the
driver over the BOUNDED d×d matrix (same justification as the k-means
bounded-sample fit: the data never leaves the cluster, only the d²
summary does)."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PCA_COMPONENT_SCALE = 1000  # embedding component quantization (milli)
PCA_VECTOR_SCALE = 1_000_000  # iteration vector normalization (micro)


def _round_half_away(x: np.ndarray) -> np.ndarray:
    # DuckDB/Spark round() semantics (half away from zero), NOT numpy's
    # rint (half to even) — the MMR micro-unit lesson, applied before it
    # bites this time.
    return (np.floor(np.abs(x) + 0.5) * np.sign(x)).astype(np.int64)


def gram_matrix_int(emb: DataFrame, vec_col: str = "embedding", dim: int = 64) -> DataFrame:
    """(i, j, c): exact int64 Gram matrix Σ q_i·q_j over milli-quantized
    embedding components. One corpus pass, d² partial rows per Arrow
    batch, one map-side-combinable (i, j) sum."""

    def _partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros((dim, dim), dtype=np.int64)
        any_rows = False
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.vstack(pdf[vec_col].to_list()).astype(np.float64)
            q = _round_half_away(v * PCA_COMPONENT_SCALE)
            acc += q.T @ q
            any_rows = True
        if any_rows:
            ii, jj = np.meshgrid(np.arange(dim), np.arange(dim), indexing="ij")
            yield pd.DataFrame(
                {"i": ii.ravel(), "j": jj.ravel(), "c": acc.ravel()}
            )

    partials = emb.select(vec_col).mapInPandas(
        _partial, schema="i int, j int, c long"
    )
    return partials.groupBy("i", "j").agg(F.sum("c").cast("long").alias("c"))


def _trunc_div(a: int, b: int) -> int:
    # both engines' integer division truncates toward zero (DuckDB //
    # on integers and Spark div — verified: -10//7 = -1 in both);
    # python's // floors, so mirror truncation explicitly
    q = abs(a) // b
    return q if a >= 0 else -q


def power_iteration_exact(
    spark: SparkSession,
    gram: DataFrame,
    dim: int = 64,
    n_iter: int = 2,
) -> DataFrame:
    """Fixed-iteration integer power method over the exact Gram matrix:
    v0 = scale·1, v' = C·v (exact int), v = v'·scale // max|v'|
    (truncating division, matching both engines). The d×d matrix is the
    ONLY thing collected — bounded by dim², not data. Returns
    (dim_idx, loading_micro): the dominant principal direction,
    max-normalized to ±1e6."""
    rows = gram.collect()  # bounded: dim² rows
    c = {}
    for r in rows:
        c[(r["i"], r["j"])] = r["c"]
    v = _iterate(c, dim, [PCA_VECTOR_SCALE] * dim, n_iter)
    return spark.createDataFrame(
        [(int(i), int(v[i])) for i in range(dim)],
        "dim_idx int, loading_micro long",
    )


def _iterate(c: dict, dim: int, v: list[int], n_iter: int) -> list[int]:
    for _ in range(n_iter):
        raw = [
            sum(c.get((i, j), 0) * v[j] for j in range(dim)) for i in range(dim)
        ]
        mx = max(abs(x) for x in raw)
        v = [_trunc_div(x * PCA_VECTOR_SCALE, mx) for x in raw]
    return v


def power_iteration_deflated(
    spark: SparkSession,
    gram: DataFrame,
    dim: int = 64,
    n_iter: int = 2,
) -> DataFrame:
    """TOP-2 principal directions by exact-integer power iteration with
    Hotelling deflation: after the dominant direction v₁ converges, the
    Gram matrix deflates as C' = C − (v₁v₁ᵀ)·λ_num // λ_den², where
    λ_num = v₁ᵀCv₁ and λ_den = v₁ᵀv₁ are exact integers — one
    truncating division per cell, matching DuckDB's HUGEINT `//`
    exactly (python's floor `//` is sign-corrected by _trunc_div) — and
    the second direction iterates on the deflated integer matrix.
    Magnitude budget: |v₁ᵢv₁ⱼ·λ_num| ≤ ~3e35 at sf0.1 — exact in
    python bigints and inside DuckDB's 128-bit HUGEINT; past that,
    rescale the vector normalization (documented, not silent).

    Same bounded-collect justification as power_iteration_exact: only
    the d×d Gram summary leaves the cluster. Returns
    (dim_idx, pc1_micro, pc2_micro)."""
    rows = gram.collect()
    c = {(r["i"], r["j"]): r["c"] for r in rows}
    v1 = _iterate(c, dim, [PCA_VECTOR_SCALE] * dim, n_iter)
    cv = [sum(c.get((i, j), 0) * v1[j] for j in range(dim)) for i in range(dim)]
    lam_num = sum(v1[i] * cv[i] for i in range(dim))
    lam_den = sum(x * x for x in v1)
    c2 = {
        (i, j): c.get((i, j), 0)
        - _trunc_div(v1[i] * v1[j] * lam_num, lam_den * lam_den)
        for i in range(dim)
        for j in range(dim)
    }
    v2 = _iterate(c2, dim, [PCA_VECTOR_SCALE] * dim, n_iter)
    return spark.createDataFrame(
        [(int(i), int(v1[i]), int(v2[i])) for i in range(dim)],
        "dim_idx int, pc1_micro long, pc2_micro long",
    )
