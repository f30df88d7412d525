"""Rank-fusion and relevance-feedback retrieval operators — the two
standard IR compositions on top of the vector / FTS arms this engine
already serves:

  * RECIPROCAL RANK FUSION (Cormack, Clarke & Buettcher, SIGIR 2009):
    merge N ranked lists by sum(1 / (k + rank)) — the robust score-free
    alternative to the reference's min(1, s·1.2) boost merge
    (operators/hybrid.py). Rank-based, so arms with incomparable score
    scales (cosine in [0,1] vs unbounded BM25) fuse without calibration.

  * PSEUDO-RELEVANCE FEEDBACK query expansion (RM3-style, Lavrenko &
    Croft 2001 relevance models, simplified to the deterministic
    tf-weighted variant): run the query, take the top fb_docs documents,
    mine the fb_terms most frequent non-query terms from them, and
    re-run with the expanded term set.

Scale posture: both operators compose top-k-sized frames. RRF joins
K-row arms (a full-outer join of two ≤K-row DataFrames — broadcast-sized
by construction, no corpus shuffle beyond what the arms themselves do).
PRF's expansion-term mining is a semi-join of the corpus against a
fb_docs-row broadcast plus one term-count aggregate over ONLY the
feedback docs; the second search pass reuses the map-side BM25 plan
(operators/fts.py — no explode, no postings shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RRF_K = 60  # the SIGIR'09 default; dampens the head, rewards consensus


def rrf_fuse(
    arms: list[DataFrame],
    key_col: str,
    k_const: int = RRF_K,
    limit: int = 10,
) -> DataFrame:
    """Fuse ranked lists by reciprocal-rank score. Each arm frame must
    carry (key_col, rank) with rank 1..n (dense, pre-computed by the
    arm's own ordering — fusion never looks at the arms' scores, which
    is the point). Returns (key_col, rrf_score, n_arms) ordered by
    score desc, key asc.

    Determinism: the score is a sum of 1/(k+rank) doubles in fixed arm
    order (arm 0's term + arm 1's term + ...), the identical expression
    the SQL oracle computes — same operands, same IEEE-754 doubles."""
    if not arms:
        raise ValueError("rrf_fuse needs at least one arm")
    sides = [
        a.select(F.col(key_col), (1.0 / (F.lit(float(k_const)) + F.col("rank"))).alias(f"_rr{i}"))
        for i, a in enumerate(arms)
    ]
    merged = sides[0]
    for s in sides[1:]:
        merged = merged.join(s, key_col, "full_outer")
    terms = [F.coalesce(F.col(f"_rr{i}"), F.lit(0.0)) for i in range(len(arms))]
    present = [
        F.when(F.col(f"_rr{i}").isNotNull(), 1).otherwise(0) for i in range(len(arms))
    ]
    score = terms[0]
    for t in terms[1:]:
        score = score + t
    n_arms = present[0]
    for p in present[1:]:
        n_arms = n_arms + p
    return (
        merged.withColumn("_score", score)
        .withColumn("n_arms", n_arms)
        .orderBy(F.col("_score").desc(), F.col(key_col).asc())
        .limit(limit)
        .select(key_col, F.round("_score", 6).alias("rrf_score"), "n_arms")
    )


def prf_expansion_terms(
    docs: DataFrame,
    feedback_ids: DataFrame,
    query_terms: list[str],
    fb_terms: int = 3,
    min_term_len: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    toked: DataFrame | None = None,
) -> list[str]:
    """The deterministic expansion-term mining step: tf-ranked terms of
    the feedback documents, excluding the original query terms and
    terms shorter than min_term_len (the crude-but-deterministic
    stopword gate). Ties break term-ascending. Returns <= fb_terms
    terms — a bounded driver-side list (this IS the query rewrite, a
    few strings, not data). Pass `toked` (fts.tokenized_corpus) to
    reuse an existing tokenize pass."""
    from pdf_brain_spark.operators.fts import tokenized_corpus

    q = {t.lower() for t in query_terms}
    if toked is None:
        toked = tokenized_corpus(docs, id_col, text_col)
    fb = toked.join(F.broadcast(feedback_ids.select(id_col)), id_col)
    counts = (
        fb.select(F.explode(F.col("_tokens")).alias("term"))
        .filter((F.length("term") >= min_term_len) & (~F.col("term").isin(list(q))))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(F.col("tf").desc(), F.col("term").asc())
        .limit(fb_terms)
        .collect()
    )
    return [r["term"] for r in counts]


def prf_search(
    docs: DataFrame,
    query_terms: list[str],
    fb_docs: int = 5,
    fb_terms: int = 3,
    k: int = 10,
    min_term_len: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Two-pass PRF retrieval: BM25 → top fb_docs feedback set → mine
    fb_terms expansion terms → BM25 over query ∪ expansion terms.
    The corpus tokenizes ONCE (fts.tokenized_corpus); the feedback
    pass, the term mining, and the expanded re-run all share that
    materialized frame — at scale the tokenize map stage is the whole
    cost of the operator, so it must not run per pass.
    Returns the second pass's (id_col, bm25, terms_matched) top-k."""
    from pdf_brain_spark.operators.fts import bm25_scores, tokenized_corpus

    toked = tokenized_corpus(docs, id_col, text_col)
    first = bm25_scores(
        docs, query_terms, id_col=id_col, text_col=text_col, k=fb_docs, toked=toked
    )
    expansion = prf_expansion_terms(
        docs,
        first.select(id_col),
        query_terms,
        fb_terms=fb_terms,
        min_term_len=min_term_len,
        id_col=id_col,
        text_col=text_col,
        toked=toked,
    )
    expanded = [t.lower() for t in query_terms] + expansion
    return bm25_scores(
        docs, expanded, id_col=id_col, text_col=text_col, k=k, toked=toked
    )
