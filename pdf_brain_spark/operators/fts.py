"""Full-text search: postings + BM25, the Spark re-expression of the
reference's FTS5 inverted index + MATCH/rank (LibSQLDatabase.ts:730-733,
410-438). Spark has no built-in FTS, so we build the inverted structure
declaratively:

    docs → explode(tokens) → postings(term, doc, tf) → join idf → BM25

Scale posture: the postings build is one explode + one groupBy (shuffle on
(doc, term), combiner-friendly); document frequencies are a tiny per-term
aggregate that broadcasts back onto the postings. Query terms are a literal
filter pushed into the postings scan — at 100 TB you'd persist the postings
DataFrame as a bucketed table partitioned by term and this same plan prunes
to the queried terms only.

BM25 (Okapi, k1=1.2 b=0.75, Lucene-style idf) stands in for FTS5's rank;
the reference negates FTS5's more-negative-is-better rank into a positive
score (LibSQLDatabase.ts:437-451) — our score is positive already.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_brain_spark.functions.text import tokenize

BM25_K1 = 1.2
BM25_B = 0.75


def build_postings(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(term, doc_id, tf, doc_len) postings list. Tokenizes once; the doc
    side is repartitioned first because tokenization is the CPU-bound map
    stage (single-file test sources scan as one partition)."""
    sess = docs.sparkSession
    docs = docs.repartition(sess.sparkContext.defaultParallelism, id_col)
    toked = docs.select(id_col, tokenize(text_col).alias("_tokens"))
    toks = toked.select(
        id_col, F.explode(F.col("_tokens")).alias("term"), F.size(F.col("_tokens")).alias("doc_len")
    )
    return toks.groupBy(id_col, "term", "doc_len").agg(F.count(F.lit(1)).alias("tf"))


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """Top-k documents by BM25 against the (lowercased) query terms."""
    terms = [t.lower() for t in query_terms]
    # single tokenization pass for corpus stats AND postings: cache the
    # token-length projection, collect n_docs + avgdl in one action
    toked = docs.select(id_col, F.size(tokenize(text_col)).alias("_dl")).cache()
    n_docs, avgdl = toked.select(
        F.count(F.lit(1)).alias("n"), F.avg("_dl").alias("avgdl")
    ).collect()[0]
    avgdl = float(avgdl)
    postings = build_postings(docs, id_col, text_col).filter(F.col("term").isin(terms))

    df_t = postings.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    scored = (
        postings.join(F.broadcast(df_t), "term")
        .withColumn(
            "idf",
            F.log((F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (BM25_K1 + 1))
            / (
                F.col("tf")
                + BM25_K1 * (1 - BM25_B + BM25_B * F.col("doc_len") / F.lit(avgdl))
            ),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(F.sum("term_score").alias("bm25"), F.count(F.lit(1)).alias("terms_matched"))
        .orderBy(F.col("bm25").desc(), F.col(id_col).asc())
        .limit(k)
    )


def duck_bm25_sql(query_terms: list[str], k: int = 10) -> str:
    """DuckDB oracle twin of bm25_scores over the `documents` view."""
    terms = ", ".join(f"'{t.lower()}'" for t in query_terms)
    return f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), t -> t <> '') AS tokens
      FROM documents
    ),
    stats AS (
      SELECT count(*) AS n_docs, avg(len(tokens)) AS avgdl FROM toks
    ),
    postings AS (
      SELECT doc_id, term, len_tokens AS doc_len, count(*) AS tf
      FROM (
        SELECT doc_id, unnest(tokens) AS term, len(tokens) AS len_tokens FROM toks
      )
      WHERE term IN ({terms})
      GROUP BY doc_id, term, len_tokens
    ),
    dfs AS (
      SELECT term, count(DISTINCT doc_id) AS df FROM postings GROUP BY term
    ),
    scored AS (
      SELECT p.doc_id,
             ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
               * (p.tf * ({BM25_K1} + 1))
               / (p.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * p.doc_len / s.avgdl))
               AS term_score
      FROM postings p JOIN dfs d USING (term), stats s
    )
    SELECT doc_id, round(sum(term_score), 6) AS bm25, count(*) AS terms_matched
    FROM scored
    GROUP BY doc_id
    ORDER BY sum(term_score) DESC, doc_id ASC
    LIMIT {k}
    """
