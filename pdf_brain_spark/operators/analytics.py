"""Corpus analytics — the reference's tag/keyword analysis scripts
re-expressed declaratively:

  * keyword scoring (AutoTagger.ts:463-495): tokenize → stopword filter →
    term frequency × dampening × length weight → top-N per doc.
  * tag/source distribution (scripts/analyze-tags.ts:25-171): per-value doc
    counts, coverage %, usage buckets (≥20% / 5-20% / 1-5% / <1%).
  * co-occurrence pairs (analyze-tags.ts pair counts): distinct values per
    doc self-joined with a < b, counted.
  * integrity anti-joins (LibSQLDatabase.ts:559-603 orphan repair): left_anti
    is the literal Spark primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pdf_brain_spark.functions.text import LANG_STOPWORDS, tokenize

# the reference's stopword battery is ~100 English words
# (AutoTagger.ts:131-246); we use our EN set + common fillers
KEYWORD_STOPWORDS = LANG_STOPWORDS["en"] + [
    "on", "at", "by", "an", "be", "or", "as", "are", "was", "with", "this", "from",
]


def keyword_scores(
    docs: DataFrame,
    top_n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-N keywords per document: tf × length dampening, stopwords out
    (AutoTagger.ts:463-495 shape: freq × min(1, len/4) weighting)."""
    toks = docs.select(F.col(id_col), F.explode(tokenize(text_col)).alias("word"))
    toks = toks.filter(~F.col("word").isin(KEYWORD_STOPWORDS) & (F.length("word") > 2))
    tf = toks.groupBy(id_col, "word").agg(F.count(F.lit(1)).alias("tf"))
    scored = tf.withColumn(
        "kw_score",
        F.round(F.col("tf") * F.least(F.length("word") / F.lit(4.0), F.lit(1.0)), 6),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("kw_score").desc(), F.col("word").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_n)
        .select(id_col, "word", "kw_score", F.col("rn").alias("rank"))
    )


def value_distribution(
    docs: DataFrame, value_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """Per-value doc counts + coverage % + the reference's usage buckets
    (analyze-tags.ts: ≥20% common / 5-20% moderate / 1-5% niche / <1% rare)."""
    total = docs.select(F.countDistinct(id_col).alias("n")).collect()[0]["n"]
    dist = docs.groupBy(value_col).agg(F.countDistinct(id_col).alias("n_docs"))
    pct = F.col("n_docs") * 100.0 / F.lit(float(total))
    return dist.select(
        value_col,
        "n_docs",
        F.round(pct, 6).alias("coverage_pct"),
        F.when(pct >= 20, "common")
        .when(pct >= 5, "moderate")
        .when(pct >= 1, "niche")
        .otherwise("rare")
        .alias("usage_bucket"),
    )


def cooccurrence_pairs(
    items: DataFrame, id_col: str, value_col: str, min_count: int = 2
) -> DataFrame:
    """Co-occurrence counts of distinct values within the same doc."""
    d = items.select(id_col, value_col).distinct()
    a = d.select(F.col(id_col), F.col(value_col).alias("value_a"))
    b = d.select(F.col(id_col), F.col(value_col).alias("value_b"))
    return (
        a.join(b, id_col)
        .filter(F.col("value_a") < F.col("value_b"))
        .groupBy("value_a", "value_b")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_count)
    )


def orphans(child: DataFrame, parent: DataFrame, key: str | list[str]) -> DataFrame:
    """Integrity repair: child rows with no parent (left_anti), the Spark
    literal of the reference's NOT EXISTS orphan scans."""
    keys = [key] if isinstance(key, str) else key
    return child.join(parent.select(*keys).distinct(), keys, "left_anti")
