"""Query registry: every implemented operator from SURVEY.md §2 gets a named
entry here, as a (spark, sf_dir) -> DataFrame callable, plus (where
SQL-expressible) an ANSI-SQL oracle twin that DuckDB runs over the same
parquet tables.

Naming rule: every computed column is aliased identically in the Spark plan
and the oracle SQL — the driver hash-compares values after sorting columns
by name.

Float policy: scores/aggregates that involve floating-point reductions are
rounded to 6 decimals on BOTH sides so engine-level summation-order noise
does not flip the value hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_brain_spark.sources.loaders import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; optionally its DuckDB oracle SQL."""

    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# --------------------------------------------------------------------------
# Vector search (SURVEY §2.9 M1/M2, §2.3 J1, §2.5 W1)
# --------------------------------------------------------------------------

# DuckDB-side double-precision cosine over float[] columns; list_zip +
# sequential list_sum mirrors Spark's zip_with + aggregate fold.
_DUCK_COS = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
)
_DUCK_NORM = (
    "sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
)


def _duck_cosine_distance(a: str, b: str) -> str:
    return (
        f"(1.0 - {_DUCK_COS.format(a=a, b=b)} / "
        f"({_DUCK_NORM.format(a=a)} * {_DUCK_NORM.format(a=b)}))"
    )


@query(
    "vector_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS query_vec FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT e.vec_id, e.label,
             {_duck_cosine_distance('e.embedding', 'q.query_vec')} AS d
      FROM embeddings e, q
    )
    SELECT vec_id, label,
           round(d, 6) AS distance,
           round(1.0 - d / 2.0, 6) AS score
    FROM scored
    ORDER BY d ASC, vec_id ASC
    LIMIT 10
    """,
)
def vector_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-10 (reference J1+W1, score = 1 - d/2)."""
    from pdf_brain_spark.operators.vector_search import topk_by_query_df

    emb = load_table(spark, "embeddings", sf_dir)
    qdf = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("query_vec"))
    res = topk_by_query_df(emb, qdf, k=10)
    return res.select(
        "vec_id",
        "label",
        F.round("distance", 6).alias("distance"),
        F.round("score", 6).alias("score"),
    )


@query(
    "vector_topk_threshold",
    oracle=f"""
    WITH q AS (SELECT embedding AS query_vec FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT e.vec_id, e.label,
             {_duck_cosine_distance('e.embedding', 'q.query_vec')} AS d
      FROM embeddings e, q
    )
    SELECT vec_id, label,
           round(d, 6) AS distance,
           round(1.0 - d / 2.0, 6) AS score
    FROM scored
    WHERE d <= 2.0 * (1.0 - 0.55)
    ORDER BY d ASC, vec_id ASC
    LIMIT 50
    """,
)
def vector_topk_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k with score-threshold pushdown: score ≥ 0.55 ⇔ d ≤ 0.9
    (reference P5, LibSQLDatabase.ts:359-368)."""
    from pdf_brain_spark.operators.vector_search import topk_by_query_df

    emb = load_table(spark, "embeddings", sf_dir)
    qdf = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("query_vec"))
    res = topk_by_query_df(emb, qdf, k=50, threshold=0.55)
    return res.select(
        "vec_id",
        "label",
        F.round("distance", 6).alias("distance"),
        F.round("score", 6).alias("score"),
    )


@query(
    "vector_similarity_join",
    oracle=f"""
    WITH queries AS (
      SELECT vec_id AS query_id, embedding AS query_vec
      FROM embeddings WHERE vec_id < 8
    ),
    scored AS (
      SELECT q.query_id, e.vec_id,
             {_duck_cosine_distance('e.embedding', 'q.query_vec')} AS d
      FROM embeddings e, queries q
    ),
    ranked AS (
      SELECT query_id, vec_id, d,
             row_number() OVER (PARTITION BY query_id ORDER BY d ASC, vec_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, vec_id, rank,
           round(1.0 - d / 2.0, 6) AS score
    FROM ranked WHERE rank <= 5
    """,
)
def vector_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched ANN: 8 query vectors × all vectors, top-5 each (M2) —
    one scan amortized over the whole query batch."""
    from pdf_brain_spark.operators.vector_search import similarity_join

    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = similarity_join(queries, emb, k=5)
    return res.select(
        "query_id", "vec_id", "rank", F.round("score", 6).alias("score")
    )


# --------------------------------------------------------------------------
# Relational core on the TPC-H-ish star schema (SURVEY §2.3/2.4/2.5/2.6)
# --------------------------------------------------------------------------


@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty,
           round(sum(l_extendedprice), 4) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_extendedprice), 6) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: the canonical partial-agg /
    map-side-combine pattern (SURVEY A1-analog on the star schema)."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 4
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "top_revenue_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           count(DISTINCT o.o_orderkey) AS n_orders
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def top_revenue_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + agg + top-k. customer is the small side → broadcast
    (reference J1's dimension-join shape at relational scale)."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "regional_volume",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS volume
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def regional_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-ish star join; all dimensions broadcast so the fact table
    never shuffles before the aggregate."""
    li = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("volume")
        )
    )


def get_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def get_oracles() -> dict[str, str]:
    return dict(ORACLES)
