"""Skew-handling utilities (SURVEY §4: "skewed keys hurt; salting for
skew, AQE for runtime re-plan").

AQE's skew-join splitting (on in session.py) handles sort-merge skew
automatically; `salted_join` is the explicit variant for the cases AQE
can't fix — e.g. a hot key on the build side of an aggregation-feeding
join, or a skewed broadcast-miss join where one key holds >1 partition of
rows. The salt fans ONE hot key across n_salts reducers at the cost of
replicating the small side n_salts×.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str | list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the large side's rows spread across n_salts salt
    buckets per key and the small side replicated n_salts×. Result equals
    `large.join(small, key, how)` for inner/left joins.

    Salt = pmod(hash(all large-side columns), n) — deterministic per row
    content, uniform for the hot key's row population.
    """
    keys = [key] if isinstance(key, str) else list(key)
    salt_src: list[Column] = [F.col(c) for c in large.columns]
    salted_large = large.withColumn("_salt", F.pmod(F.hash(*salt_src), F.lit(n_salts)))
    exploded_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_large.join(exploded_small, keys + ["_salt"], how).drop("_salt")


def skew_profile(
    df,
    key_col: str,
    top_n: int = 10,
):
    """Key-distribution diagnostic — the measurement that DECIDES between
    the plain and salted variants of the join/sessionize operators in
    this module (salting costs a second pass; paying it on a uniform key
    is pure waste, skipping it on a hot key is the 100 TB stall).

    One shuffle (groupBy key) produces per-key counts; everything after
    operates on the per-key count table, which is |distinct keys| rows —
    already reduced. Output rows, in one tall frame:
      ('total_rows' | 'distinct_keys' | 'max_share_ppm' | 'p50' | 'p90'
       | 'p99' | 'max', NULL, metric value)           — summary rows
      ('hot_key', <key as string>, count)             — top_n hot keys
    max_share_ppm is the hottest key's row share in parts-per-million —
    the single number to alarm on (a perfectly uniform key space scores
    1e6 / distinct_keys).

    Exact by design (count, exact percentiles via median-of-counts SQL
    percentile, deterministic top-n with count-then-key ordering) so the
    whole report is SQL-oracle-able; at 100 TB swap the exact percentile
    for approx_percentile and the semantics note in the report stays the
    same shape.
    """
    from pyspark.sql import functions as F

    counts = df.groupBy(F.col(key_col).cast("string").alias("k")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    # summary over the reduced count table: scalar aggregate, 1 row
    summary = counts.agg(
        F.sum("cnt").alias("total_rows"),
        F.count(F.lit(1)).alias("distinct_keys"),
        F.max("cnt").alias("max_cnt"),
        F.expr("percentile(cnt, 0.5)").alias("p50"),
        F.expr("percentile(cnt, 0.9)").alias("p90"),
        F.expr("percentile(cnt, 0.99)").alias("p99"),
    )
    tall = summary.selectExpr(
        "stack(7, "
        "'total_rows', CAST(total_rows AS DOUBLE), "
        "'distinct_keys', CAST(distinct_keys AS DOUBLE), "
        "'max_share_ppm', round(max_cnt * 1e6 / total_rows, 2), "
        "'p50', CAST(p50 AS DOUBLE), "
        "'p90', CAST(p90 AS DOUBLE), "
        "'p99', CAST(p99 AS DOUBLE), "
        "'max', CAST(max_cnt AS DOUBLE)"
        ") AS (kind, value)"
    ).select("kind", F.lit(None).cast("string").alias("key"), "value")
    hot = (
        counts.orderBy(F.col("cnt").desc(), F.col("k").asc())
        .limit(top_n)
        .select(
            F.lit("hot_key").alias("kind"),
            F.col("k").alias("key"),
            F.col("cnt").cast("double").alias("value"),
        )
    )
    return tall.unionByName(hot)
