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
