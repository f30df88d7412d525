"""bounded_axis guard (VERDICT r8 item 4): the ~20 deliberate
single-partition global windows must fail LOUDLY when their
structurally-bounded axis explodes, instead of silently sorting the
world in one task."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pdf_brain_spark.functions.guards import (
    AXIS_BOUND,
    BROADCAST_ROWS_BOUND,
    bounded_axis,
    bounded_broadcast,
)


def test_bounded_axis_passes_under_bound(spark):
    df = spark.range(100).select(F.col("id").alias("x"))
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    out = df.select(
        "x", bounded_axis(F.sum("x").over(w), ["x"], "test axis", bound=100).alias("c")
    )
    rows = out.orderBy("x").collect()
    assert rows[-1]["c"] == sum(range(100))


def test_bounded_axis_raises_over_bound(spark):
    df = spark.range(101).select(F.col("id").alias("x"))
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    out = df.select(
        "x",
        bounded_axis(
            F.sum("x").over(w), ["x"], "oversized synthetic axis", bound=100
        ).alias("c"),
    )
    with pytest.raises(Exception) as exc:
        out.collect()
    assert "bounded_axis" in str(exc.value)
    assert "oversized synthetic axis" in str(exc.value)


def test_bounded_axis_not_pruned_when_consumed_downstream(spark):
    """The assert is woven INTO the value expression — even when only an
    aggregate of the guarded column survives, the guard still runs."""
    df = spark.range(101).select(F.col("id").alias("x"))
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    out = (
        df.select(
            bounded_axis(F.sum("x").over(w), ["x"], "pruned-path axis", bound=100).alias("c")
        )
        .agg(F.max("c").alias("m"))
    )
    with pytest.raises(Exception) as exc:
        out.collect()
    assert "bounded_axis" in str(exc.value)


def test_default_bound_is_sane():
    assert AXIS_BOUND == 1_000_000


# ---------------------------------------------------------------------------
# bounded_broadcast (VERDICT r14 item 5): the vocabulary-grain LM
# force-broadcasts must fail LOUDLY, by site name and with the remedy in
# the message, the moment a corpus breaks the Heaps-law sublinearity
# assumption — instead of failing opaquely inside Spark's broadcast
# machinery (or, worse, slowly succeeding).
# ---------------------------------------------------------------------------


def _lm_shaped(spark, n_types: int):
    """A miniature of the LM gates' shape: a term-grain table carrying a
    1-row-aggregate type count (the column the guard rides), joined back
    onto a token stream."""
    toks = spark.range(50).select((F.col("id") % 10).alias("term"))
    stats = toks.agg(
        F.count(F.lit(1)).alias("total"),
        F.lit(n_types).cast("long").alias("_vocab"),
    )
    return (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .crossJoin(F.broadcast(stats))
    )


def test_bounded_broadcast_passes_under_ceiling(spark):
    lm = _lm_shaped(spark, n_types=10).select(
        "term",
        bounded_broadcast(
            F.col("tf").cast("long"), F.col("_vocab"), "test LM", bound=100
        ).alias("tf_g"),
    )
    rows = lm.orderBy("term").collect()
    assert len(rows) == 10 and all(r["tf_g"] == 5 for r in rows)


def test_bounded_broadcast_raises_over_ceiling(spark):
    """The over-ceiling path: a vocab count at/above the bound raises by
    site name with the drop-the-hint remedy in the message."""
    lm = _lm_shaped(spark, n_types=100).select(
        "term",
        bounded_broadcast(
            F.col("tf").cast("long"), F.col("_vocab"),
            "oversized synthetic LM broadcast", bound=100
        ).alias("tf_g"),
    )
    with pytest.raises(Exception) as exc:
        lm.collect()
    msg = str(exc.value)
    assert "bounded_broadcast" in msg
    assert "oversized synthetic LM broadcast" in msg
    assert "drop the F.broadcast hint" in msg


def test_bounded_broadcast_not_pruned_when_aggregated(spark):
    """Woven into the consumed expression: even when only an aggregate
    of the guarded column survives, the guard still runs."""
    lm = _lm_shaped(spark, n_types=100).select(
        bounded_broadcast(
            F.col("tf").cast("long"), F.col("_vocab"),
            "pruned-path LM broadcast", bound=100
        ).alias("tf_g"),
    ).agg(F.sum("tf_g").alias("s"))
    with pytest.raises(Exception) as exc:
        lm.collect()
    assert "bounded_broadcast" in str(exc.value)


def test_broadcast_bound_is_inside_sparks_ceiling():
    """20M type rows ~ 2 GB at ~100 B/row — the tripwire fires well
    inside Spark's 8 GB broadcast limit, so OUR error wins the race."""
    assert BROADCAST_ROWS_BOUND == 20_000_000
