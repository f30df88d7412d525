"""bounded_axis guard (VERDICT r8 item 4): the ~20 deliberate
single-partition global windows must fail LOUDLY when their
structurally-bounded axis explodes, instead of silently sorting the
world in one task."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from pdf_brain_spark.functions.guards import AXIS_BOUND, bounded_axis


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
