"""Code-level scale guards (VERDICT r8 item 4).

A handful of gates compute windows with ``Window.orderBy(...)`` and NO
``partitionBy`` — a deliberate gate-exactness choice over axes that are
structurally bounded (distinct cent values, day buckets, a vocabulary,
a top-k shortlist). At 100 TB the failure mode of that choice is a
silent single-partition sort on an exploded axis. These helpers make it
LOUD instead: every unpartitioned window wires a row_number() over the
SAME single-partition sort (so the guard shares the exchange and the
sort — zero extra passes, zero extra actions) and raises at execution
time if the axis exceeds the bound, naming the scale-safe alternative.

The bound is per-site overridable; the default is far above any
attested axis (the largest real one is the distinct-cents axis, ~2e5 at
sf0.1) and far below where a single-partition sort would hurt an
executor (~1e6 rows of scalar tuples ≈ tens of MB).
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

AXIS_BOUND = 1_000_000


def bounded_axis(
    value: Column,
    order_cols,
    what: str,
    bound: int = AXIS_BOUND,
    safe_alternative: str = "partition the window or pre-aggregate the axis",
) -> Column:
    """Weld a bounded-axis assertion into a global-window expression.

    ``value`` is the windowed expression the site actually wants;
    ``order_cols`` is the SAME ordering its window uses (so the guard's
    row_number shares the single-partition exchange and sort). Returns
    ``value`` unchanged while the axis holds ≤ ``bound`` rows; raises a
    SparkRuntimeException naming the site and the scale-safe variant the
    moment it does not. The assert is woven INTO the consumed expression
    (a dropped guard column would be pruned by Catalyst and never run).

    A WORKING exemplar of the partition-and-stitch rewrite every
    ``safe_alternative`` describes ships in
    gates/r11.py::sessions_little_law_audit (r12): partition the axis by
    coarse time, run the prefix sum per partition, carry the per-
    partition aggregate through a coarse-grain cumulative window, and
    stitch the partition edges by joining each partition's successor's
    first row — proven row-identical to the global window in
    tests/test_temporal.py::test_little_law_stitched_sweep_equals_global.
    """
    w = Window.orderBy(*order_cols)
    rn = F.row_number().over(w)
    msg = (
        f"bounded_axis: {what} exceeded {bound} rows in a single-partition "
        f"window - gate-exactness assumption broken at this scale; "
        f"{safe_alternative} "
        f"(working exemplar: sessions_little_law_audit's stitched sweep)"
    )
    return F.when(F.assert_true(rn <= F.lit(bound), F.lit(msg)).isNull(), value)
