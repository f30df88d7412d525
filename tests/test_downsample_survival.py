"""Planted-answer and pure-python second-opinion tests for M4
downsampling, lead-lag correlation, Gini, and Kaplan-Meier survival."""

from __future__ import annotations

import datetime
import math
import random
from collections import Counter, defaultdict

import duckdb

from pdf_brain_spark.operators.analytics import grouped_gini
from pdf_brain_spark.operators.temporal import kaplan_meier

SF_DIR = "/root/testdata/sf0.001"


def _ts(m):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=m)


def test_m4_planted_bucket(spark):
    rows = [
        (1, _ts(0), "a", 5.0),
        (2, _ts(10), "a", 9.0),
        (3, _ts(20), "a", 1.0),
        (4, _ts(50), "a", 7.0),
        (5, _ts(70), "a", 2.0),  # second hour bucket
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, event_type string, value double"
    )
    df.createOrReplaceTempView("_m4_events")
    from pyspark.sql import functions as F

    g = (
        df.groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.min(F.struct("ts", "event_id", "value")).alias("_f"),
            F.max(F.struct("ts", "event_id", "value")).alias("_l"),
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
        )
        .select(
            "bucket",
            F.col("_f.value").alias("v_first"),
            F.col("_l.value").alias("v_last"),
            "v_min",
            "v_max",
        )
        .orderBy("bucket")
        .collect()
    )
    assert (g[0]["v_first"], g[0]["v_last"], g[0]["v_min"], g[0]["v_max"]) == (
        5.0, 7.0, 1.0, 9.0,
    )
    assert (g[1]["v_first"], g[1]["v_last"], g[1]["v_min"], g[1]["v_max"]) == (
        2.0, 2.0, 2.0, 2.0,
    )


def test_lead_lag_python_reference(spark):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_type, ts FROM '{SF_DIR}/events.parquet' "
        "WHERE event_type IN ('click','purchase')"
    ).fetchall()
    hour = datetime.timedelta(hours=1)

    def bucket(t):
        return t.replace(minute=0, second=0, microsecond=0)

    cx = Counter(bucket(t) for et, t in rows if et == "click")
    cy = Counter(bucket(t) for et, t in rows if et == "purchase")
    lo = min(min(cx), min(cy))
    hi = max(max(cx), max(cy))
    axis = []
    b = lo
    while b <= hi:
        axis.append(b)
        b += hour
    want = {}
    for lag in range(-3, 4):
        pts = [
            (cx.get(b, 0), cy.get(b + lag * hour, 0))
            for b in axis
            if lo <= b + lag * hour <= hi
        ]
        n = len(pts)
        sx = sum(p[0] for p in pts)
        sy = sum(p[1] for p in pts)
        sxx = sum(p[0] ** 2 for p in pts)
        syy = sum(p[1] ** 2 for p in pts)
        sxy = sum(p[0] * p[1] for p in pts)
        dx, dy = n * sxx - sx * sx, n * syy - sy * sy
        want[lag] = (
            (n * sxy - sx * sy) / math.sqrt(dx * dy) if dx > 0 and dy > 0 else None
        )
    from pdf_brain_spark.queries import get_queries, lookup_query

    got = {
        r["lag_hours"]: r
        for r in lookup_query("events_lead_lag_correlation")(
            spark, SF_DIR
        ).collect()
    }
    assert set(got) == set(want)
    for lag, w in want.items():
        assert got[lag]["n"] == len(
            [b for b in axis if lo <= b + lag * hour <= hi]
        )
        if w is None:
            assert got[lag]["r"] is None
        else:
            assert abs(got[lag]["r"] - w) < 1e-6, lag


def test_gini_planted_extremes(spark):
    rows = [("eq", x) for x in (5, 5, 5, 5)] + [
        ("one", v) for v in (0, 0, 0, 0, 100)
    ]
    df = spark.createDataFrame(rows, "k string, v long")
    got = {r["k"]: r for r in grouped_gini(df, "k", "v").collect()}
    assert got["eq"]["gini"] == 0.0
    # one owner of everything among n=5: G = (n-1)/n = 0.8
    assert got["one"]["gini"] == 0.8
    assert got["one"]["total"] == 100


def test_gini_randomized_vs_python(spark):
    rng = random.Random(314)
    rows, want = [], {}
    for k in ("a", "b"):
        xs = [rng.randrange(0, 1000) for _ in range(rng.randrange(5, 60))]
        rows += [(k, x) for x in xs]
        xs.sort()
        n, sx = len(xs), sum(xs)
        six = sum((i + 1) * x for i, x in enumerate(xs))
        want[k] = (2 * six - (n + 1) * sx) / (n * sx)
    df = spark.createDataFrame(rows, "k string, v long")
    got = {r["k"]: r["gini"] for r in grouped_gini(df, "k", "v").collect()}
    for k, w in want.items():
        assert abs(got[k] - w) < 1e-6, k


def test_kaplan_meier_textbook(spark):
    # classic: durations (event=1 unless noted): 6,6,6,6*cens,7,9*cens,10,
    # 10*cens,11*cens,13 -> S(6)=(10-3)/10=0.7, S(7)=0.7*(6-1)/6=0.58333,
    # S(10)=0.58333*(4-1)/4=0.4375, S(13)=0.4375*(1-1)/1=0
    spans = [
        (6, 1), (6, 1), (6, 1), (6, 0), (7, 1), (9, 0), (10, 1), (10, 0),
        (11, 0), (13, 1),
    ]
    df = spark.createDataFrame(spans, "t long, ev int")
    got = {r["t"]: r for r in kaplan_meier(df, "t", "ev").collect()}
    assert set(got) == {6, 7, 10, 13}
    assert got[6]["at_risk"] == 10 and got[6]["deaths"] == 3
    assert abs(got[6]["survival"] - 0.7) < 1e-5
    assert got[7]["at_risk"] == 6
    assert abs(got[7]["survival"] - 0.7 * 5 / 6) < 1e-5
    assert got[10]["at_risk"] == 4
    assert abs(got[10]["survival"] - 0.7 * (5 / 6) * (3 / 4)) < 1e-5
    assert got[13]["at_risk"] == 1 and got[13]["survival"] == 0.0


def test_kaplan_meier_randomized_vs_product(spark):
    rng = random.Random(2718)
    spans = [
        (rng.randrange(1, 15), rng.randrange(0, 2)) for _ in range(60)
    ]
    if not any(ev for _, ev in spans):
        spans.append((3, 1))
    df = spark.createDataFrame(spans, "t long, ev int")
    got = {r["t"]: r for r in kaplan_meier(df, "t", "ev").collect()}
    per_t = defaultdict(lambda: [0, 0])
    for t, ev in spans:
        per_t[t][0] += ev
        per_t[t][1] += 1
    total, s = len(spans), 1.0
    removed = 0
    for t in sorted(per_t):
        d, leaving = per_t[t]
        at_risk = total - removed
        removed += leaving
        if d == 0:
            continue
        s *= (at_risk - d) / at_risk
        assert got[t]["at_risk"] == at_risk and got[t]["deaths"] == d
        assert abs(got[t]["survival"] - s) < 1e-4, t
