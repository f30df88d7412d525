"""Planted-answer and randomized-reference tests for operators/graph.py
(triangles / skyline / AUC) and dedup.containment_pairs."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from pdf_brain_spark.operators.dedup import containment_pairs
from pdf_brain_spark.operators.graph import (
    cooccurrence_edges,
    grouped_auc,
    skyline_2d,
    triangle_counts,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame([(int(u), int(v)) for u, v in pairs], "u long, v long")


def test_triangles_k4_plus_pendant(spark):
    # K4 on {1,2,3,4} plus pendant 5-1: node 1 sees 3 triangles over
    # degree 4 (lcc 0.5), nodes 2-4 are fully clustered, 5 has none.
    k4 = list(itertools.combinations([1, 2, 3, 4], 2))
    out = {
        r["node"]: r
        for r in triangle_counts(_edges_df(spark, k4 + [(1, 5)])).collect()
    }
    assert out[1]["degree"] == 4 and out[1]["triangles"] == 3
    assert abs(out[1]["lcc"] - 0.5) < 1e-9
    for n in (2, 3, 4):
        assert out[n]["degree"] == 3 and out[n]["triangles"] == 3
        assert abs(out[n]["lcc"] - 1.0) < 1e-9
    assert out[5]["degree"] == 1 and out[5]["triangles"] == 0 and out[5]["lcc"] == 0.0


def test_triangles_path_graph_has_none(spark):
    out = triangle_counts(_edges_df(spark, [(1, 2), (2, 3), (3, 4)])).collect()
    assert all(r["triangles"] == 0 and r["lcc"] == 0.0 for r in out)


def test_triangles_randomized_vs_bruteforce(spark):
    rng = random.Random(81)
    for _ in range(3):
        nodes = list(range(12))
        edges = sorted(
            {p for p in itertools.combinations(nodes, 2) if rng.random() < 0.35}
        )
        eset = set(edges)
        want = {n: 0 for n in nodes}
        for a, b, c in itertools.combinations(nodes, 3):
            if (a, b) in eset and (b, c) in eset and (a, c) in eset:
                want[a] += 1
                want[b] += 1
                want[c] += 1
        got = {r["node"]: r["triangles"] for r in triangle_counts(_edges_df(spark, edges)).collect()}
        deg = {n: sum(1 for e in edges if n in e) for n in nodes}
        for n in nodes:
            if deg[n] > 0:
                assert got[n] == want[n], (n, got[n], want[n])


def test_cooccurrence_edges_distinct_and_ordered(spark):
    df = spark.createDataFrame(
        [("g1", "a"), ("g1", "b"), ("g1", "c"), ("g2", "b"), ("g2", "c"), ("g2", "c")],
        "g string, item string",
    )
    got = sorted(tuple(r) for r in cooccurrence_edges(df, "g", "item").collect())
    assert got == [("a", "b"), ("a", "c"), ("b", "c")]


def test_skyline_planted_frontier(spark):
    rows = [(1, 10, 5), (2, 10, 7), (3, 9, 4), (4, 9, 6), (5, 8, 4), (6, 7, 3)]
    df = spark.createDataFrame(rows, "id long, size long, price long")
    got = sorted(r["id"] for r in skyline_2d(df, "size", "price").collect())
    # (8,4) is dominated by (9,4); (10,7) and (9,6) by cheaper same-size rows
    assert got == [1, 3, 6]


def test_skyline_keeps_exact_ties(spark):
    df = spark.createDataFrame(
        [(1, 10, 5), (2, 10, 5), (3, 9, 9)], "id long, size long, price long"
    )
    got = sorted(r["id"] for r in skyline_2d(df, "size", "price").collect())
    assert got == [1, 2]


def test_skyline_non_integral_fallback_branch(spark):
    """ADVICE r12: skyline_2d forks on the maximize column's dtype —
    integral axes take the stitched prefix-min scan, everything else
    the guarded global window. Both skyline tests above use long, so
    this pins the FALLBACK branch (decimal maximize) to the same
    frontier the integral path yields on the same planted data."""
    rows = [(1, 10, 5), (2, 10, 7), (3, 9, 4), (4, 9, 6), (5, 8, 4), (6, 7, 3)]
    df = spark.createDataFrame(rows, "id long, size long, price long")
    dec = df.withColumn("size", F.col("size").cast("decimal(10,2)"))
    assert dict(dec.dtypes)["size"] == "decimal(10,2)"
    got = sorted(r["id"] for r in skyline_2d(dec, "size", "price").collect())
    assert got == [1, 3, 6]


def test_skyline_integral_min_value_axis(spark):
    """ADVICE r12: the stitched branch negates the maximize axis; on the
    dtype's minimum value a same-width negation would overflow silently
    in non-ANSI mode. The long widening makes int extremes exact — the
    frontier with INT_MIN present must match the fallback's answer."""
    int_min = -(2**31)
    rows = [(1, int_min, 1), (2, 0, 5), (3, 5, 3)]
    df = spark.createDataFrame(rows, "id long, size int, price long")
    got = sorted(r["id"] for r in skyline_2d(df, "size", "price").collect())
    # (0,5) dominated by (5,3); INT_MIN row survives (cheapest overall)
    assert got == [1, 3]


def test_auc_planted_extremes_and_ties(spark):
    rows = (
        [("sep", 1, s) for s in (3, 4)]
        + [("sep", 0, s) for s in (1, 2)]
        + [("inv", 1, s) for s in (1, 2)]
        + [("inv", 0, s) for s in (3, 4)]
        + [("tie", 1, 7), ("tie", 1, 7), ("tie", 0, 7), ("tie", 0, 7)]
        + [("mix", 1, 2), ("mix", 1, 3), ("mix", 0, 1), ("mix", 0, 2)]
    )
    df = spark.createDataFrame(rows, "g string, label int, score long")
    got = {r["g"]: r["auc"] for r in grouped_auc(df, "g", "score", "label").collect()}
    assert got["sep"] == 1.0
    assert got["inv"] == 0.0
    assert got["tie"] == 0.5
    assert abs(got["mix"] - 0.875) < 1e-9


def test_auc_randomized_vs_pairwise_definition(spark):
    rng = random.Random(4099)
    rows = []
    want = {}
    for g in ("g0", "g1", "g2"):
        pos = [rng.randrange(8) for _ in range(rng.randrange(3, 20))]
        neg = [rng.randrange(8) for _ in range(rng.randrange(3, 20))]
        rows += [(g, 1, s) for s in pos] + [(g, 0, s) for s in neg]
        num = sum(
            1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg
        )
        want[g] = num / (len(pos) * len(neg))
    df = spark.createDataFrame(rows, "g string, label int, score long")
    got = {r["g"]: r["auc"] for r in grouped_auc(df, "g", "score", "label").collect()}
    for g, w in want.items():
        assert abs(got[g] - w) < 1e-6, (g, got[g], w)


def test_containment_planted_subset_doc(spark):
    # B's first five tokens ARE A, so all 3 of A's trigrams land in B's 6.
    docs = spark.createDataFrame(
        [
            (1, "w1 w2 w3 w4 w5"),
            (2, "w1 w2 w3 w4 w5 x1 x2 x3"),
            (3, "z1 z2 z3 z4"),
        ],
        "doc_id long, text string",
    )
    got = containment_pairs(docs, threshold=0.5).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["doc_a"], r["doc_b"], r["common_shingles"]) == (1, 2, 3)
    assert r["containment_a"] == 1.0 and r["containment_b"] == 0.5


def test_containment_threshold_is_on_larger_side(spark):
    # Overlap 1 shingle: sizes 2 and 3 -> containments 0.5 / 0.333; the
    # pair must clear threshold 0.5 via the LARGER side only.
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "q a b c r")], "doc_id long, text string"
    )
    got = containment_pairs(docs, threshold=0.5).collect()
    assert len(got) == 1 and got[0]["containment_a"] == 0.5


def test_containment_df_cap_drops_stop_shingles(spark):
    # A shingle shared by 3 docs with cap 2 contributes to no pair.
    docs = spark.createDataFrame(
        [(i, "s1 s2 s3") for i in (1, 2, 3)], "doc_id long, text string"
    )
    assert containment_pairs(docs, threshold=0.1, df_cap=2).count() == 0
    assert containment_pairs(docs, threshold=0.1, df_cap=3).count() == 3


def _hits_model(edges, n_iter=2, scale=1_000_000):
    # Pure-python replay of hits_exact_int's integer recurrence.
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    hub = {n: scale for n in nodes}
    auth = {}
    for _ in range(n_iter):
        raw = {n: 0 for n in nodes}
        for u, v in edges:
            raw[v] += hub[u]
        mx = max(raw.values())
        auth = {n: (raw[n] * scale) // mx for n in nodes}
        raw = {n: 0 for n in nodes}
        for u, v in edges:
            raw[u] += auth[v]
        mx = max(raw.values())
        hub = {n: (raw[n] * scale) // mx for n in nodes}
    return auth, hub


def test_hits_star_graph_center_is_authority(spark):
    # Star: leaves 2..6 all point at 1 — node 1 is the unique authority
    # (max-normalized to exactly scale), leaves are the equal hubs.
    from pdf_brain_spark.operators.graph import hits_exact_int

    edges = [(i, 1) for i in range(2, 7)]
    df = spark.createDataFrame(edges, "src long, dst long")
    out = {r["node"]: r for r in hits_exact_int(df, n_iter=2).collect()}
    assert out[1]["auth_micro"] == 1_000_000 and out[1]["hub_micro"] == 0
    for leaf in range(2, 7):
        assert out[leaf]["auth_micro"] == 0
        assert out[leaf]["hub_micro"] == 1_000_000


def test_hits_randomized_vs_python_model(spark):
    from pdf_brain_spark.operators.graph import hits_exact_int

    rng = random.Random(417)
    for _ in range(3):
        nodes = list(range(1, 15))
        edges = sorted(
            {
                (u, v)
                for u in nodes
                for v in nodes
                if u != v and rng.random() < 0.2
            }
        )
        if not edges:
            continue
        want_auth, want_hub = _hits_model(edges, n_iter=2)
        df = spark.createDataFrame(
            [(int(u), int(v)) for u, v in edges], "src long, dst long"
        )
        got = {r["node"]: r for r in hits_exact_int(df, n_iter=2).collect()}
        assert set(got) == set(want_auth)
        for n in want_auth:
            assert got[n]["auth_micro"] == want_auth[n], (n, edges)
            assert got[n]["hub_micro"] == want_hub[n], (n, edges)
