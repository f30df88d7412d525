"""General-graph analytics beyond the taxonomy hierarchy walkers
(operators/taxonomy.py): triangle counting / local clustering over a
co-occurrence graph, Pareto-dominance skylines, and rank-statistic AUC.

These are the reference's analysis-script family (scripts/analyze-tags.ts
pair counts are the 1-hop version; triangles are the 2-hop closure) plus
training-data-pipeline staples (classifier AUC without sklearn, dominance
frontiers for corpus selection), each expressed as shuffle-conscious
DataFrame plans with exact-integer cores so DuckDB oracles hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pdf_brain_spark.functions.guards import bounded_axis


def cooccurrence_edges(
    df: DataFrame, group_col: str, item_col: str
) -> DataFrame:
    """Undirected co-occurrence edge list (u < v): items sharing at least
    one group. Pair emission is per-group and bounded by the per-group
    item fan-out (C(k,2) for a k-item group), NOT by graph size — the
    property that keeps projection of a bipartite membership table
    subquadratic at 100 TB. Groups with pathological fan-out should be
    capped upstream (same argument as dedup.SHINGLE_DF_CAP)."""
    m = df.select(F.col(group_col).alias("_g"), F.col(item_col).alias("_i")).distinct()
    a = m.select(F.col("_g"), F.col("_i").alias("u"))
    b = m.select(F.col("_g").alias("_g2"), F.col("_i").alias("v"))
    return (
        a.join(b, (F.col("_g") == F.col("_g2")) & (F.col("u") < F.col("v")))
        .select("u", "v")
        .distinct()
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle count, degree, and local clustering coefficient
    over an undirected edge list (u < v, distinct).

    Node-id orientation: every triangle {x < y < z} is enumerated exactly
    once as wedge (x,y)+(y,z) closed by edge (x,z). Wedge generation is
    one equi-join on the middle node; closure is one equi-join on the
    (low, high) pair. At this scale the edge list broadcasts; at true
    100 TB swap node-id order for degree order (orient low-degree →
    high-degree), which bounds per-node wedge fan-out by O(sqrt(|E|))
    and keeps the wedge join skew-free — the classic MapReduce triangle
    algorithm. The lcc is the one float (2t / d(d-1), single division on
    exact integers → deterministic across engines).
    """
    e = edges.select("u", "v").localCheckpoint(eager=True)
    w = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = e.select(F.col("u").alias("b2"), F.col("v").alias("c"))
    e3 = e.select(F.col("u").alias("a3"), F.col("v").alias("c3"))
    tri = (
        w.join(F.broadcast(e2), F.col("b") == F.col("b2"))
        .join(
            F.broadcast(e3),
            (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")),
        )
        .select("a", "b", "c")
    )
    roles = (
        tri.select(F.col("a").alias("node"))
        .unionByName(tri.select(F.col("b").alias("node")))
        .unionByName(tri.select(F.col("c").alias("node")))
    )
    tcnt = roles.groupBy("node").agg(F.count(F.lit(1)).alias("triangles"))
    deg = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    t = F.coalesce(F.col("triangles"), F.lit(0))
    return (
        deg.join(tcnt, "node", "left")
        .select(
            "node",
            "degree",
            t.cast("long").alias("triangles"),
            F.when(
                F.col("degree") >= 2,
                F.round(
                    F.lit(2.0) * t / (F.col("degree") * (F.col("degree") - 1)), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("lcc"),
        )
    )


def skyline_2d(
    df: DataFrame,
    maximize_col: str,
    minimize_col: str,
) -> DataFrame:
    """Rows not Pareto-dominated: no other row has maximize_col >= AND
    minimize_col <= with at least one strict. Returns the input rows that
    sit on the frontier (ties on both dims all kept — neither strictly
    dominates).

    Distributed shape: one groupBy reduces the base table to a per-level
    minimum (|distinct maximize values| rows); the running frontier
    minimum over strictly-larger levels runs on the STITCHED prefix-min
    scan (operators/stitched.py, r12 — negated axis so DESC order is an
    ascending scan, exclusive frame) when the maximize dimension is
    integral, falling back to the guarded global window otherwise; the
    verdict joins back as a broadcast. No O(n²) dominance pairing,
    which is what makes a 100 TB skyline feasible — and with the
    stitched scan the frontier no longer needs the maximize dimension's
    cardinality to fit one task."""
    lvl = df.groupBy(maximize_col).agg(F.min(minimize_col).alias("_mmin"))
    if dict(df.dtypes).get(maximize_col) in (
        "tinyint", "smallint", "int", "bigint",
    ):
        from pdf_brain_spark.operators.stitched import stitched_prefix_min

        # Negate AFTER widening to long (ADVICE r12): -x on the type's
        # minimum (tinyint -128, int -2^31) overflows silently in
        # non-ANSI mode and would corrupt the frontier order; the long
        # cast makes every tinyint/smallint/int axis safe. The one
        # remaining edge — a bigint axis containing Long.MIN_VALUE
        # itself — cannot widen further and keeps the documented
        # limitation (no attested axis is within 2^62 of it).
        frontier = (
            stitched_prefix_min(
                lvl.withColumn("_neg", -F.col(maximize_col).cast("long")),
                "_neg",
                "_mmin",
                what="skyline maximize-dimension domain axis",
                inclusive=False,
            )
            .select(
                F.col(maximize_col).alias("_lvl"),
                "_mmin",
                F.col("_mmin_pmin").alias("_best_larger"),
            )
        )
    else:
        win = (
            Window.orderBy(F.col(maximize_col).desc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        frontier = lvl.select(
            F.col(maximize_col).alias("_lvl"),
            "_mmin",
            bounded_axis(
                F.min("_mmin").over(win),
                [F.col(maximize_col).desc()],
                "skyline maximize-dimension domain axis",
                safe_alternative="quantize the maximize dimension to a "
                "bounded grid before the frontier window",
            ).alias("_best_larger"),
        )
    return (
        df.join(F.broadcast(frontier), F.col(maximize_col) == F.col("_lvl"))
        .filter(
            (F.col(minimize_col) == F.col("_mmin"))
            & (
                F.col("_best_larger").isNull()
                | (F.col("_best_larger") > F.col(minimize_col))
            )
        )
        .drop("_lvl", "_mmin", "_best_larger")
    )


def grouped_auc(
    df: DataFrame,
    group_col: str,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Per-group ROC AUC of an integer score against a 0/1 label via the
    Mann-Whitney rank-sum — no sampling, no sklearn, exact.

    Tie handling in pure integers: with rank() = r and c tied rows at a
    score, the tie-averaged rank is r + (c-1)/2, so DOUBLED ranks
    2r + c - 1 stay integral; summing those over positives gives
    AUC = (S2 - n_pos(n_pos+1)) / (2 n_pos n_neg) with one float
    division at the end (exact integer operands < 2^53 → identical
    doubles on any engine). The rank window shuffles once on the group
    key; groups are independent, so skew is bounded by the largest
    group — salt or pre-aggregate per-score counts if one group
    dominates at 100 TB."""
    w_rank = Window.partitionBy(group_col).orderBy(F.col(score_col).asc())
    w_tie = Window.partitionBy(group_col, score_col)
    ranked = df.select(
        F.col(group_col),
        F.col(label_col).alias("_pos"),
        (
            F.lit(2) * F.rank().over(w_rank)
            + F.count(F.lit(1)).over(w_tie)
            - F.lit(1)
        ).alias("_r2"),
    )
    agg = ranked.groupBy(group_col).agg(
        F.sum(F.when(F.col("_pos") == 1, F.col("_r2")).otherwise(F.lit(0)))
        .cast("long")
        .alias("_s2"),
        F.sum("_pos").cast("long").alias("n_pos"),
        F.sum(F.lit(1) - F.col("_pos")).cast("long").alias("n_neg"),
    )
    num = (F.col("_s2") - F.col("n_pos") * (F.col("n_pos") + 1)).cast("double")
    den = F.lit(2.0) * F.col("n_pos") * F.col("n_neg")
    return (
        agg.filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
        .select(group_col, "n_pos", "n_neg", F.round(num / den, 6).alias("auc"))
    )


def hits_exact_int(
    edges: DataFrame,
    n_iter: int = 2,
    scale: int = 1_000_000,
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg 1999) in EXACT INTEGER micro-units
    — the hub/authority complement of taxonomy.pagerank_exact_int, with
    the same oracle-ability trick: quantizing the RECURRENCE itself to
    integer arithmetic makes engine summation order irrelevant, so a SQL
    twin can unroll the identical iterations and hash-match bit for bit.

    Recurrence (all integer, // = integer division):
        hub0(v)      = scale
        auth_raw(v)  = Σ_{(u,v)∈E} hub(u);  A = max_v auth_raw
        auth(v)      = (auth_raw(v) * scale) // A
        hub_raw(u)   = Σ_{(u,v)∈E} auth(v); H = max_u hub_raw
        hub(u)       = (hub_raw(u) * scale) // H
    Max-normalization (not L2) keeps every step in int64: raw sums are
    bounded by N·scale, and raw·scale stays < 2^63 for N < ~9e6 nodes at
    scale 1e6; larger graphs should drop scale or move to decimal(38).

    Plan shape per half-iteration: one groupBy shuffle on the gathered
    key with a map-side-combinable integer sum, a 1-row max aggregate
    broadcast back, and a left join onto the node set (nodes with no
    in/out edges hold score 0). The driver loop is over the FIXED
    iteration count only; localCheckpoint per iteration truncates
    lineage exactly like the PageRank loop.

    Returns (node, auth_micro, hub_micro) — exact int64."""
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    edges = edges.select("src", "dst").localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    hub = nodes.withColumn("h", F.lit(scale).cast("long"))
    auth = None
    for _ in range(n_iter):
        araw = (
            edges.join(hub, edges.src == hub.node)
            .groupBy(edges.dst.alias("node"))
            .agg(F.sum("h").alias("raw"))
        )
        amax = araw.agg(F.max("raw").alias("mx"))
        auth = (
            nodes.join(araw, "node", "left")
            .crossJoin(F.broadcast(amax))
            .select(
                "node",
                F.expr(f"(coalesce(raw, 0L) * {scale}) div mx")
                .cast("long")
                .alias("a"),
            )
            .localCheckpoint(eager=True)
        )
        hraw = (
            edges.join(auth, edges.dst == auth.node)
            .groupBy(edges.src.alias("node"))
            .agg(F.sum("a").alias("raw"))
        )
        hmax = hraw.agg(F.max("raw").alias("mx"))
        hub = (
            nodes.join(hraw, "node", "left")
            .crossJoin(F.broadcast(hmax))
            .select(
                "node",
                F.expr(f"(coalesce(raw, 0L) * {scale}) div mx")
                .cast("long")
                .alias("h"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        nodes.join(auth, "node")
        .join(hub, "node")
        .select(
            "node",
            F.col("a").alias("auth_micro"),
            F.col("h").alias("hub_micro"),
        )
    )


def label_propagation_exact(edges: DataFrame, n_iter: int = 2) -> DataFrame:
    """Fixed-iteration synchronous label propagation (Raghavan et al.
    2007) with a DETERMINISTIC tie rule: each node adopts the label
    most frequent among its neighbors, ties broken by the smallest
    label. LPA's usual nondeterminism comes from random tie-breaks and
    asynchronous sweeps; pinning both (synchronous, explicit tie order,
    fixed iteration count) makes the algorithm SQL-oracle-able — the
    twin unrolls the same iterations with the same row_number tie rule.

    `edges` must be DIRECTED-complete (both (u,v) and (v,u) present for
    an undirected graph). Initial label = the node's own id/name.

    Plan per iteration: one gather shuffle (edges ⋈ labels on the
    neighbor key, map-side-combinable counts) + one per-node argmax
    window whose frame is the node's distinct neighbor-label set —
    bounded by degree, never graph size. localCheckpoint per iteration
    truncates lineage like the PageRank/HITS loops."""
    edges = edges.select("u", "v").localCheckpoint(eager=True)
    nodes = edges.select(F.col("u").alias("node")).distinct().localCheckpoint(eager=True)
    labels = nodes.withColumn("lbl", F.col("node"))
    w = Window.partitionBy("node").orderBy(F.col("cnt").desc(), F.col("lbl").asc())
    for _ in range(n_iter):
        votes = (
            edges.join(labels, edges.v == labels.node)
            .groupBy(edges.u.alias("node"), "lbl")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        labels = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "lbl")
            .localCheckpoint(eager=True)
        )
    return labels
