"""Vector search operators — the load-bearing path of the reference.

Reference behavior being re-expressed (not ported):
  * ANN top-k probe + 3-way join to chunks/documents
    (LibSQLDatabase.ts:325-376) → here: exact brute-force cosine top-k as the
    correctness baseline (deterministic, oracle-able), with the scan→score→
    TakeOrderedAndProject plan Spark already executes optimally.
  * Over-fetch heuristics: tag-filtered searches fetch limit×3 candidates
    before the post-filter (LibSQLDatabase.ts:340), multi-scale fetches
    limit×2 (LibSQLDatabase.ts:226-227). Semantic knob, replicated.
  * Score threshold pushdown: score≥t ⇒ distance ≤ 2(1-t) in the WHERE
    (LibSQLDatabase.ts:359-368) — expressed as a filter Catalyst pushes
    below the sort.

Scale posture: a single query against N vectors is a scan + TakeOrdered —
O(N/executors), no shuffle of the fact table, only k rows to the driver.
Batched queries become a broadcast nested-loop similarity join
(`similarity_join`): the query side is broadcast, the vector side streams.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pdf_brain_spark.functions.vector import (
    cosine_distance,
    distance_to_score,
    score_threshold_to_distance,
)

OVERFETCH_TAG_FILTER = 3  # LibSQLDatabase.ts:340
OVERFETCH_MULTISCALE = 2  # LibSQLDatabase.ts:226-227


def topk_by_query_df(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    query_col: str = "query_vec",
    threshold: float | None = None,
) -> DataFrame:
    """Exact cosine top-k of `vectors` against a 1-row query DataFrame.

    The query side is crossJoin-broadcast (1 row), so the plan is:
    parquet scan → codegen'd score expr → [pushed threshold filter] →
    TakeOrderedAndProject(k). No shuffle.
    """
    q = F.broadcast(query)
    scored = vectors.crossJoin(q).withColumn(
        "distance", cosine_distance(F.col(vec_col), F.col(query_col))
    )
    if threshold is not None:
        scored = scored.filter(F.col("distance") <= F.lit(score_threshold_to_distance(threshold)))
    return (
        scored.withColumn("score", distance_to_score(F.col("distance")))
        .drop(query_col)
        .orderBy(F.col("distance").asc(), F.col("vec_id").asc())
        .limit(k)
    )


def topk(
    vectors: DataFrame,
    query_vec: list[float] | Column,
    k: int = 10,
    vec_col: str = "embedding",
    threshold: float | None = None,
    post_filter: Column | None = None,
) -> DataFrame:
    """Exact cosine top-k against a literal query vector, with the
    reference's over-fetch-then-post-filter semantics when `post_filter`
    is given (fetch k×3 candidates, filter, re-limit to k)."""
    if isinstance(query_vec, list):
        qcol = F.array(*[F.lit(float(x)) for x in query_vec])
        # literal query ⇒ dimension statically known ⇒ unrolled codegen'd
        # multiply-add chain instead of interpreted HOF (~4× on the scan)
        dim = len(query_vec)
    else:
        qcol, dim = query_vec, None
    scored = vectors.withColumn("distance", cosine_distance(F.col(vec_col), qcol, dim))
    if threshold is not None:
        scored = scored.filter(F.col("distance") <= F.lit(score_threshold_to_distance(threshold)))
    scored = scored.withColumn("score", distance_to_score(F.col("distance")))
    # vec_id tiebreaker everywhere: tied distances must select the same
    # candidate set as the oracle's ORDER BY d, vec_id
    if post_filter is not None:
        fetch = k * OVERFETCH_TAG_FILTER
        candidates = scored.orderBy(F.col("distance").asc(), F.col("vec_id").asc()).limit(fetch)
        return (
            candidates.filter(post_filter)
            .orderBy(F.col("distance").asc(), F.col("vec_id").asc())
            .limit(k)
        )
    return scored.orderBy(F.col("distance").asc(), F.col("vec_id").asc()).limit(k)


def similarity_join(
    queries: DataFrame,
    vectors: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    query_col: str = "query_vec",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batch top-k: every query row × every vector row, ranked per query.

    This is where Spark beats a one-query-at-a-time engine: thousands of
    queries amortize a single scan of the vector table. Query side is
    broadcast (small); scoring happens map-side in codegen, and the fat
    array columns are dropped BEFORE the rank window so the query_id
    shuffle carries only (query_id, vec_id, …scalars) — at 256 queries ×
    a fact-sized corpus that's the difference between shuffling hundreds
    of MB of float arrays and a few MB of scalars. Beyond exhaustive
    Q×N scoring, prune candidates with the IVF index (operators/ann.py)
    and re-rank exactly inside probed lists.
    """
    from pyspark.sql import Window

    scored = (
        vectors.crossJoin(F.broadcast(queries))
        .withColumn("distance", cosine_distance(F.col(vec_col), F.col(query_col)))
        .withColumn("score", distance_to_score(F.col("distance")))
        .drop(query_col, vec_col)
    )
    w = Window.partitionBy(query_id).orderBy(F.col("distance").asc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def topk_rows_tiebroken(dist_col, vid, take: int):
    """Indices of the `take` smallest entries under the total order
    (distance, vec_id) — the SAME order as the final merge window, so a
    distance tie straddling a batch's truncation boundary selects exactly
    the candidates the exhaustive plan would. argpartition finds the kth
    distance in O(B); only the tied tail (usually ~take rows) pays the
    lexsort."""
    import numpy as np

    b = dist_col.shape[0]
    if take >= b:
        cand = np.arange(b)
    else:
        part = np.argpartition(dist_col, take - 1)[:take]
        kth = dist_col[part].max()
        cand = np.flatnonzero(dist_col <= kth)
    order = np.lexsort((vid[cand], dist_col[cand]))
    return cand[order[:take]]


def topk_rows_tiebroken_batch(dist, vid, take: int):
    """Column-wise `topk_rows_tiebroken` for a B×Q distance matrix in ONE
    vectorized pass (r16 optimization, guide §4.2): the serving kernels
    previously looped `for each query: topk_rows_tiebroken(...)` in
    Python — Q interpreted iterations per Arrow batch.

    r17 (VERDICT r16 item 1): the first vectorization stable-argsorted
    EVERY row of every column — O(B·log B) per column where the
    per-query path paid O(B) argpartition + a tied-tail sort, a real
    asymptotic regression for the full-scan consumers (B = 32k codes
    per batch; driver: pq_adc_batch256_32k −17%, mmr_batch64 −15%)
    even though the small-B pruned-list consumers improved. This
    version keeps the single vectorized pass but restores the O(B)
    selection: ONE `np.argpartition(..., axis=0)` cuts every column to
    its `take` smallest, then only the take-row head is sorted — per
    column by (distance, vid-rank), so the output is the identical
    (distance, vec_id) total order. Columns where a distance tie
    straddles the partition boundary (detected exactly via the per-
    column kth value) fall back to a tie-inclusive per-column lexsort —
    the rare case under float distances, and each such sort touches
    only the take+ties candidate rows, never B.

    Equivalence is pinned by the tests/test_r16_optimizations.py fuzz
    (300 trials incl. heavy integer-distance ties, vs both the
    per-query path and a verbatim reference).
    Contract: distances are NaN-free — every caller scores normalized
    vectors/integer codes (the per-query path silently returned an
    EMPTY column when a NaN landed inside the argpartition boundary,
    so NaN inputs were never a supported regime there either).
    Returns a (min(take, B) × Q) matrix of row indices."""
    import numpy as np

    b, q = dist.shape
    if take >= b:
        # every row is selected: the output is all rows ordered by
        # (distance, vec_id) — a full stable sort is the work itself
        vord = np.argsort(vid, kind="stable")
        return vord[np.argsort(dist[vord], axis=0, kind="stable")]
    # Work QUERY-MAJOR (Q×B, C-contiguous rows): a lane-wise
    # argpartition over strided columns is ~2× slower than over
    # contiguous rows, and the BLAS/ADC kernels that call with
    # `dist.T` views make this transpose a zero-copy no-op.
    dt = np.ascontiguousarray(dist.T)
    # rank of each row in vid order: the secondary sort key (among tied
    # distances the smaller vec_id wins, matching the merge window)
    vord = np.argsort(vid, kind="stable")
    vrank = np.empty(b, dtype=np.int64)
    vrank[vord] = np.arange(b)
    # Two-point partition: placing BOTH the (take-1)-th and take-th
    # order statistics lets the boundary-tie test read just those two
    # values per query — no full Q×B "<= kth" mask pass (that mask cost
    # a second full sweep of the 64 MB matrix at B=32k, Q=256).
    part = np.argpartition(dt, (take - 1, take), axis=1)
    rows_ix = np.arange(q)
    kth = dt[rows_ix, part[:, take - 1]]
    nxt = dt[rows_ix, part[:, take]]
    out = np.empty((q, take), dtype=np.int64)
    easy = nxt > kth  # NaN-free contract: comparison is total here
    if easy.any():
        # no tie crosses the boundary: the head IS the selected set;
        # order it by (distance, vid-rank), all queries at once.
        erows = np.flatnonzero(easy)
        he = part[erows, :take]
        he = np.take_along_axis(he, np.argsort(vrank[he], axis=1), axis=1)
        hd = dt[erows[:, None], he]  # E×take gather, no E×B copy
        out[erows] = np.take_along_axis(he, np.argsort(hd, axis=1, kind="stable"), axis=1)
    for qi in np.flatnonzero(~easy):
        # tie straddles the boundary: sort the take+ties candidates
        # (row indices ascend = vid-rank NOT ascending; use lexsort)
        cand = np.flatnonzero(dt[qi] <= kth[qi])
        order = np.lexsort((vrank[cand], dt[qi, cand]))
        out[qi] = cand[order[:take]]
    return out.T


def similarity_join_topk(
    queries: DataFrame,
    vectors: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    query_col: str = "query_vec",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    batch_slack: int = 8,
    keep_vec: bool = False,
) -> DataFrame:
    """Vectorized batch top-k: the serving-path version of
    `similarity_join` for large query batches.

    ``keep_vec=True`` carries each candidate's vector through the
    partial-top-k shuffle (r13, for mmr_rerank_batch): the pandas batch
    already holds the vectors, so emitting them costs only shuffle bytes
    at partitions × Q × (k+slack) rows — still corpus-size-independent —
    and saves the consumer a second corpus scan to re-attach them.

    The pure-expression path scores with zip_with/aggregate, which Spark
    evaluates interpreted per row (higher-order functions are outside
    whole-stage codegen) — fine at 8 queries, dominant at 256+. Here the
    query batch (bounded: it is a *serving batch*, not a fact table) is
    collected to an L2-normalized numpy matrix and closed over an Arrow-
    batched mapInPandas: each batch scores as ONE BLAS matmul (B×d @ d×Q)
    and emits only its per-query partial top-(k+slack) rows, so the
    post-map shuffle is partitions × Q × k rows — independent of corpus
    size. A final rank window (distance, vec_id) merges partials exactly.

    Per-batch truncation breaks ties by (distance, vec_id) — the same
    total order as the merge window — so the result is byte-identical to
    the exhaustive `similarity_join` even under adversarial distance
    ties (slack is a perf knob, not a correctness crutch).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window

    q_rows = queries.select(query_id, query_col).collect()
    qids = np.array([r[0] for r in q_rows])
    qmat = np.asarray([r[1] for r in q_rows], dtype=np.float64)
    qmat = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    m_take = k + batch_slack

    def _partial_topk(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            raw = pdf[vec_col].to_numpy()
            vmat = np.asarray(list(raw), dtype=np.float64)
            vmat = vmat / np.linalg.norm(vmat, axis=1, keepdims=True)
            dist = 1.0 - vmat @ qmat.T  # B×Q cosine distance
            take = min(m_take, dist.shape[0])
            vid = pdf[id_col].to_numpy()
            # one vectorized (distance, vec_id) top-take per column — the
            # per-query Python loop this replaces produced the identical
            # rows in the identical order (see topk_rows_tiebroken_batch)
            rows = topk_rows_tiebroken_batch(dist, vid, take)
            t = rows.shape[0]
            flat = rows.T.reshape(-1)
            data = {
                query_id: np.repeat(qids, t),
                id_col: vid[flat],
                "distance": dist[rows, np.arange(len(qids))[None, :]].T.reshape(-1),
            }
            if keep_vec:
                data[vec_col] = list(raw[flat])
            yield pd.DataFrame(data)

    qid_type = dict(queries.dtypes)[query_id]
    id_type = dict(vectors.dtypes)[id_col]
    schema = f"{query_id} {qid_type}, {id_col} {id_type}, distance double"
    if keep_vec:
        schema += f", {vec_col} {dict(vectors.dtypes)[vec_col]}"
    partials = vectors.select(id_col, vec_col).mapInPandas(
        _partial_topk, schema=schema
    )
    w = Window.partitionBy(query_id).orderBy(F.col("distance").asc(), F.col(id_col).asc())
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("score", distance_to_score(F.col("distance")))
    )


def mmr_rerank(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_candidates: int = 30,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-marginal-relevance diversified top-k (Carbonell &
    Goldstein, SIGIR'98): greedily pick the candidate maximizing
    lam * rel(d) − (1−lam) * max_{s∈S} sim(d, s), so near-duplicate
    results don't crowd the top of a RAG context window. The reference's
    search surface returns raw similarity order (LibSQLDatabase.ts:
    325-376); MMR is the standard diversity layer on top of it.

    Two-stage distributed shape: stage 1 is the exact cosine top-N
    candidate fetch — the same scan → codegen'd score →
    TakeOrderedAndProject(N) plan as `topk` (no shuffle of the corpus;
    only N rows move). Stage 2 is the greedy selection, which is
    INHERENTLY sequential in k — it runs as one bounded applyInPandas
    task over the N candidate rows (N ≤ ~100 by construction, the same
    bounded-kernel discipline as the k-means fit). Both terms are on the
    engine's score scale 1 − d/2 ∈ [0, 1] — rel IS the search score, and
    the pairwise penalty is (1 + cos)/2. Raw cosine ∈ [−1, 1] in the
    penalty would PAY candidates for being anti-correlated with the
    selected set, so junk pointing away from everything outranks
    genuinely relevant diverse results. Both terms are rounded to 6
    decimals BEFORE selection so the greedy path is bit-reproducible
    across engines (the DuckDB oracle re-derives the identical selection
    from the same rounded values); ties break on the lower id.

    Returns (rank 1..k, id_col, rel, mmr_score) in selection order.
    """
    import numpy as np
    import pandas as pd

    cand = (
        topk_by_query_df(
            vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col)),
            vectors.sparkSession.createDataFrame(
                [([float(x) for x in query_vec],)], "query_vec array<double>"
            ),
            k=n_candidates,
            vec_col=vec_col,
        )
        .select(
            F.col("vec_id").alias(id_col),
            F.col(vec_col),
            F.round("score", 6).alias("rel"),
        )
        # single logical group: the greedy step needs ALL candidates in
        # one task — N is bounded, so this is a 1-task kernel by design
        .withColumn("_g", F.lit(0))
    )

    id_type = dict(vectors.dtypes)[id_col]
    greedy = _make_mmr_greedy(id_col, vec_col, float(lam), k)
    return (
        cand.groupBy("_g")
        .applyInPandas(
            greedy, schema=f"rank int, {id_col} {id_type}, rel double, mmr_score double"
        )
        .orderBy("rank")
    )


def _make_mmr_greedy(id_col: str, vec_col: str, lam: float, k: int, qid_col: str | None = None):
    """The bounded sequential MMR kernel shared by the single-query and
    batched paths: greedy over one candidate group's pandas frame, ties
    to the lowest id. When `qid_col` is given the group key (the query
    id) is emitted as the leading column.

    Cross-engine determinism is by EXACT INTEGER ARITHMETIC, not by
    rounding at a boundary: rel and the pairwise sims are 6-dp values,
    so both MMR terms are integer micro-units (rel6, sim6 ∈ [0, 1e6]),
    and λ is quantized to PARTS-PER-MILLION (λppm = round(λ·1e6) — a
    quantization error ≤ 5e-7, far below the 1e-6 score resolution, so
    any float λ is accepted). The objective λ·rel − (1−λ)·max_sim
    scaled by 1e6·1e6 is the exact int λppm·rel6 − (1e6−λppm)·sim6
    (≤ ~1e12, well inside int64) — the argmax compares integers. The
    micro-units themselves are derived HALF-AWAY-FROM-ZERO
    (floor(x·1e6 + 0.5) for these non-negative [0,1] values), the same
    rounding mode DuckDB's round() and Spark's F.round use — a plain
    np.round here is half-EVEN and differed from the oracle exactly at
    ...5e-7 boundaries (first caught by the 64-query batch oracle; the
    half-away derivation closes the class rather than betting the
    boundary is unreachable). The reported mmr_score is that integer / 1e12: for
    λ in tenths this is the identical double as the tenths-scaled form
    the oracles use (same real value, correctly rounded division)."""
    import numpy as np
    import pandas as pd

    lam_ppm = int(round(lam * 1_000_000))

    def _greedy(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
        ids = pdf[id_col].to_numpy()
        rel = pdf["rel"].to_numpy(dtype=np.float64)
        M = np.stack(pdf[vec_col].map(np.asarray).to_numpy()).astype(np.float64)
        M = M / (np.linalg.norm(M, axis=1, keepdims=True) + 1e-12)
        # 6-dp integer micro-units, half-away like DuckDB/Spark round
        # (inputs are non-negative, so floor(x*1e6 + 0.5) IS half-away):
        # exact integer arithmetic from here on
        sims6 = np.floor((1.0 + M @ M.T) / 2.0 * 1e6 + 0.5).astype(np.int64)
        rel6 = np.floor(rel * 1e6 + 0.5).astype(np.int64)
        order = np.argsort(ids, kind="stable")  # id-ascending tie-break base
        ids, rel, rel6 = ids[order], rel[order], rel6[order]
        sims6 = sims6[order][:, order]
        n = len(ids)
        chosen: list[int] = []
        out_rows = []
        remaining = list(range(n))
        for rank in range(1, min(k, n) + 1):
            if chosen:
                max_sim6 = np.max(sims6[np.ix_(remaining, chosen)], axis=1)
            else:
                max_sim6 = np.zeros(len(remaining), dtype=np.int64)
            mmr_i = lam_ppm * rel6[remaining] - (1_000_000 - lam_ppm) * max_sim6
            best = int(np.argmax(mmr_i))  # first max = lowest id
            pick = remaining[best]
            row = {
                "rank": rank,
                id_col: ids[pick],
                "rel": rel[pick],
                "mmr_score": float(int(mmr_i[best]) / 1e12),
            }
            if qid_col is not None:
                row[qid_col] = key[0]
            out_rows.append(row)
            chosen.append(pick)
            remaining.pop(best)
        cols = ([qid_col] if qid_col else []) + ["rank", id_col, "rel", "mmr_score"]
        return pd.DataFrame(out_rows, columns=cols)

    return _greedy


def mmr_rerank_batch(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_candidates: int = 30,
    lam: float = 0.7,
    query_id: str = "query_id",
    query_col: str = "query_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batched MMR — the serving-batch twin of `mmr_rerank`, matching the
    engine's batch shape everywhere else (similarity_join_topk,
    ivf_search_topk_batch): Q queries amortize ONE corpus pass for the
    candidate fetch and run Q independent bounded greedy kernels.

    Stage 1 fetches every query's exact top-n_candidates via the BLAS-
    batched partial-top-k scan (`similarity_join_topk` — one corpus
    pass, shuffle is partitions × Q × n rows) with ``keep_vec=True``,
    so each candidate's vector rides the partial-top-k shuffle instead
    of being re-attached by a second corpus scan + broadcast build (the
    r13 rewrite: ONE corpus pass total; the old stage-2 join paid a
    whole extra pass — and the broadcast build re-executed stage 1 —
    to fetch Q × n vectors the pandas batches already had in hand).
    Stage 2 groups by query id and runs the SAME greedy kernel as the
    single-query path per group (applyInPandas; each group is <= n rows
    by construction, so per-task state stays bounded however large Q
    grows). Scores/penalties/tie-breaks are identical to `mmr_rerank`,
    so a batch of one reproduces it exactly.

    Returns (query_id, rank 1..k, id_col, rel, mmr_score).
    """
    with_vec = (
        similarity_join_topk(
            queries,
            vectors,
            k=n_candidates,
            query_id=query_id,
            query_col=query_col,
            vec_col=vec_col,
            id_col=id_col,
            keep_vec=True,
        )
        .select(query_id, id_col, vec_col, F.round("score", 6).alias("rel"))
    )
    qid_type = dict(queries.dtypes)[query_id]
    id_type = dict(vectors.dtypes)[id_col]
    greedy = _make_mmr_greedy(id_col, vec_col, float(lam), k, qid_col=query_id)
    return (
        with_vec.groupBy(query_id)
        .applyInPandas(
            greedy,
            schema=(
                f"{query_id} {qid_type}, rank int, {id_col} {id_type}, "
                "rel double, mmr_score double"
            ),
        )
        .orderBy(query_id, "rank")
    )


def hard_negatives(
    vectors: DataFrame,
    anchors: DataFrame,
    k: int = 5,
    dup_threshold: float = 0.95,
    anchor_id: str = "anchor_id",
    anchor_col: str = "anchor_vec",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hard-negative mining for contrastive / embedding training: for
    each anchor, the most-similar OTHER vectors that are NOT near-
    duplicates — the negatives that actually carry gradient signal
    (easy random negatives are trivially separable; near-duplicates are
    false negatives that poison the loss). Standard practice in dense
    retrieval training (e.g. DPR, Karpukhin et al. 2020 mines hard
    negatives from BM25/ANN top results).

    Plan shape is the engine's batch-serving shape: anchors broadcast
    into one corpus scan, codegen'd cosine, then a per-anchor rank
    window over (distance, id). The near-dup exclusion compares the
    6-dp-ROUNDED score against the threshold so the boundary decision
    is identical across engines. Self-pairs are excluded by id, so an
    anchor drawn from the corpus never mines itself.

    Returns (anchor_id, id_col, rank 1..k, score) — score on the 1 − d/2
    scale, rounded 6."""
    from pyspark.sql import Window

    scored = (
        vectors.crossJoin(F.broadcast(anchors))
        .filter(F.col(id_col) != F.col(anchor_id))
        .withColumn("distance", cosine_distance(F.col(vec_col), F.col(anchor_col)))
        .withColumn("score", F.round(distance_to_score(F.col("distance")), 6))
        .filter(F.col("score") < F.lit(float(dup_threshold)))
        .drop(anchor_col, vec_col)
    )
    w = Window.partitionBy(anchor_id).orderBy(F.col("distance").asc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(anchor_id, id_col, "rank", "score")
    )
