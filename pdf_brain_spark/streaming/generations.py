"""Generation protocol for the streaming-maintained persisted indexes
(LSH band index, ANN IVF index, rollup partials).

Every foreachBatch writer lands its micro-batch under `batch_id=N` (N >= 0,
monotone from the stream checkpoint) — the replay-idempotence protocol
attested in streaming/events.py. Compaction adds one rule on top so that
CONCURRENT READERS are safe at every instant, without a transactional
table format:

  * a compacted generation is written under a NEGATIVE id, `batch_id=-m`,
    and declares that it REPLACES every generation covering <= m — i.e.
    every positive generation b <= m and every older compacted generation
    -m' with m' < m;
  * the consolidated data is first written to a dot-prefixed temp dir
    (invisible to the generation listing) and then RENAMED to
    `batch_id=-m` — a single-directory rename, atomic on local disk and
    HDFS — so the new generation appears all-at-once;
  * superseded directories are deleted only AFTER the rename. A reader
    that resolves the live set through `live_generation_ids` therefore
    sees either the pre-compaction set or the post-compaction set, never
    a mixture: before the rename the negative generation does not exist
    and the positive ones do; after it, precedence excludes the doomed
    positive dirs whether or not their deletes have completed.

Negative ids can never collide with future stream batches (those are
always >= 0), which closes the hole the previous rename-into-
`batch_id=max` design had: nothing the stream will ever write shares a
name with a compacted generation.

Crash recovery is a cleanup, not a repair: if the compactor dies between
rename and deletes, the stale positive dirs are invisible to readers
(precedence) and the next compaction sweep removes them.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    HPath = jvm.org.apache.hadoop.fs.Path
    return HPath, HPath(path).getFileSystem(conf)


def generation_ids(spark: SparkSession, index_dir: str) -> list[int]:
    """All `batch_id=<int>` generation ids present under index_dir
    (positive stream batches and negative compacted generations),
    via the Hadoop FileSystem API so the same code serves local disk,
    HDFS, and object stores. [] if the directory doesn't exist."""
    HPath, fs = _fs(spark, index_dir)
    if not fs.exists(HPath(index_dir)):
        return []
    out = []
    for st in fs.listStatus(HPath(index_dir)):
        name = st.getPath().getName()
        if not name.startswith("batch_id="):
            continue
        try:
            out.append(int(name.split("=", 1)[1]))
        except ValueError:
            continue
    return sorted(out)


def coverage(gen_id: int) -> int:
    """The highest stream batch a generation accounts for: a positive
    generation covers itself; a compacted generation -m covers 0..m."""
    return -gen_id if gen_id < 0 else gen_id


def live_generation_ids(ids: list[int]) -> list[int]:
    """Apply compaction precedence to a raw generation listing: the
    newest compacted generation -m* (largest coverage among negatives)
    replaces every generation covering <= m*. Returns the live set —
    [-m*] plus every positive batch > m* — or all positives when no
    compacted generation exists. Reading exactly this set yields each
    row exactly once at ANY point of a compaction or a post-crash
    state."""
    negs = [g for g in ids if g < 0]
    if not negs:
        return sorted(ids)
    m_star = max(coverage(g) for g in negs)
    return sorted([-m_star] + [g for g in ids if g >= 0 and g > m_star])


def live_generation_dirs(spark: SparkSession, index_dir: str) -> list[str]:
    """Paths of the live generations (precedence applied)."""
    return [
        f"{index_dir}/batch_id={g}"
        for g in live_generation_ids(generation_ids(spark, index_dir))
    ]


def compact_generations(
    spark: SparkSession,
    index_dir: str,
    upto_batch_id: int,
    rewrite,
    min_sources: int = 2,
) -> int:
    """Reader-safe compaction driver shared by the band-index, ANN-index,
    and rollup compactors. Merges every LIVE generation covering
    <= upto_batch_id into one compacted generation `batch_id=-m`
    (m = the highest coverage merged), with the write → rename → delete
    ordering documented in the module docstring. `rewrite(src_dirs,
    tmp_dir)` owns the data movement (each index keeps its own layout:
    coalesce for band rows, partitionBy(list_id) for ANN lists).

    Only compact batches the stream's checkpoint has committed — a
    replayed batch overwrites its positive dir, so compacting an
    in-flight batch would freeze a possibly-partial copy into the
    compacted generation. Returns the number of generations merged
    (0 = nothing to do; stale superseded dirs are still swept).

    `min_sources` is the rewrite threshold: plain merges skip a single
    live generation (nothing to consolidate), while rewrites that change
    the DATA LAYOUT (e.g. an IVF centroid refit reassigning list_id)
    pass 1 — a lone generation still needs the rewrite."""
    HPath, fs = _fs(spark, index_dir)
    all_ids = generation_ids(spark, index_dir)
    live = live_generation_ids(all_ids)
    sources = [g for g in live if coverage(g) <= upto_batch_id]
    # sweep dirs already superseded by precedence (post-crash leftovers):
    # invisible to readers, so deleting them is always safe
    for g in set(all_ids) - set(live):
        fs.delete(HPath(f"{index_dir}/batch_id={g}"), True)
    if len(sources) < max(min_sources, 1):
        return 0
    m = max(coverage(g) for g in sources)
    if sources == [-m]:
        # the lone source IS the compacted generation at this coverage —
        # the target name would collide with a live source, and replacing
        # a directory in place cannot be made reader-safe on a plain
        # filesystem. No data has arrived since that generation was
        # written, so a layout rewrite should be driven AFTER the next
        # batch lands (its positive dir makes the target id fresh).
        return 0
    src_dirs = [f"{index_dir}/batch_id={g}" for g in sources]
    tmp = f"{index_dir}/.compact_tmp_{m}"
    fs.delete(HPath(tmp), True)  # stale temp from a crashed attempt
    rewrite(src_dirs, tmp)
    fs.rename(HPath(tmp), HPath(f"{index_dir}/batch_id={-m}"))
    for g in sources:
        if g != -m:
            fs.delete(HPath(f"{index_dir}/batch_id={g}"), True)
    return len(sources)


def backfill_floors(spark: SparkSession, index_dir: str) -> list[int]:
    """All `backfill_floor=<int>` generation dirs under index_dir — the
    REPLACEMENT-semantics namespace (see streaming/events.py::
    backfill_rollup): a backfill generation carries corrected FULL
    partials for its buckets and declares that, for those buckets, it
    supersedes every additive generation covering <= its floor. A
    compacted generation -m in turn supersedes backfill dirs with
    floor <= m (they were materialized into it, or were already dead) —
    the same precedence shape as the additive namespace, so the two
    compose: readers consult only floors above the newest compacted
    coverage."""
    HPath, fs = _fs(spark, index_dir)
    if not fs.exists(HPath(index_dir)):
        return []
    out = []
    for st in fs.listStatus(HPath(index_dir)):
        name = st.getPath().getName()
        if not name.startswith("backfill_floor="):
            continue
        try:
            out.append(int(name.split("=", 1)[1]))
        except ValueError:
            continue
    return sorted(out)
