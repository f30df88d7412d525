"""Ingest pipeline — the Spark re-expression of the reference's add/ingest
write path (src/index.ts:89-302, cli.ts:1386-1849):

    files → [extract] → chunk (pandas UDF + explode) → embed (mapInPandas)
          → write documents / chunks / embeddings parquet

Design notes vs the reference:
  * dedup-by-path (J7/P8) is a left_anti join against the existing
    documents table instead of a driver-side Set.
  * doc id = sha256(path)[:12] exactly (src/index.ts:111-114).
  * chunk id = `{doc_id}-{i}` exactly (src/index.ts:221-228).
  * The reference's EmbeddingQueue (batch 20 / concurrency 3 / 50 ms delay /
    WAL checkpoints, EmbeddingQueue.ts:70-192) exists to fake a scheduler in
    a single process — here partition-level parallelism replaces all of it;
    batch sizing is spark.sql.execution.arrow.maxRecordsPerBatch.
  * Embedding generation is pluggable: the default is a deterministic
    hash-based unit vector (test double, hermetic CI); a real model endpoint
    drops into the same mapInPandas seam (iterator UDF = per-executor
    client reuse, retries inside).

PDF binary extraction (reference shells to pypdf, PDFExtractor.ts:53-65)
is `extract_pdf_pages_udf`, a mapInPandas over
spark.read.format("binaryFile") rows; decode uses pypdf when present and
otherwise the pure-python parser in functions/pdftext.py, so the operator
is real in this container (gated end-to-end by the `pdf_extract` query).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_brain_spark.functions.chunking import DEFAULT_CHUNK_SIZE, DEFAULT_OVERLAP, make_chunk_udf
from pdf_brain_spark.functions.text import sha12_id

EMBED_DIM = 64


def deterministic_embedding(text: str, dim: int = EMBED_DIM) -> np.ndarray:
    """md5-arithmetic hash-embedding test double: component i derives from
    md5(f"{text}:{i}") — bytes [8:16] little-endian as uint64 (DuckDB's
    md5_number_lower), mapped to [-1, 1) and L2-normalized. Deterministic
    across runs/executors — the hermetic stand-in for the Ollama embed
    call (M6). md5 arithmetic rather than a seeded-RNG Gaussian so the
    embed_pipeline gate's DuckDB oracle can re-derive every component
    exactly in SQL (the same trick llm_enrichment's oracle uses)."""
    u = np.empty(dim)
    for i in range(dim):
        h = int.from_bytes(hashlib.md5(f"{text}:{i}".encode()).digest()[8:], "little")
        u[i] = (h / 2.0**64) * 2.0 - 1.0
    return (u / np.linalg.norm(u)).astype(np.float32)


def embed_map_in_pandas(dim: int = EMBED_DIM):
    """mapInPandas stage: (chunk_id, content) → (chunk_id, embedding).
    Iterator form so a real client would be constructed once per executor
    and reused across Arrow batches."""

    def _embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "chunk_id": pdf["chunk_id"],
                    "embedding": pdf["content"].map(
                        lambda t: deterministic_embedding(t, dim).tolist()
                    ),
                }
            )

    return _embed


def dedup_new_files(files: DataFrame, existing_docs: DataFrame, path_col: str = "path") -> DataFrame:
    """Skip already-ingested paths (reference J7: Set membership →
    left_anti)."""
    return files.join(existing_docs.select(path_col).distinct(), path_col, "left_anti")


def build_documents(files: DataFrame, path_col: str = "path") -> DataFrame:
    """files(path, title?, content) → documents rows with sha-12 ids."""
    doc = files.withColumn("doc_id", sha12_id(F.col(path_col)))
    if "title" not in files.columns:
        doc = doc.withColumn(
            "title", F.regexp_extract(F.col(path_col), r"([^/]+?)(?:\.[a-zA-Z]+)?$", 1)
        )
    return doc.withColumn("added_at", F.current_timestamp())


def chunk_documents(
    docs: DataFrame,
    text_col: str = "content",
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    overlap: int = DEFAULT_OVERLAP,
    markdown: bool = False,
) -> DataFrame:
    """documents → chunks with `{doc_id}-{i}` ids via chunk UDF +
    posexplode (the UDTF shape)."""
    chunk_udf = make_chunk_udf(chunk_size, overlap, markdown)
    exploded = docs.select(
        "doc_id", F.posexplode(chunk_udf(F.col(text_col))).alias("chunk_index", "content")
    )
    return exploded.select(
        F.concat_ws("-", F.col("doc_id"), F.col("chunk_index")).alias("chunk_id"),
        "doc_id",
        "chunk_index",
        "content",
    ).filter(F.length("content") > 0)


def embed_chunks(chunks: DataFrame, dim: int = EMBED_DIM) -> DataFrame:
    return chunks.select("chunk_id", "content").mapInPandas(
        embed_map_in_pandas(dim), schema=f"chunk_id string, embedding array<float>"
    )


def ingest(
    spark: SparkSession,
    files: DataFrame,
    out_dir: str,
    existing_docs: DataFrame | None = None,
    markdown: bool = False,
) -> dict[str, int]:
    """End-to-end ingest job. `files` must have (path, content). Writes
    documents/, chunks/, embeddings/ parquet under out_dir; returns counts.
    Idempotent re-runs come from the path anti-join."""
    if existing_docs is not None:
        files = dedup_new_files(files, existing_docs)
    docs = build_documents(files)
    chunks = chunk_documents(docs, markdown=markdown)
    # chunks feed two sinks; cache to avoid re-running the chunk UDF
    chunks = chunks.cache()
    emb = embed_chunks(chunks)
    docs.drop("content").write.mode("append").parquet(f"{out_dir}/documents")
    chunks.write.mode("append").parquet(f"{out_dir}/chunks")
    emb.write.mode("append").parquet(f"{out_dir}/embeddings")
    counts = {
        "documents": docs.count(),
        "chunks": chunks.count(),
        "embeddings": emb.count(),
    }
    # all sinks + counts are materialized: the chunk cache's job is done
    chunks.unpersist()
    return counts


def upsert_by_key(
    spark: SparkSession, incoming: DataFrame, target_dir: str, key: str
) -> int:
    """Idempotent merge-by-key sink (reference S7: INSERT … ON CONFLICT(id)
    DO UPDATE, LibSQLDatabase.ts:83-110): rows in `incoming` replace
    same-key rows in the target, others are kept. Implemented as
    keep = existing ⟕anti incoming, result = keep ∪ incoming, staged write
    + atomic swap. At production scale this is a Delta/Iceberg MERGE (or a
    partition-overwrite when the key maps to partitions) — the plan shape
    (anti-join + union) is identical; only the commit protocol changes."""
    import os
    import shutil

    incoming = incoming.cache()
    n_in = incoming.count()
    if os.path.isdir(target_dir):
        existing = spark.read.parquet(target_dir)
        keep = existing.join(incoming.select(key), key, "left_anti")
        merged = keep.unionByName(incoming)
    else:
        merged = incoming
    staging = target_dir.rstrip("/") + "._staging"
    merged.write.mode("overwrite").parquet(staging)
    if os.path.isdir(target_dir):
        shutil.rmtree(target_dir)
    os.rename(staging, target_dir)
    incoming.unpersist()
    return n_in


def extract_pdf_pages_udf():
    """mapInPandas seam for binaryFile PDF rows → (path, page, text) —
    the reference's S1 operator (PDFExtractor.ts:53-65,169: load document,
    iterate pages, extract text per page). Uses pypdf when executors have
    it; otherwise the pure-python extractor in functions/pdftext.py
    (object scan, FlateDecode, ObjStm, catalog page order, Tj/TJ/'/"
    text operators) — no stub, the decode is real either way."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import io

            import pypdf

            def pages_of(content: bytes) -> list[str]:  # pragma: no cover
                reader = pypdf.PdfReader(io.BytesIO(content))
                return [p.extract_text() for p in reader.pages]

        except ImportError:
            from pdf_brain_spark.functions.pdftext import extract_pdf_text as pages_of

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                for i, text in enumerate(pages_of(r["content"]), 1):
                    rows.append({"path": r["path"], "page": i, "text": text})
            yield pd.DataFrame(rows, columns=["path", "page", "text"])

    return _extract


def ingest_pdfs(
    spark: SparkSession,
    pdf_files: DataFrame,
    out_dir: str,
    existing_docs: DataFrame | None = None,
) -> dict[str, int]:
    """The reference's core `add *.pdf` flow (S1→S2 composition,
    PDFExtractor.ts → PDFProcessor chunking): binary PDF rows
    (path, content) → per-page text extraction (pypdf or the pure-python
    parser) → page texts reassembled per document with blank-line page
    breaks (the chunker treats them as paragraph boundaries) →
    the standard document/chunk/embed ingest. One extraction pass, all
    Arrow-batched; at 100 TB this is a binaryFile scan feeding two
    mapInPandas stages, no driver involvement."""
    pages = pdf_files.mapInPandas(
        extract_pdf_pages_udf(), schema="path string, page int, text string"
    )
    docs_text = (
        pages.groupBy("path")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("page"), F.col("text")))
                    ),
                    lambda s: s["text"],
                ),
                "\n\n",
            ).alias("content")
        )
    )
    return ingest(spark, docs_text, out_dir, existing_docs=existing_docs)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "doc_id",
    payload_cols: tuple[str, ...] = ("text",),
) -> DataFrame:
    """Change-data-capture diff between two snapshots of a keyed table:
    emit one row per INSERTED, DELETED, or UPDATED key (unchanged keys
    are dropped — a CDC feed's volume is the churn, not the table).
    Update detection compares an md5 digest of the payload columns, so
    wide payloads diff at digest cost and the comparison is
    engine-portable. The digest input joins columns with a unit
    separator (\\x1f) and maps NULL to a \\x01 sentinel — a bare
    concat would erase column boundaries (("ab","") vs ("a","b"))
    and silently skip NULLs (NULL vs ''), both of which would hide
    real updates from the feed. A payload value containing the
    sentinel bytes themselves can still collide; use a separator
    outside the payload alphabet if that applies.

    Plan shape: one full-outer join on the key (two table scans); the
    digests are map-side expressions and the churn filter applies before
    anything composes on top. At 100 TB both sides bucket/cluster by the
    key and the join co-locates.

    Returns (key_col, change_type in insert|delete|update, old_md5,
    new_md5 — NULL on the absent side)."""

    def _digest(df: DataFrame, out: str) -> DataFrame:
        payload = F.md5(
            F.concat_ws(
                "\x1f",
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit("\x01"))
                    for c in payload_cols
                ],
            )
        )
        return df.select(F.col(key_col), payload.alias(out))

    joined = _digest(old, "old_md5").join(_digest(new, "new_md5"), key_col, "full_outer")
    change = (
        F.when(F.col("old_md5").isNull(), F.lit("insert"))
        .when(F.col("new_md5").isNull(), F.lit("delete"))
        .when(F.col("old_md5") != F.col("new_md5"), F.lit("update"))
    )
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(key_col, "change_type", "old_md5", "new_md5")
    )


def apply_changelog(
    base: DataFrame,
    changelog: DataFrame,
    key_col: str = "doc_id",
    seq_col: str = "seq",
    op_col: str = "op",
    payload_cols: tuple[str, ...] = ("text",),
) -> DataFrame:
    """Apply a CDC changelog to a base snapshot — the INVERSE of
    snapshot_diff, and the engine-side MERGE the reference performs as
    per-row upserts (LibSQLDatabase.ts upsert paths): changelog rows are
    (key, seq, op in I|U|D, full new payload); the result is the table
    after replaying the log in sequence order, last writer wins per key,
    a delete followed by a later insert/update resurrects the key.

    Plan shape — the scalable MERGE, not the naive one: the changelog
    first collapses to ONE decision row per key (max-by-seq struct
    aggregate: map-side combinable, no window over the base), then a
    single full-outer join applies decisions to the base. The base is
    never shuffled beyond that one key join (bucket/cluster both sides
    by the key at 100 TB and it co-locates); a window over
    base-union-log would instead shuffle and sort the full table.
    Changelog rows carry ABSOLUTE payloads, so replay needs no
    read-modify-write chain. Within one key, `seq` must be unique (a
    real log's offset/LSN is); ties would make last-wins undefined."""
    decided = (
        changelog.groupBy(key_col)
        .agg(
            F.max(
                F.struct(
                    F.col(seq_col).alias("s"),
                    F.col(op_col).alias("o"),
                    *[F.col(c).alias(f"p_{c}") for c in payload_cols],
                )
            ).alias("_d")
        )
        .select(
            F.col(key_col),
            F.col("_d.s").alias("_seq"),
            F.col("_d.o").alias("_op"),
            *[F.col(f"_d.p_{c}").alias(f"_new_{c}") for c in payload_cols],
        )
    )
    joined = base.join(decided, key_col, "full_outer")
    kept = joined.filter(
        F.col("_op").isNull() | (F.col("_op") != F.lit("D"))
    )
    out_payload = [
        F.when(F.col("_op").isNull(), F.col(c))
        .otherwise(F.col(f"_new_{c}"))
        .alias(c)
        for c in payload_cols
    ]
    return kept.select(
        F.col(key_col),
        *out_payload,
        F.coalesce(F.col("_seq"), F.lit(0)).alias("last_seq"),
        F.coalesce(F.col("_op"), F.lit("B")).alias("last_op"),
    )
