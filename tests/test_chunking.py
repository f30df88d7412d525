"""Chunker golden/invariant tests mirroring the reference's
MarkdownExtractor.test.ts / PDFExtractor chunking invariants."""

from pdf_brain_spark.functions.chunking import (
    MIN_CHUNK_CHARS,
    chunk_markdown,
    chunk_text,
    extract_frontmatter,
    extract_sections,
    sanitize_text,
)


def test_sanitize_strips_null_bytes():
    assert sanitize_text("a\x00b\x00c") == "abc"


def test_empty_input_yields_no_chunks():
    assert chunk_text("") == []
    assert chunk_markdown("") == []
    assert chunk_text("   \n  ") == []


def test_short_text_single_chunk():
    assert chunk_text("hello world, short text.") == ["hello world, short text."]


def test_whitespace_collapsed():
    out = chunk_text("hello    world\t\tagain and some more words here")
    assert out == ["hello world again and some more words here"]


def test_tiny_whole_page_dropped():
    # the reference's >20-char filter applies to a short whole page too
    # (PDFExtractor.ts:144): 17 chars → no chunks
    assert chunk_text("hello world again") == []


def test_no_tiny_chunks():
    text = ("A sentence that is long enough to be kept around. " * 40).strip()
    for c in chunk_text(text):
        assert len(c) > MIN_CHUNK_CHARS


def test_chunk_size_respected_for_sentences():
    text = ("This is a fairly normal sentence of moderate length. " * 60).strip()
    chunks = chunk_text(text, chunk_size=512, overlap=50)
    assert len(chunks) > 1
    for c in chunks:
        assert len(c) <= 512


def test_hard_split_overlap():
    # one giant "sentence" with no punctuation → hard split with stride
    text = "x" * 2000
    chunks = chunk_text(text, chunk_size=512, overlap=50)
    # stride = 462, so consecutive chunks share 50 chars
    assert len(chunks) == 5
    assert all(len(c) <= 512 for c in chunks)


def test_unicode_and_crlf():
    text = "héllo wörld 你好.\r\nAnother line here with words."
    out = chunk_text(text)
    assert len(out) == 1


def test_markdown_small_code_block_never_split():
    code = "```python\ndef f():\n    return 1\n```"
    text = ("Intro paragraph with enough words to matter. " * 20) + "\n\n" + code + "\n\n" + (
        "Outro paragraph, also long enough to count here. " * 20
    )
    chunks = chunk_markdown(text, chunk_size=512, overlap=50)
    joined = "\n".join(chunks)
    assert code in joined  # the fenced block survives intact in some chunk


def test_markdown_large_code_block_split_per_line_refenced():
    import re

    lines = "\n".join(f"line_{i} = {i}" for i in range(200))
    text = f"```python\n{lines}\n```"
    chunks = chunk_markdown(text, chunk_size=512, overlap=50)
    # the oversized block is pre-split into multiple fences, each within the
    # 80%-of-chunk-size element budget (placeholder restore may recombine
    # them into one chunk — reference behavior)
    fences = re.findall(r"```python\n[\s\S]*?```", "\n\n".join(chunks))
    assert len(fences) > 1
    for fence in fences:
        assert len(fence) <= int(512 * 0.8)
    # no code line lost
    assert "line_0 = 0" in chunks[0] and "line_199 = 199" in "".join(chunks)


def test_markdown_large_table_split_keeps_header():
    header = "| col_a | col_b |"
    sep = "|---|---|"
    rows = "\n".join(f"| value_{i} | data_{i} |" for i in range(100))
    text = f"{header}\n{sep}\n{rows}\n"
    chunks = chunk_markdown(text, chunk_size=512, overlap=50)
    table_chunks = [c for c in chunks if c.startswith("|")]
    assert len(table_chunks) > 1
    for c in table_chunks:
        assert c.split("\n")[0] == header
        assert c.split("\n")[1] == sep


def test_frontmatter_parse():
    text = "---\ntitle: My Doc\ntags: a, b\n---\n# Body\ncontent"
    fm = extract_frontmatter(text)
    assert fm == {"title": "My Doc", "tags": "a, b"}
    assert extract_frontmatter("no frontmatter here") == {}


def test_frontmatter_toml_parse():
    """gray-matter's `+++` TOML convention (reference parses via gray-matter,
    MarkdownExtractor.ts:222-237): top-level `key = value` pairs, quotes
    stripped, [tables]/comments/blank lines skipped."""
    text = '+++\ntitle = "My Doc"\ndraft = false\n\n# a comment\n[extra]\nweight = 3\n+++\n# Body\ncontent'
    fm = extract_frontmatter(text)
    assert fm["title"] == "My Doc"
    assert fm["draft"] == "false"
    # [extra] table header skipped; its keys still parse at top level per fast-path scope
    assert "[extra]" not in fm
    # YAML delimiters take precedence and are unchanged
    assert extract_frontmatter("---\ntitle: y\n---\nbody") == {"title": "y"}
    # `+++` mid-document is not frontmatter
    assert extract_frontmatter("body\n+++\nk = v\n+++\n") == {}


def test_sections_strip_toml_frontmatter():
    text = '+++\ntitle = "t"\n+++\npreamble\n\n# First\nbody'
    secs = extract_sections(text)
    assert [s["section"] for s in secs] == [1, 2]
    assert secs[0]["content"] == "preamble"
    assert "+++" not in secs[0]["content"]


def test_sections_numbered_like_pages():
    text = "---\ntitle: t\n---\npreamble text\n\n# First\nbody one\n\n## Second\nbody two"
    secs = extract_sections(text)
    assert [s["section"] for s in secs] == [1, 2, 3]
    assert secs[0]["heading"] == ""
    assert secs[1]["heading"] == "First" and secs[1]["level"] == 1
    assert secs[2]["heading"] == "Second" and secs[2]["level"] == 2


def test_fixture_texts_satisfy_oracle_closed_form():
    """The chunk_pipeline/embed_pipeline DuckDB oracles re-derive chunk_text
    as a closed-form slice formula. That is only valid while the fixture
    texts contain no sentence punctuation, newlines, or tabs (otherwise the
    greedy sentence-packing loop kicks in). Pin the precondition, and check
    the closed form IS chunk_text on every fixture doc."""
    import os
    import re

    import duckdb

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    rows = duckdb.sql(
        f"select text from read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    assert rows
    for (text,) in rows:
        assert not re.search(r"[.!?\n\t\x00]", text), "oracle precondition broken"
        cleaned = re.sub(r"\s+", " ", text).strip()
        if len(cleaned) <= 512:
            expected = [cleaned] if len(cleaned) > 20 else []
        else:
            expected = [
                c
                for c in (cleaned[i : i + 512].strip() for i in range(0, len(cleaned), 462))
                if len(c) > 20
            ]
        assert chunk_text(text) == expected


def test_md5_embedding_matches_duckdb_arithmetic():
    """deterministic_embedding's md5 arithmetic must equal DuckDB's
    md5_number_lower (digest bytes [8:16] little-endian) — the embed_pipeline
    oracle depends on this exact correspondence."""
    import duckdb
    import numpy as np

    from pdf_brain_spark.operators.ingest import deterministic_embedding

    text = "the quick brown fox"
    emb = deterministic_embedding(text, dim=4)
    got = []
    for i in range(4):
        (h,) = duckdb.sql(f"select md5_number_lower('{text}:{i}')").fetchone()
        got.append((h / 2.0**64) * 2.0 - 1.0)
    u = np.asarray(got)
    expected = (u / np.linalg.norm(u)).astype(np.float32)
    assert np.array_equal(emb, expected)
