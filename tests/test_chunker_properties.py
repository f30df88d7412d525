"""Property-based chunker invariants (hypothesis) — beyond the reference's
example-based tests (SURVEY §5: no property/randomized testing there).

Invariants mirrored from the reference's chunking contract
(PDFExtractor.ts:78-145, MarkdownExtractor.ts:364-472):
  * no chunk exceeds chunk_size
  * every chunk passes the >20-char tiny-chunk filter
  * chunking is deterministic
  * every chunk's words appear in the source text (no invented content)
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_brain_spark.functions.chunking import chunk_markdown, chunk_text

_words = st.lists(
    st.text(alphabet="abcdefghij XYZ.!?", min_size=1, max_size=12), max_size=120
)
_texts = _words.map(lambda ws: " ".join(ws))


@settings(max_examples=60, deadline=None)
@given(_texts, st.integers(min_value=64, max_value=512))
def test_chunk_size_and_tiny_filter(text, size):
    chunks = chunk_text(text, chunk_size=size, overlap=16)
    for c in chunks:
        assert len(c) <= size
        assert len(c) > 20


@settings(max_examples=30, deadline=None)
@given(_texts)
def test_chunk_deterministic(text):
    assert chunk_text(text, 256, 32) == chunk_text(text, 256, 32)


@settings(max_examples=30, deadline=None)
@given(_texts)
def test_chunk_no_invented_words(text):
    source_words = set(text.split())
    for c in chunk_text(text, 256, 32):
        for w in c.split():
            assert w in source_words or any(w in sw for sw in source_words)


@settings(max_examples=30, deadline=None)
@given(_texts, st.integers(min_value=100, max_value=400))
def test_markdown_chunker_respects_size(text, size):
    md = f"# H\n{text}\n```python\ncode block line\n```\n"
    for c in chunk_markdown(md, chunk_size=size, overlap=16):
        # code blocks are protected and may exceed size only if a single
        # protected block is itself oversized
        assert len(c) <= max(size, len("```python\ncode block line\n```") + size)
