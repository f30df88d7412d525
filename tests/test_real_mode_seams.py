"""Guarded smoke tests for the real-mode seams (VERDICT r3 item 8): the
container ships neither pypdf nor pillow, so these tests SKIP cleanly here —
but any environment that has the libraries exercises the real branches
(`operators/ingest.py` pypdf path, `operators/multimodal.py` PIL decode)
instead of leaving them permanently untested."""

from __future__ import annotations

import importlib.util

import pytest

HAS_PYPDF = importlib.util.find_spec("pypdf") is not None
HAS_PIL = importlib.util.find_spec("PIL") is not None


@pytest.mark.skipif(not HAS_PYPDF, reason="pypdf not installed in this container")
def test_pdf_extract_real_pypdf_branch(spark):
    """With pypdf present, extract_pdf_pages_udf routes through the real
    library: its output on our own synthesized PDFs must match the
    pure-python extractor page for page."""
    import pandas as pd

    from pdf_brain_spark.functions.pdftext import build_simple_pdf, extract_pdf_text
    from pdf_brain_spark.operators.ingest import extract_pdf_pages_udf

    pages = [["alpha page one", "beta page two"], ["gamma solo"]]
    rows = [
        ("a.pdf", build_simple_pdf(pages[0], compress=True)),
        ("b.pdf", build_simple_pdf(pages[1], compress=False)),
    ]
    pdf_df = spark.createDataFrame(rows, "path string, content binary")
    got = {
        (r["path"], r["page"]): r["text"]
        for r in pdf_df.mapInPandas(
            extract_pdf_pages_udf(), schema="path string, page int, text string"
        ).collect()
    }
    for (path, content), expected in zip(rows, pages):
        pure = extract_pdf_text(content)
        assert len(pure) == len(expected)
        for i in range(len(expected)):
            # pypdf may normalize whitespace differently; compare tokens
            assert got[(path, i + 1)].split() == pure[i].split()


@pytest.mark.skipif(not HAS_PIL, reason="pillow not installed in this container")
def test_image_features_real_pil_branch(spark):
    """With pillow present, use_fake=False must decode genuinely: true
    pixel dimensions and unit-norm thumbnail features."""
    import io

    import numpy as np
    from PIL import Image

    from pdf_brain_spark.operators.multimodal import image_features_map_in_pandas

    def png_bytes(w: int, h: int, value: int) -> bytes:
        buf = io.BytesIO()
        Image.new("RGB", (w, h), (value, value, value)).save(buf, format="PNG")
        return buf.getvalue()

    rows = [("img1", png_bytes(20, 10, 128)), ("img2", png_bytes(7, 5, 30))]
    media = spark.createDataFrame(rows, "asset_id string, content binary")
    out = {
        r["asset_id"]: r
        for r in media.mapInPandas(
            image_features_map_in_pandas(dim=16, use_fake=False),
            schema="asset_id string, features array<float>, width int, height int",
        ).collect()
    }
    assert (out["img1"]["width"], out["img1"]["height"]) == (20, 10)
    assert (out["img2"]["width"], out["img2"]["height"]) == (7, 5)
    for r in out.values():
        v = np.asarray(r["features"], dtype=np.float64)
        assert v.shape == (16,)
        assert abs(np.linalg.norm(v) - 1.0) < 1e-5


@pytest.mark.skipif(HAS_PIL, reason="real-mode NotImplementedError only without pillow")
def test_image_features_real_mode_raises_cleanly_without_pil(spark):
    """Without pillow, use_fake=False must fail with the documented
    NotImplementedError — not a silent fall-through to fake features."""
    from pdf_brain_spark.operators.multimodal import image_features_map_in_pandas

    media = spark.createDataFrame(
        [("x", b"\x89PNG fake")], "asset_id string, content binary"
    )
    with pytest.raises(Exception) as ei:
        media.mapInPandas(
            image_features_map_in_pandas(dim=16, use_fake=False),
            schema="asset_id string, features array<float>, width int, height int",
        ).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )
