"""Multimodal columns — images/audio/video as opaque binary columns with
typed metadata, processed via Arrow-batched mapInPandas (beyond-reference,
BASELINE.json training-data-pipeline extension).

Schema convention:

    media(asset_id string, kind string, content binary,
          meta struct<mime string, width int, height int,
                      duration_ms long, sample_rate int>)

The decode/feature kernels (PIL/librosa/av) are NOT in this container, so
each kernel has two modes:
  * real mode: import-try the library, raise NotImplementedError with a
    clear message if absent (marked seam);
  * fake mode (default in tests): a deterministic stand-in derived from the
    binary payload's sha256, so the Spark-side plumbing — schema, batch
    shape, partitioning, UDF signatures — is fully exercised.

At 100 TB: binary payloads dominate partition size, so media tables are
written with small maxRecordsPerFile and processed with
spark.sql.files.maxPartitionBytes tuned down; feature extraction is
shuffle-free (map-only) and the extracted features (small) are what joins
back to the relational side.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "asset_id string, kind string, content binary, "
    "meta struct<mime string, width int, height int, duration_ms long, sample_rate int>"
)

IMAGE_FEATURE_DIM = 16


def _fake_features(payload: bytes, dim: int) -> list[float]:
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim)
    return (v / np.linalg.norm(v)).astype(np.float32).tolist()


def image_features_map_in_pandas(dim: int = IMAGE_FEATURE_DIM, use_fake: bool = True):
    """(asset_id, content) → (asset_id, features array<float>, width, height).
    Real mode decodes via PIL (grayscale thumbnail features, true pixel
    dimensions); fake mode derives deterministic features from the payload
    hash (plumbing test double — the container has no PIL, so fake mode is
    what the gate exercises; tests/test_real_mode_seams.py smoke-tests the
    real branch wherever pillow IS installed)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        real_decode = None
        if not use_fake:
            try:
                import io
                import math

                from PIL import Image
            except ImportError as e:
                raise NotImplementedError(
                    "image decode requires pillow on executors; run with "
                    "use_fake=True for the deterministic stand-in"
                ) from e
            side = max(int(math.isqrt(dim)), 1)

            def real_decode(b: bytes) -> tuple[list[float], int, int]:
                img = Image.open(io.BytesIO(bytes(b)))
                thumb = img.convert("L").resize((side, side))
                v = np.asarray(thumb, dtype=np.float64).ravel()
                v = np.resize(v, dim)  # pad/truncate to the feature dim
                n = float(np.linalg.norm(v)) or 1.0
                return (v / n).astype(np.float32).tolist(), img.width, img.height

        for pdf in batches:
            payloads = pdf["content"]
            if real_decode is not None:
                decoded = [real_decode(bytes(b)) for b in payloads]
                yield pd.DataFrame(
                    {
                        "asset_id": pdf["asset_id"],
                        "features": [d[0] for d in decoded],
                        "width": [d[1] for d in decoded],
                        "height": [d[2] for d in decoded],
                    }
                )
                continue
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "features": payloads.map(lambda b: _fake_features(bytes(b), dim)),
                    "width": payloads.map(lambda b: 16 + (bytes(b)[0] if b else 0)),
                    "height": payloads.map(lambda b: 16 + (bytes(b)[-1] if b else 0)),
                }
            )

    return _extract


def extract_image_features(media: DataFrame, dim: int = IMAGE_FEATURE_DIM) -> DataFrame:
    """Map-only feature extraction over image rows."""
    imgs = media.filter(F.col("kind") == "image").select("asset_id", "content")
    return imgs.mapInPandas(
        image_features_map_in_pandas(dim),
        schema=f"asset_id string, features array<float>, width int, height int",
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled timestamp
    (decode stubbed). Demonstrates the explode-by-timeline shape: a 10 s
    video at 1 fps becomes 10 rows before any decode happens, so decode
    parallelism is per-frame, not per-video."""
    vids = media.filter(F.col("kind") == "video").select(
        "asset_id", F.col("meta.duration_ms").alias("duration_ms")
    )
    return vids.select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def audio_window_map_in_pandas(win_chars: int = 200, hop_chars: int = 100):
    """(asset_id, content) → one row per overlapping analysis window:
    (asset_id, window_idx, start_c, n_chars, window_md5). The audio
    STFT-framing shape — overlapping fixed-length windows with hop —
    with the decode stubbed: the binary payload's UTF-8 text stands in
    for PCM samples (chars ≙ samples), and each window's md5 digest
    byte-certifies that the batched-UDF windowing cut EXACTLY the right
    slice (an off-by-one in the hop arithmetic, a dropped tail window,
    or a batch-boundary bug flips the digest). Real mode would swap the
    digest for an FFT via librosa — same rows out, same plumbing.

    Explode-then-process: like frame_sample_plan, a long asset becomes
    many window rows BEFORE any heavy kernel runs, so downstream
    parallelism is per-window, not per-asset. Map-only; the Arrow batch
    iterator never materializes more than one batch of windows."""

    def _window(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "window_idx": [], "start_c": [], "n_chars": [], "window_md5": []}
            for aid, payload in zip(pdf["asset_id"], pdf["content"]):
                text = bytes(payload).decode("utf-8", errors="strict")
                n = len(text)
                idx = 0
                start = 0
                # every window whose START is inside the asset, tail
                # windows truncated (the librosa center=False convention)
                while start < n:
                    sl = text[start : start + win_chars]
                    out["asset_id"].append(aid)
                    out["window_idx"].append(idx)
                    out["start_c"].append(start)
                    out["n_chars"].append(len(sl))
                    out["window_md5"].append(
                        hashlib.md5(sl.encode("utf-8")).hexdigest()
                    )
                    idx += 1
                    start += hop_chars
            yield pd.DataFrame(out)

    return _window


def extract_audio_windows(media: DataFrame, win_chars: int = 200, hop_chars: int = 100) -> DataFrame:
    """Map-only overlapping-window framing over audio rows."""
    auds = media.filter(F.col("kind") == "audio").select("asset_id", "content")
    return auds.mapInPandas(
        audio_window_map_in_pandas(win_chars, hop_chars),
        schema="asset_id string, window_idx int, start_c int, n_chars int, window_md5 string",
    )


def frame_decode_map_in_pandas(frame_chars: int = 10, chars_per_sec: int = 100):
    """(asset_id, frame_ts_ms, content) → one row per sampled frame:
    (asset_id, frame_ts_ms, start_c, n_chars, frame_md5). The video
    frame-DECODE step that consumes frame_sample_plan's timeline rows —
    the payload's UTF-8 chars stand in for the byte stream (char rate =
    chars_per_sec), the frame slice starts at ts·rate//1000 and each
    slice's md5 digest byte-certifies the cut exactly like the audio
    windows (a rate-conversion off-by-one or a truncated-tail bug flips
    the digest against the oracle's substr replay). Real mode would
    swap the digest for an av/ffmpeg keyframe grab — same rows out.

    Runs AFTER the explode: one input row per frame, so decode
    parallelism at 100 TB is per-frame, not per-video; Arrow batches
    carry (timestamp, payload) pairs and the kernel is pure slicing."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "frame_ts_ms": [], "start_c": [], "n_chars": [], "frame_md5": []}
            for aid, ts_ms, payload in zip(
                pdf["asset_id"], pdf["frame_ts_ms"], pdf["content"]
            ):
                text = bytes(payload).decode("utf-8", errors="strict")
                start = (int(ts_ms) * chars_per_sec) // 1000
                sl = text[start : start + frame_chars]
                out["asset_id"].append(aid)
                out["frame_ts_ms"].append(int(ts_ms))
                out["start_c"].append(start)
                out["n_chars"].append(len(sl))
                out["frame_md5"].append(hashlib.md5(sl.encode("utf-8")).hexdigest())
            yield pd.DataFrame(out)

    return _decode


def decode_sampled_frames(
    media: DataFrame,
    every_ms: int = 250,
    frame_chars: int = 10,
    chars_per_sec: int = 100,
) -> DataFrame:
    """Plan + decode: explode each video's timeline into sampled frame
    timestamps (frame_sample_plan), join the payload back on, then run
    the per-frame decode kernel. Map-only end to end — the join is the
    asset-grain payload lookup, never a shuffle of frames."""
    plan = frame_sample_plan(media, every_ms=every_ms)
    vids = media.filter(F.col("kind") == "video").select("asset_id", "content")
    framed = plan.join(vids, "asset_id")
    return framed.mapInPandas(
        frame_decode_map_in_pandas(frame_chars, chars_per_sec),
        schema="asset_id string, frame_ts_ms long, start_c int, n_chars int, frame_md5 string",
    )


def resample_map_in_pandas(n_out: int = 16):
    """(asset_id, content) → (asset_id, n_in, resampled, resampled_md5):
    nearest-neighbor RESAMPLE of the payload's char stream to a fixed
    n_out samples (sample k reads position k·n_in // n_out) — the 1-D
    resize/downsample member of the multimodal plumbing family (decode,
    features, windows, frames, and now resample). The sampled string and
    its md5 both return, so the oracle's substr replay certifies every
    index computation; a rounding-direction bug in the index map (ceil
    vs floor, 0- vs 1-based) flips the digest. Real mode would swap the
    char read for a pixel/PCM gather — identical index arithmetic."""

    def _resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"asset_id": [], "n_in": [], "resampled": [], "resampled_md5": []}
            for aid, payload in zip(pdf["asset_id"], pdf["content"]):
                text = bytes(payload).decode("utf-8", errors="strict")
                n = len(text)
                sampled = "".join(
                    text[(k * n) // n_out] for k in range(n_out)
                ) if n > 0 else ""
                out["asset_id"].append(aid)
                out["n_in"].append(n)
                out["resampled"].append(sampled)
                out["resampled_md5"].append(
                    hashlib.md5(sampled.encode("utf-8")).hexdigest()
                )
            yield pd.DataFrame(out)

    return _resample


def resample_assets(media: DataFrame, n_out: int = 16) -> DataFrame:
    """Map-only nearest-neighbor resampling over audio rows."""
    auds = media.filter(F.col("kind") == "audio").select("asset_id", "content")
    return auds.mapInPandas(
        resample_map_in_pandas(n_out),
        schema="asset_id string, n_in int, resampled string, resampled_md5 string",
    )
