"""Multimodal columns: image/audio/video as opaque ``binary`` with
typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schemas, partitioning, UDF signatures,
batch shapes — is real and tested. Decoding is format-sniffed:
BMP/PNG images and WAV PCM audio decode for REAL via the pure-stdlib
codecs in analytics/codecs.py; formats that need external media
libraries (JPEG, MP3, video codecs — not in this container) raise
``NotImplementedError`` in strict mode or produce a DETERMINISTIC
fake decode derived from the bytes (test mode), keeping every
downstream shape and test honest.

Scale notes: media blobs dominate row size — ``mapInPandas`` with a
bounded ``spark.sql.execution.arrow.maxRecordsPerBatch`` keeps Arrow
batches memory-safe; metadata-only queries never touch the binary
column (column pruning drops it at the parquet scan).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iotdatapipeline_spark.analytics import codecs

#: Canonical multimodal asset schema: one row per asset, media opaque.
ASSET_SCHEMA = (
    "asset_id bigint, kind string, media binary, width int, height int, "
    "sample_rate int, n_frames int, meta string"
)

IMAGE_FEATURES_SCHEMA = (
    "asset_id bigint, width int, height int, n_pixels bigint, "
    "mean_luma double, content_hash string"
)

AUDIO_FEATURES_SCHEMA = (
    "asset_id bigint, sample_rate int, n_samples bigint, duration_ms bigint, "
    "rms_x1e6 bigint, content_hash string"
)

FRAME_SAMPLE_SCHEMA = "asset_id bigint, frame_index int, frame_hash string"


def _pillow_decode(data: bytes) -> np.ndarray | None:
    """Decode via the optional ``[imaging]`` extra (Pillow/libjpeg):
    the production JPEG/GIF/WebP path, import-guarded like the
    connector ends in sources/connectors.py — the sandbox has no
    media wheels, so tests exercise this seam with a mocked ``PIL``
    in ``sys.modules`` and the hash-verified gates stay on the
    native BMP/PNG codecs. Returns BT.601 greyscale uint8 (H, W), or
    None when Pillow is not installed (the caller then applies the
    strict/fake contract). Runs inside the ``mapInPandas`` Arrow
    batch on executors, so the install only needs to exist on the
    workers — same deployment rule as any Python dependency."""
    try:
        from PIL import Image  # lazy: worker-side, optional extra
    except ImportError:
        return None
    import io

    with Image.open(io.BytesIO(data)) as im:
        return codecs.luma(np.asarray(im.convert("RGB")))


def _decode_image_bytes(data: bytes, width: int, height: int, strict: bool) -> np.ndarray:
    """Image decode: BMP and PNG payloads decode for real (pure-stdlib
    codecs, see analytics/codecs.py) in both modes; JPEG/GIF/WebP
    decode for real when the ``[imaging]`` extra (Pillow) is
    installed (:func:`_pillow_decode`). Remaining cases — Pillow
    absent or format unknown — raise in strict mode (the error names
    the pip extra) or fall back to a deterministic fake greyscale
    derived from the bytes, keeping every downstream shape honest."""
    fmt = codecs.sniff(data)
    if fmt == "bmp":
        return codecs.luma(codecs.decode_bmp(data))
    if fmt == "png":
        return codecs.luma(codecs.decode_png(data))
    if fmt in ("jpeg", "gif", "webp"):
        img = _pillow_decode(data)
        if img is not None:
            return img
    if strict:
        raise NotImplementedError(
            "no codec for this image format in this environment (BMP/PNG decode "
            "natively; JPEG/GIF/WebP need `pip install iotdatapipeline-spark[imaging]`); "
            "use strict=False for the deterministic stub"
        )
    seed = hashlib.md5(data).digest()
    n = max(width * height, 1)
    reps = (n + len(seed) - 1) // len(seed)
    arr = np.frombuffer(seed * reps, dtype=np.uint8)[:n]
    return arr.reshape((max(height, 1), max(width, 1)))


def _decode_audio_bytes(data: bytes, sample_rate: int, strict: bool) -> np.ndarray:
    """Audio decode: RIFF/WAV PCM-16 decodes for real (see
    analytics/codecs.py); other formats raise in strict mode or fall
    back to interpreting the payload as raw 16-bit LE PCM
    (deterministic, no codec needed)."""
    if codecs.sniff(data) == "wav":
        return codecs.decode_wav(data)[0]
    if strict:
        raise NotImplementedError(
            "no codec for this audio format in this environment (WAV PCM-16 decodes natively); "
            "use strict=False for the raw-PCM interpretation"
        )
    usable = len(data) - (len(data) % 2)
    if usable == 0:
        return np.zeros(0, dtype=np.int16)
    return np.frombuffer(data[:usable], dtype="<i2")


def image_features(assets: DataFrame, *, strict: bool = False) -> DataFrame:
    """Decode → feature-extract for image assets. Output: per-asset
    dimensions, mean luminance, content hash. The binary column is
    consumed inside the Arrow batch and never shuffled onward."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = _decode_image_bytes(bytes(r.media), int(r.width), int(r.height), strict)
                # decoded dims are authoritative (for real BMP/PNG they
                # come from the file header; the fake decode reshapes to
                # the metadata dims, so values are identical there)
                rows.append(
                    {
                        "asset_id": r.asset_id,
                        "width": int(img.shape[1]),
                        "height": int(img.shape[0]),
                        "n_pixels": int(img.size),
                        "mean_luma": float(img.mean()) if img.size else 0.0,
                        "content_hash": hashlib.md5(bytes(r.media)).hexdigest(),
                    }
                )
            yield pd.DataFrame(rows, columns=["asset_id", "width", "height", "n_pixels", "mean_luma", "content_hash"])

    imgs = assets.filter(F.col("kind") == "image").select("asset_id", "media", "width", "height")
    return imgs.mapInPandas(extract, schema=IMAGE_FEATURES_SCHEMA)


def audio_features(assets: DataFrame, *, strict: bool = False) -> DataFrame:
    """Decode → feature-extract for audio assets (RMS energy kept as
    an exact ×1e6 integer for oracle-stable comparisons)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                pcm = _decode_audio_bytes(bytes(r.media), int(r.sample_rate), strict)
                n = int(pcm.size)
                rms = float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2))) if n else 0.0
                rows.append(
                    {
                        "asset_id": r.asset_id,
                        "sample_rate": int(r.sample_rate),
                        "n_samples": n,
                        "duration_ms": (n * 1000) // max(int(r.sample_rate), 1),
                        "rms_x1e6": int(rms * 1_000_000),
                        "content_hash": hashlib.md5(bytes(r.media)).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "sample_rate", "n_samples", "duration_ms", "rms_x1e6", "content_hash"],
            )

    auds = assets.filter(F.col("kind") == "audio").select("asset_id", "media", "sample_rate")
    return auds.mapInPandas(extract, schema=AUDIO_FEATURES_SCHEMA)


RESIZE_SCHEMA = (
    "asset_id bigint, out_width int, out_height int, pix_sum bigint, resized_hash string"
)


def resize_images(
    assets: DataFrame,
    *,
    out_width: int = 8,
    out_height: int = 6,
    strict: bool = False,
    emit_pixels: bool = False,
) -> DataFrame:
    """Decode → nearest-neighbor resize to a fixed target shape (the
    thumbnail/normalization step every vision-data pipeline runs before
    feature extraction or training). Sampling grid is integer-exact:
    source index for output cell (y, x) is (y·h)//out_h, (x·w)//out_w —
    pure integer arithmetic, so the resized pixels (and therefore the
    output checksums) are reproducible by any independent
    implementation, including the SQL oracle over the deterministic
    fake-decode path.

    Output per asset: target dims, the resized pixel SUM (order-free
    integer — the oracle-checkable invariant) and an md5 of the resized
    byte stream (row-major). The binary column is consumed inside the
    Arrow batch; only the small summary row flows on —
    ``emit_pixels=True`` additionally carries the row-major resized
    bytes out (out_w·out_h per asset, still tiny) for downstream
    NATIVE-expression consumers like the average-hash fingerprint,
    keeping Python strictly codec-bound."""
    cols = ["asset_id", "out_width", "out_height", "pix_sum", "resized_hash"]
    schema = RESIZE_SCHEMA
    if emit_pixels:
        cols = cols + ["resized"]
        schema = RESIZE_SCHEMA + ", resized binary"

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = _decode_image_bytes(bytes(r.media), int(r.width), int(r.height), strict)
                h, w = img.shape
                ys = (np.arange(out_height) * h) // out_height
                xs = (np.arange(out_width) * w) // out_width
                resized = img[np.ix_(ys, xs)]
                row = {
                    "asset_id": r.asset_id,
                    "out_width": out_width,
                    "out_height": out_height,
                    "pix_sum": int(resized.astype(np.int64).sum()),
                    "resized_hash": hashlib.md5(resized.tobytes()).hexdigest(),
                }
                if emit_pixels:
                    row["resized"] = resized.astype(np.uint8).tobytes()
                rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    imgs = assets.filter(F.col("kind") == "image").select("asset_id", "media", "width", "height")
    return imgs.mapInPandas(resize, schema=schema)


def sample_frames(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling: 1-row-in → k-rows-out over mapInPandas
    (the frame decode itself is represented by a per-frame slice hash
    of the payload — the real decoder drops in at the marked line)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                data = bytes(r.media)
                n_frames = int(r.n_frames)
                for idx in range(0, n_frames, every_n):
                    # real decoder: frame = codec.decode_frame(data, idx)
                    lo = (idx * max(len(data) // max(n_frames, 1), 1)) % max(len(data), 1)
                    frame_slice = data[lo : lo + 16]
                    rows.append(
                        {
                            "asset_id": r.asset_id,
                            "frame_index": idx,
                            "frame_hash": hashlib.md5(struct.pack("<q", idx) + frame_slice).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=["asset_id", "frame_index", "frame_hash"])

    vids = assets.filter(F.col("kind") == "video").select("asset_id", "media", "n_frames")
    return vids.mapInPandas(sample, schema=FRAME_SAMPLE_SCHEMA)


def synth_assets(spark, n: int = 30, seed: int = 7) -> DataFrame:
    """Deterministic synthetic multimodal fixture (media = seeded
    bytes), used by tests; schemas match ASSET_SCHEMA."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 5)
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                (8 + i % 4) if kind == "image" else 0,
                (6 + i % 3) if kind == "image" else 0,
                16000 if kind == "audio" else 0,
                (25 + i % 10) if kind == "video" else 0,
                f'{{"src": "synthetic", "i": {i}}}',
            )
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)
