"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata, processed batch-wise through Arrow.

PNG images DECODE FOR REAL via the stdlib codec in
``functions/png.py`` (zlib inflate + per-scanline unfiltering — no
third-party libs needed); formats that genuinely need a codec library
(JPEG, audio, video) stay behind a gated import (NotImplementedError /
deterministic fake), with the Spark-side plumbing — schema, batch
shape, partition sizing, UDF signatures — real and tested either way:

* ``media_metadata``      — content-addressed metadata (bytes, md5)
* ``extract_features``    — fixed-width float feature vector per blob
  (real pixel statistics for PNG; content-addressed deterministic fake
  for gated formats — the dataflow is identical)
* ``sample_frames``       — 1-row → N-row expansion (video → frames),
  the table-function shape frame sampling needs

Scale notes (100 TB of media): blobs ride in parquet binary columns;
``spark.sql.files.maxPartitionBytes`` bounds task input so one task
never holds more than ~128 MB of blobs; mapInPandas streams
Arrow batches (maxRecordsPerBatch caps peak Python memory). Feature
extraction is embarrassingly parallel — zero shuffles.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions.png import PNG_MAGIC, decode_png

try:  # pragma: no cover - the sandbox has no PIL; the gate is the point
    import PIL.Image  # type: ignore  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

FEATURE_DIM = 8


def _decode_image(blob: bytes) -> np.ndarray:
    """Decode a media blob to a uint8 pixel array.

    PNG decodes for real via the stdlib codec (functions/png.py — zlib
    + per-scanline unfiltering, no third-party libs). Other formats
    (JPEG et al.) still require PIL, which this sandbox lacks — those
    stay behind the NotImplementedError gate; callers fall back to
    :func:`_fake_feature` for them."""
    if blob[:8] == PNG_MAGIC:
        return decode_png(blob)
    if not HAVE_PIL:
        raise NotImplementedError(
            "non-PNG image decode requires PIL; use the deterministic fake path"
        )
    raise NotImplementedError("wire PIL decode here when the lib exists")


def _fake_feature(digest: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in feature vector: bytes of the md5 digest
    scaled to [0, 1). Content-addressed → stable across runs/partitions."""
    return [b / 256.0 for b in digest[:dim]]


def media_metadata(
    df: DataFrame, id_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """(id, n_bytes, fp_md5) per blob — one Arrow-vectorized pass."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[content_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": blobs.map(lambda b: len(b) if b is not None else 0).astype("int64"),
                    "fp_md5": blobs.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else ""
                    ),
                }
            )

    return df.mapInPandas(run, schema=f"{id_col} long, n_bytes long, fp_md5 string")


def _pixel_feature(px: np.ndarray) -> list[float]:
    """Real featurizer over decoded pixels: 8 image statistics, every
    one an exact small integer so float32 storage loses nothing —
    [h, w, channels, min, max, mean (floor), first px, last px]."""
    h, w = px.shape[0], px.shape[1]
    c = px.shape[2] if px.ndim == 3 else 1
    flat = px.reshape(-1).astype(np.int64)
    return [
        float(h), float(w), float(c),
        float(flat.min()), float(flat.max()),
        float(int(flat.sum()) // flat.size),
        float(flat[0]), float(flat[-1]),
    ]


def extract_features(
    df: DataFrame, id_col: str = "doc_id", content_col: str = "content"
) -> DataFrame:
    """(id, feature: array<float>) — decode→featurize batch pipeline.

    PNG blobs decode for REAL (stdlib codec, functions/png.py) and
    featurize from pixels via :func:`_pixel_feature`; blobs no codec
    here can read fall back to the deterministic content-addressed
    stand-in, keeping the pipeline total. The Arrow batch shape and
    schema are exactly what a real CLIP/mel-spectrogram extractor
    would use.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf[content_col]:
                if b is None:
                    feats.append([0.0] * FEATURE_DIM)
                    continue
                b = bytes(b)
                # format dispatch lives in _decode_image alone; ANY
                # undecodable blob (non-PNG without PIL, or a PNG
                # outside the stdlib codec's profile — interlaced,
                # 16-bit, truncated, corrupt) falls back to the
                # content-addressed stand-in so the pipeline stays
                # total: one bad blob must never abort a 100-TB job.
                try:
                    feats.append(_pixel_feature(_decode_image(b)))
                except (NotImplementedError, ValueError):
                    feats.append(_fake_feature(hashlib.md5(b).digest()))
            yield pd.DataFrame({id_col: pdf[id_col], "feature": feats})

    return df.mapInPandas(run, schema=f"{id_col} long, feature array<float>")


def sample_frames(
    df: DataFrame,
    n_frames: int = 4,
    id_col: str = "doc_id",
    content_col: str = "content",
) -> DataFrame:
    """1→N expansion: emit ``n_frames`` byte-slice 'frames' per blob
    (stand-in for video frame sampling; same mapInPandas shape)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, b in zip(pdf[id_col], pdf[content_col]):
                if b is None or len(b) == 0:
                    continue
                step = max(1, len(b) // n_frames)
                for k in range(min(n_frames, len(b))):
                    ids.append(i)
                    idxs.append(k)
                    frames.append(bytes(b[k * step : k * step + step]))
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int32"),
                 "frame": frames}
            )

    return df.mapInPandas(
        run, schema=f"{id_col} long, frame_idx int, frame binary"
    )


def resize_media(
    df: DataFrame,
    factor: int = 4,
    max_out: int = 16,
    id_col: str = "doc_id",
    content_col: str = "content",
) -> DataFrame:
    """Downsample a media blob by integer-factor mean pooling —
    ``pooled[i] = (b[f·i] + … + b[f·i+f−1]) // f`` — the resize step of
    the decode→resize→featurize chain, on raw bytes so it needs no
    codec: on a real raster this IS area-average downscaling of a
    single channel; with a decoder in front the kernel is unchanged.
    Integer floor-division keeps every value exact (no float racing).
    Emits the first ``max_out`` pooled values as ``array<int>`` plus
    the full pooled length. Arrow-vectorized, map-only."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, pooled, n_out = [], [], []
            for i, b in zip(pdf[id_col], pdf[content_col]):
                if b is None:
                    continue
                b = bytes(b)
                # decodable image → pool over PIXELS (row-major,
                # channels interleaved); anything undecodable → raw
                # file bytes, keeping the operator total (see
                # extract_features for the contract)
                try:
                    a = _decode_image(b).reshape(-1)
                except (NotImplementedError, ValueError):
                    a = np.frombuffer(b, dtype=np.uint8)
                n = len(a) // factor
                p = (
                    a[: n * factor]
                    .reshape(n, factor)
                    .sum(axis=1, dtype=np.int64)
                    // factor
                )
                ids.append(i)
                pooled.append([int(v) for v in p[:max_out]])
                n_out.append(n)
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"),
                 "pooled": pooled,
                 "n_pooled": pd.Series(n_out, dtype="int64")}
            )

    return df.mapInPandas(
        run, schema=f"{id_col} long, pooled array<int>, n_pooled long"
    )


__all__ = [
    "FEATURE_DIM",
    "HAVE_PIL",
    "extract_features",
    "media_metadata",
    "resize_media",
    "sample_frames",
]
