"""Multimodal (image/audio/video) column plumbing over opaque binary columns.

Task brief: media payloads are ``binary`` columns with typed metadata;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` UDFs. The image/audio codec libraries are NOT in this
container, so the codec step is STUBBED (clearly marked): when ``PIL`` /
``av`` are importable the real decoder slots into ``_decode_real``; without
them, payloads in the deterministic SYNTH container format (built by
``make_synth_media``) are parsed exactly, and any other payload raises
``NotImplementedError``. Everything Spark-side — schemas, batch iteration,
partitioning, output shapes — is real and tested.

SYNTH format: b"SYN1" | kind(1B: 0=image,1=audio,2=video) | w(4B LE) |
h(4B LE) | n_frames(4B LE) | payload bytes (w*h per frame, row-major).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = b"SYN1"

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except Exception:
    _HAS_PIL = False


def make_synth_media(kind: int, w: int, h: int, n_frames: int, seed: int) -> bytes:
    rng = np.random.RandomState(seed)
    payload = rng.randint(0, 256, size=w * h * n_frames, dtype=np.int64).astype(np.uint8)
    return MAGIC + struct.pack("<BIII", kind, w, h, n_frames) + payload.tobytes()


def _parse_synth(b: bytes) -> tuple[int, int, int, int, np.ndarray]:
    if b is None or not b.startswith(MAGIC):
        if _HAS_PIL:
            raise NotImplementedError("real codec path not wired yet")
        raise NotImplementedError(
            "non-SYNTH payload and no codec libs in this environment"
        )
    kind, w, h, n_frames = struct.unpack_from("<BIII", b, 4)
    payload = np.frombuffer(b, dtype=np.uint8, offset=4 + 13)
    return kind, w, h, n_frames, payload.reshape(n_frames, h, w)


DECODE_SCHEMA = (
    "id long, kind int, width int, height int, n_frames int, mean_px double"
)


def decode_media(df: DataFrame, id_col: str = "id", media_col: str = "media") -> DataFrame:
    """binary -> typed metadata + a cheap global feature (mean pixel)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf[id_col], pdf[media_col], strict=True):
                kind, w, h, n, frames = _parse_synth(bytes(b))
                rows.append((i, int(kind), int(w), int(h), int(n), float(frames.mean())))
            yield pd.DataFrame(
                rows, columns=["id", "kind", "width", "height", "n_frames", "mean_px"]
            )

    return df.select(F.col(id_col).alias(id_col), F.col(media_col)).mapInPandas(
        run, schema=DECODE_SCHEMA
    )


def extract_features(
    df: DataFrame, id_col: str = "id", media_col: str = "media", n_bins: int = 16
) -> DataFrame:
    """Per-item histogram feature vector (array<float>) — the embedding-column
    producer for the similarity-search operators."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for i, b in zip(pdf[id_col], pdf[media_col], strict=True):
                _, _, _, _, frames = _parse_synth(bytes(b))
                hist, _ = np.histogram(frames, bins=n_bins, range=(0, 256))
                feats.append((hist / max(1, frames.size)).astype(float).tolist())
                ids.append(i)
            yield pd.DataFrame({"id": ids, "features": feats})

    return df.select(F.col(id_col), F.col(media_col)).mapInPandas(
        run, schema="id long, features array<double>"
    )


def resize_image(
    df: DataFrame, out_w: int, out_h: int, id_col: str = "id", media_col: str = "media"
) -> DataFrame:
    """Nearest-neighbor resize of frame 0 — re-encoded into SYNTH format."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, outs = [], []
            for i, b in zip(pdf[id_col], pdf[media_col], strict=True):
                kind, w, h, n, frames = _parse_synth(bytes(b))
                ys = (np.arange(out_h) * h // out_h).astype(int)
                xs = (np.arange(out_w) * w // out_w).astype(int)
                resized = frames[0][np.ix_(ys, xs)]
                outs.append(
                    MAGIC + struct.pack("<BIII", kind, out_w, out_h, 1) + resized.tobytes()
                )
                ids.append(i)
            yield pd.DataFrame({"id": ids, "media": outs})

    return df.select(F.col(id_col), F.col(media_col)).mapInPandas(
        run, schema="id long, media binary"
    )


def sample_frames(
    df: DataFrame, every_k: int, id_col: str = "id", media_col: str = "media"
) -> DataFrame:
    """Explode every k-th frame of video payloads into one row per frame."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frame_ids, blobs = [], [], []
            for i, b in zip(pdf[id_col], pdf[media_col], strict=True):
                kind, w, h, n, frames = _parse_synth(bytes(b))
                for fi in range(0, n, every_k):
                    ids.append(i)
                    frame_ids.append(fi)
                    blobs.append(
                        MAGIC + struct.pack("<BIII", 0, w, h, 1) + frames[fi].tobytes()
                    )
            yield pd.DataFrame({"id": ids, "frame_id": frame_ids, "media": blobs})

    return df.select(F.col(id_col), F.col(media_col)).mapInPandas(
        run, schema="id long, frame_id int, media binary"
    )
