"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for a 100 TB training-data pipeline: image/audio/video payloads live in
`binary` columns (or object-store references) beside typed metadata; decode /
feature-extraction / resize / frame-sampling run as Arrow-batched pandas UDFs
over `mapInPandas` so payload bytes never pass through per-row Python.

The actual codec calls (PIL/ffmpeg/torchaudio) are NOT available in this
container — the decode step is STUBBED behind `NotImplementedError` with a
deterministic fake (md5-derived) so the Spark-side plumbing — schema,
partitioning, UDF signature, Arrow batch shape — is real and tested.
Swap `_decode_image_batch` for a real decoder to productionize.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = "doc_id long, n_bytes int, width int, height int, channels int"
FRAME_SCHEMA = "doc_id long, frame_id int, frame_hash string"


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stand-in payload: utf-8 bytes of the text column as the opaque binary.
    In production this column arrives from the ingest pipeline (WARC body,
    image bytes, ...)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def _decode_image_batch(payloads: pd.Series) -> pd.DataFrame:
    """DECODE STUB — deterministic fake dimensions from the payload hash.

    Real implementation would be:
        from PIL import Image; Image.open(io.BytesIO(b)) ...
    which is unavailable in this container. The fake keeps every byte of the
    Spark-side contract (vectorized batch in, typed frame out) testable.
    """
    h16 = payloads.map(
        lambda b: int(hashlib.md5(bytes(b)).hexdigest()[:4], 16) if b is not None else 0
    ).to_numpy(dtype=np.int64)
    n_bytes = payloads.map(lambda b: len(b) if b is not None else 0).to_numpy(np.int64)
    return pd.DataFrame(
        {
            "n_bytes": n_bytes.astype("int32"),
            "width": (1 + (h16 % 64)).astype("int32"),
            "height": (1 + (h16 // 64 % 64)).astype("int32"),
            "channels": np.full(len(payloads), 3, dtype="int32"),
        }
    )


def decode_image_real(payloads: pd.Series) -> pd.DataFrame:
    """The real-decoder integration point."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "replace _decode_image_batch with a PIL/torchvision decoder"
    )


def image_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Per-payload decoded metadata via Arrow-batched mapInPandas."""

    def kernel(batches):
        for pdf in batches:
            meta = _decode_image_batch(pdf[payload_col])
            meta.insert(0, "doc_id", pdf["doc_id"].to_numpy())
            yield meta

    return df.select("doc_id", payload_col).mapInPandas(kernel, IMAGE_META_SCHEMA)


def sample_frames(df: DataFrame, payload_col: str = "payload", max_frames: int = 4) -> DataFrame:
    """Frame sampling for video-like payloads: 1 + hash%max frames per doc,
    each with a deterministic content hash (stub for a real frame extractor).
    Output is exploded (doc_id, frame_id, frame_hash) — the downstream shape
    a feature-extraction stage consumes."""

    def kernel(batches):
        for pdf in batches:
            out_d, out_f, out_h = [], [], []
            for did, b in zip(pdf["doc_id"], pdf[payload_col]):
                b = bytes(b) if b is not None else b""
                n = 1 + int(hashlib.md5(b).hexdigest()[:4], 16) % max_frames
                for fi in range(n):
                    out_d.append(did)
                    out_f.append(fi)
                    out_h.append(hashlib.md5(b + str(fi).encode()).hexdigest())
            yield pd.DataFrame({"doc_id": out_d, "frame_id": out_f, "frame_hash": out_h})

    return df.select("doc_id", payload_col).mapInPandas(kernel, FRAME_SCHEMA)


def resize_images(df: DataFrame, payload_col: str = "payload", size: int = 224) -> DataFrame:
    """Resize stub: passes payloads through a mapInPandas stage that would
    hold the vectorized resize; emits target dims so the plumbing is typed."""

    def kernel(batches):
        for pdf in batches:
            meta = _decode_image_batch(pdf[payload_col])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "out_width": np.minimum(meta["width"], size).astype("int32"),
                    "out_height": np.minimum(meta["height"], size).astype("int32"),
                }
            )

    return df.select("doc_id", payload_col).mapInPandas(
        kernel, "doc_id long, out_width int, out_height int"
    )
