"""Multimodal column plumbing (extension layer).

Image/audio/video payloads are opaque `binary` columns with a typed
metadata struct. Decode / feature-extract run as Arrow-batched
`mapInPandas` — the Spark-side contract (schema, batch shape, UDF
signature, partitioning) is real and tested; the actual media decode
is STUBBED (decode libs are not in this container): `decode_image`
raises NotImplementedError unless a deterministic fake is requested.

At scale: payloads stay columnar in parquet, `mapInPandas` streams
Arrow batches (no per-row pickling), and feature extraction is a
narrow transformation — no shuffle until a downstream aggregate.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id bigint, byte_len bigint, n_spaces bigint, head_md5 string"
DECODE_SCHEMA = "doc_id bigint, width int, height int, n_channels int, mean_px double"


def to_binary_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Model a multimodal table: (id, payload BINARY, meta STRUCT).
    Here the payload is the utf-8 text bytes standing in for an
    image/audio blob."""
    return docs.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.col("n_chars").cast("bigint").alias("n_bytes_meta"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


def extract_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": [len(b) for b in payloads],
                    "n_spaces": [bytes(b).count(b" ") for b in payloads],
                    "head_md5": [hashlib.md5(bytes(b)[:16]).hexdigest() for b in payloads],
                }
            )

    return binary_df.mapInPandas(fn, FEATURE_SCHEMA)


RESIZE_SCHEMA = "doc_id bigint, width int, height int, mean_px double"
FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_bytes bigint, frame_md5 string"


def resize_stub(decoded_df: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Resize stage stub: consumes the decode-stub output schema and
    emits fixed-dimension pseudo-images (real impl would wrap
    PIL.Image.resize in the same mapInPandas shape). Keeps mean_px —
    resizing preserves the mean under area averaging."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [width] * len(pdf),
                    "height": [height] * len(pdf),
                    "mean_px": pdf["mean_px"],
                }
            )

    return decoded_df.mapInPandas(fn, RESIZE_SCHEMA)


def frame_sample(binary_df: DataFrame, frame_size: int = 64, every_k: int = 4) -> DataFrame:
    """Frame-sampling stub for video-shaped payloads: treat the payload
    as consecutive `frame_size`-byte frames, keep every k-th, emit one
    row per sampled frame (UDTF-shaped: rows out > rows in). The
    Spark-side contract (explode inside mapInPandas, per-frame hashes)
    is the real thing; only the codec is fake."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_md5": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = max(1, (len(b) + frame_size - 1) // frame_size)
                for i in range(0, n_frames, every_k):
                    chunk = b[i * frame_size : (i + 1) * frame_size]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(len(chunk))
                    out["frame_md5"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(out)

    return binary_df.mapInPandas(fn, FRAME_SCHEMA)


def decode_image(binary_df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode stub: real decode needs PIL/libjpeg (NOT in this
    container). With fake=True, emits deterministic pseudo-image stats
    derived from the bytes so the downstream plumbing is testable."""
    try:
        import PIL.Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    if not have_pil and not fake:
        raise NotImplementedError(
            "image decode requires PIL/libjpeg which is not installed; "
            "pass fake=True for deterministic pseudo-decode"
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    # fake "header": dims from byte length, pseudo mean
                    # from the payload md5 — every stat is a pure
                    # function of the bytes, so the pipeline is
                    # cross-engine checkable (DuckDB md5(VARCHAR)
                    # hashes the same UTF-8 bytes)
                    "width": [max(1, len(b) % 640) for b in payloads],
                    "height": [max(1, (len(b) * 7) % 480) for b in payloads],
                    "n_channels": [3] * len(payloads),
                    "mean_px": [
                        (int(hashlib.md5(b).hexdigest()[:12], 16) % 25600) / 100.0
                        for b in payloads
                    ],
                }
            )

    return binary_df.mapInPandas(fn, DECODE_SCHEMA)
