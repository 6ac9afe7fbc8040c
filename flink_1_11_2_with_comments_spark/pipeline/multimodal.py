"""Multimodal columns: image/audio/video as opaque binary + metadata.

The Spark-side plumbing is real — binary columns, typed metadata
structs, Arrow-batched feature extraction over mapInPandas with
correct batch shapes and partitioning. The codec step itself (JPEG
decode, audio resample, frame sampling) is STUBBED: the image/audio
libraries are not in this container, so `decode_image` raises
NotImplementedError unless the deterministic fake decoder is chosen.
At 100 TB the pattern is: binary column stays columnar in parquet,
decode runs in executor-side Python with Arrow batches, outputs are
fixed-width feature columns — no driver involvement.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("doc_id bigint, media binary, media_type string, "
                "width int, height int, n_bytes bigint")

FEATURE_SCHEMA = ("doc_id bigint, n_bytes bigint, byte_mean double, "
                  "byte_min int, byte_max int, phash bigint")


def synthesize_media(documents: DataFrame) -> DataFrame:
    """Derive a deterministic fake 'image' binary per document (the
    text bytes stand in for pixel data) + typed metadata columns —
    the schema/partitioning shape of a real multimodal table."""
    return documents.select(
        "doc_id",
        F.encode("text", "utf-8").alias("media"),
        F.lit("image/fake").alias("media_type"),
        (F.length("text") % 64 + 1).cast("int").alias("width"),
        (F.length("text") % 48 + 1).cast("int").alias("height"),
        F.octet_length(F.encode("text", "utf-8")).cast("bigint")
        .alias("n_bytes"))


def decode_image(data: bytes):
    """Real codec hook — not available in this environment.

    A deployment installs pillow/torchvision and replaces this;
    everything downstream (schemas, batching) is codec-agnostic.
    """
    raise NotImplementedError(
        "image codecs not available in this container; "
        "use extract_features(..., fake_decode=True)")


def extract_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Feature extraction over binary media via Arrow-batched pandas.

    mapInPandas: one Python worker per partition, whole Arrow batches
    in/out — the only sane shape for per-item binary processing at
    scale (never a row-at-a-time UDF).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                if not fake_decode:
                    decode_image(bytes(blob))  # raises: real codec absent
                b = bytes(blob)
                rows.append({
                    "doc_id": int(doc_id),
                    "n_bytes": len(b),
                    "byte_mean": (sum(b) / len(b)) if b else 0.0,
                    "byte_min": min(b) if b else 0,
                    "byte_max": max(b) if b else 0,
                    # deterministic perceptual-hash stand-in
                    "phash": int.from_bytes(
                        __import__("hashlib").md5(b).digest()[:8],
                        "big", signed=False) >> 1,
                })
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, FEATURE_SCHEMA)
