"""Multimodal (image/audio/video) column plumbing.

Media rides as opaque ``binary`` columns with typed metadata structs; the
Spark-side machinery — schema, partition sizing, Arrow batch shape,
``mapInPandas`` kernel signatures — is real and tested. The actual codec
calls are STUBBED (no image/audio libraries in this container): decode
raises ``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic byte-histogram "feature" so the distributed plumbing can be
exercised end-to-end.

At 100 TB the rules encoded here: media bytes never enter a shuffle (all
feature extraction happens scan-side in one mapInPandas pass before any
join), batches are row-capped so a batch of 10-MB blobs cannot OOM an
Arrow transfer, and outputs carry only fixed-width features + metadata.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
import pyspark.sql.types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)

FEATURE_DIM = 64

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ]
)


def _decode_image(blob: bytes):
    """Real decode hook — wire PIL/opencv here when available."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "environment; call with fake=True for the deterministic stand-in"
    )


def _fake_features(blob: bytes) -> np.ndarray:
    """Deterministic stand-in feature: normalized 64-bin byte histogram."""
    arr = np.frombuffer(blob, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
    total = hist.sum()
    return (hist / total if total else hist).astype(np.float64)


def extract_media_features(
    media: DataFrame,
    id_col: str = "media_id",
    blob_col: str = "blob",
    fake: bool = False,
    batch_rows: int = 256,
) -> DataFrame:
    """binary blobs → fixed-width feature vectors, one Arrow-batched pass.

    ``batch_rows`` caps rows per Arrow batch *for this operator* — set
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` accordingly when
    blobs are large (10 MB blobs × 4096 default rows = 40 GB batch: no)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for s in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[s : s + batch_rows]
                ids, nbytes, feats = [], [], []
                for mid, blob in zip(chunk[id_col], chunk[blob_col]):
                    blob = bytes(blob or b"")
                    feats.append(
                        _fake_features(blob) if fake else _decode_image(blob)
                    )
                    ids.append(mid)
                    nbytes.append(len(blob))
                yield pd.DataFrame(
                    {"media_id": ids, "n_bytes": nbytes, "features": feats}
                )

    return media.select(
        F.col(id_col).alias(id_col), F.col(blob_col).alias(blob_col)
    ).mapInPandas(kernel, schema=FEATURES_SCHEMA)


def frame_sample_plan(
    media: DataFrame, every_n: int = 30, id_col: str = "media_id"
) -> DataFrame:
    """Video frame-sampling *plan*: emits (media_id, frame_idx) rows for a
    stub decoder — demonstrates the explode-side fan-out shape (frames
    are rows, not arrays, so downstream repartitioning balances work)."""
    return media.select(
        id_col,
        F.explode(
            F.sequence(F.lit(0), F.lit(10) * every_n - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
