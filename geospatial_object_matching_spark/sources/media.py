"""Planted-image media fixture: deterministic tiny raster images encoded
as real uncompressed container bytes (BMP BI_RGB 24-bit, binary PPM P6),
so the multimodal decode path (operators/multimodal.py::_decode_image)
can be exercised and oracle-checked end-to-end without any imaging
library or external data.

Pattern spec (reimplemented independently by tools/gen_expected.py —
keep in sync BY SPEC, not by import):

    image i of a seeded set: id = "img{i:05d}"
    coef(c, k)   = int(md5(f"{seed}|{id}|{c}|{k}").hexdigest()[:8], 16)
    w            = 16 + coef(9, 0) % 17     (covers BMP row-padding ≠ 0)
    h            = 12 + coef(9, 1) % 13
    container    = BMP if coef(9, 2) % 2 == 0 else PPM
    pixel[y,x,c] = (a·x + b·y + d·x·y + e) mod 256,
                   (a,b,d,e) = coef(c, 0..3) % 256  per channel c ∈ 0..2

All-integer arithmetic → bit-exact across implementations.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def _coef(seed: int, mid: str, c: int, k: int) -> int:
    return int(
        hashlib.md5(f"{seed}|{mid}|{c}|{k}".encode()).hexdigest()[:8], 16
    )


def planted_pixels(seed: int, mid: str) -> np.ndarray:
    """(h, w, 3) uint8 pattern per the module spec."""
    w = 16 + _coef(seed, mid, 9, 0) % 17
    h = 12 + _coef(seed, mid, 9, 1) % 13
    ys, xs = np.mgrid[0:h, 0:w]
    img = np.empty((h, w, 3), dtype=np.uint8)
    for c in range(3):
        a = _coef(seed, mid, c, 0) % 256
        b = _coef(seed, mid, c, 1) % 256
        d = _coef(seed, mid, c, 2) % 256
        e = _coef(seed, mid, c, 3) % 256
        img[:, :, c] = ((a * xs + b * ys + d * xs * ys + e) % 256).astype(
            np.uint8
        )
    return img


def encode_bmp(img: np.ndarray) -> bytes:
    """Minimal BMP writer: BITMAPINFOHEADER, BI_RGB, 24-bit, bottom-up,
    4-byte-padded rows (the standard Windows layout)."""
    h, w, _ = img.shape
    row = (w * 3 + 3) // 4 * 4
    data = np.zeros((h, row), dtype=np.uint8)
    bgr = img[::-1, :, ::-1]  # bottom-up rows, BGR channel order
    data[:, : w * 3] = bgr.reshape(h, w * 3)
    pixels = data.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
    )
    return header + pixels


def encode_ppm(img: np.ndarray) -> bytes:
    """Binary PPM (P6, maxval 255)."""
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()


def generate_media_pdf(n: int, seed: int = 5) -> pd.DataFrame:
    """(media_id, mime, blob) — half BMP, half PPM by id hash."""
    rows = []
    for i in range(n):
        mid = f"img{i:05d}"
        img = planted_pixels(seed, mid)
        if _coef(seed, mid, 9, 2) % 2 == 0:
            mime, blob = "image/bmp", encode_bmp(img)
        else:
            mime, blob = "image/x-portable-pixmap", encode_ppm(img)
        rows.append({"media_id": mid, "mime": mime, "blob": blob})
    return pd.DataFrame(rows)


def generate_media_df(
    spark: SparkSession, n: int, seed: int = 5, partitions: int | None = None
) -> DataFrame:
    """Distributed planted-image fixture: ids are generated as a range and
    rendered/encoded scan-side in mapInPandas, so no driver materializes
    blobs (the 100-TB shape: blobs are born on executors)."""
    from typing import Iterator

    from pyspark.sql import functions as F
    import pyspark.sql.types as T

    P = partitions or spark.sparkContext.defaultParallelism
    ids = spark.range(n, numPartitions=P).select(
        F.format_string("img%05d", F.col("id").cast("int")).alias("media_id")
    )
    schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("mime", T.StringType(), False),
            T.StructField("blob", T.BinaryType(), False),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, mimes, blobs = [], [], []
            for mid in pdf["media_id"]:
                img = planted_pixels(seed, mid)
                if _coef(seed, mid, 9, 2) % 2 == 0:
                    mimes.append("image/bmp")
                    blobs.append(encode_bmp(img))
                else:
                    mimes.append("image/x-portable-pixmap")
                    blobs.append(encode_ppm(img))
                mids.append(mid)
            yield pd.DataFrame(
                {"media_id": mids, "mime": mimes, "blob": blobs}
            )

    return ids.mapInPandas(kernel, schema=schema)
