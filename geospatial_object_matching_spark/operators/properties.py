"""objects → properties: the 25-column geometric property operator
(SURVEY.md §2.8; reference object_properties.py).

One ``mapInPandas`` pass emits all 25 columns from the geometry buffers —
the reference's per-property ``multiprocessing.Pool`` fan-out
(object_properties.py:43-48) collapses into partition parallelism, and its
area/perimeter/volume memoization (:101-107,176-186,204-215) collapses into
computing each base quantity once per object inside the kernel.

log1p normalization (object_properties.py:63-65) is a kernel flag so the
normalized and raw variants share one code path.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.types as T

from ..config import OBJECT_PROPERTIES
from ..functions.geometry import compute_properties_batch

PROPERTIES_SCHEMA = T.StructType(
    [
        T.StructField("obj_id", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
    ]
    + [T.StructField(p, T.DoubleType(), True) for p in OBJECT_PROPERTIES]
)


def compute_properties(objects: DataFrame, log1p: bool = True) -> DataFrame:
    """Wide property table ``properties(obj_id, source, p1..p25)``."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            coords_list = [np.asarray(c, dtype=np.float64) for c in pdf["coords"]]
            offsets_list = [np.asarray(o, dtype=np.int64) for o in pdf["ring_offsets"]]
            cols = compute_properties_batch(coords_list, offsets_list, log1p=log1p)
            out = pd.DataFrame({"obj_id": pdf["obj_id"].values, "source": pdf["source"].values})
            for name in OBJECT_PROPERTIES:
                out[name] = cols[name]
            yield out

    return objects.select("obj_id", "source", "coords", "ring_offsets").mapInPandas(
        kernel, schema=PROPERTIES_SCHEMA
    )


PAGES_PROPERTIES_SCHEMA = T.StructType(
    [
        T.StructField("obj_id", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("lat", T.DoubleType(), False),
        T.StructField("lon", T.DoubleType(), False),
        T.StructField("cell_id", T.LongType(), False),
        T.StructField("n_surfaces", T.IntegerType(), False),
    ]
    + [T.StructField(p, T.DoubleType(), True) for p in OBJECT_PROPERTIES]
)


def pages_to_properties(
    pages, zoom: int = 15, log1p: bool = True
):
    """Fused pages → properties: parse + 25-property kernel in ONE
    mapInPandas pass, so mesh coordinate buffers never cross the Arrow
    boundary (the unfused path serializes ~2.5 KB of coords per object
    out of the extract stage just to read them back in this one)."""
    from ..functions.cells import lonlat_to_cell
    from .extract import parse_pages_batch

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta: dict[str, list] = {
                k: [] for k in ("obj_id", "source", "url", "lat", "lon", "n_surfaces")
            }
            coords_list: list[np.ndarray] = []
            offsets_list: list[np.ndarray] = []
            for oid, src, url, lat, lon, coords, offsets, _ in parse_pages_batch(pdf):
                meta["obj_id"].append(oid)
                meta["source"].append(src)
                meta["url"].append(url)
                meta["lat"].append(lat)
                meta["lon"].append(lon)
                meta["n_surfaces"].append(len(offsets) - 1)
                coords_list.append(coords)
                offsets_list.append(offsets)
            if not meta["obj_id"]:
                continue
            out = pd.DataFrame(meta)
            out["cell_id"] = lonlat_to_cell(
                np.array(meta["lon"]), np.array(meta["lat"]), zoom
            )
            cols = compute_properties_batch(coords_list, offsets_list, log1p=log1p)
            for name in OBJECT_PROPERTIES:
                out[name] = cols[name]
            yield out[[f.name for f in PAGES_PROPERTIES_SCHEMA.fields]]

    return pages.select("url", "text").mapInPandas(
        kernel, schema=PAGES_PROPERTIES_SCHEMA
    )
