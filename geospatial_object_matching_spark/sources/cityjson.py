"""CityJSON source (SURVEY.md §2.1 S1; reference pipelines.py:142-151,
204-244).

Reads CityJSON documents — one JSON per tile/file with a global
``vertices`` array and per-object ``CityObjects[key].geometry[0]
.boundaries[0]`` surface index lists — into the engine's ``objects``
schema (flat coord buffers + ring offsets). The reference resolves
boundary indices against the vertex table per object
(``_get_polygon_mesh``); here that happens inside one Arrow-batched
kernel over a DataFrame of raw JSON strings, so a directory of CityJSON
tiles is just ``spark.read.text(dir, wholetext=True)`` → this operator.

Objects with fewer than ``min_surfaces`` surfaces are dropped
(pipelines.py:144-145).
"""

from __future__ import annotations

import json
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.types as T

from ..config import MIN_SURFACES_NUM

CITYJSON_OBJECTS_SCHEMA = T.StructType(
    [
        T.StructField("obj_id", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("coords", T.ArrayType(T.DoubleType()), False),
        T.StructField("ring_offsets", T.ArrayType(T.IntegerType()), False),
        T.StructField("n_surfaces", T.IntegerType(), False),
        T.StructField("centroid_x", T.DoubleType(), False),
        T.StructField("centroid_y", T.DoubleType(), False),
        T.StructField("centroid_z", T.DoubleType(), False),
    ]
)


def parse_cityjson_doc(doc: str, source: str, min_surfaces: int):
    """One CityJSON document → iterable of object rows (reference
    ``_get_polygon_mesh`` semantics: boundaries[0] indices resolved
    against the global vertex array, one surface per index list)."""
    data = json.loads(doc)
    vertices = np.asarray(data["vertices"], dtype=np.float64)
    scale = np.asarray(
        data.get("transform", {}).get("scale", [1.0, 1.0, 1.0]), dtype=np.float64
    )
    translate = np.asarray(
        data.get("transform", {}).get("translate", [0.0, 0.0, 0.0]),
        dtype=np.float64,
    )
    vertices = vertices * scale + translate
    for obj_id, obj in data.get("CityObjects", {}).items():
        geoms = obj.get("geometry") or []
        if not geoms:
            continue
        boundaries = geoms[0].get("boundaries") or []
        if not boundaries:
            continue
        surfaces = boundaries[0] if isinstance(boundaries[0][0], list) else boundaries
        # each surface is a list of rings; reference takes ring [0]
        rings = []
        for surf in surfaces:
            ring_idx = surf[0] if isinstance(surf[0], list) else surf
            rings.append(np.asarray(ring_idx, dtype=np.int64))
        if len(rings) < min_surfaces:
            continue
        coords = np.concatenate([vertices[r] for r in rings]).ravel()
        offsets = np.cumsum([0] + [len(r) for r in rings]).astype(np.int32)
        pts = coords.reshape(-1, 3)
        uniq = np.unique(pts, axis=0)
        centroid = uniq.mean(axis=0)
        yield obj_id, coords, offsets, len(rings), centroid


def read_cityjson(
    json_docs: DataFrame,
    source: str,
    doc_col: str = "value",
    min_surfaces: int = MIN_SURFACES_NUM,
) -> DataFrame:
    """DataFrame of CityJSON document strings → objects table."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                k: []
                for k in (
                    "obj_id", "source", "coords", "ring_offsets", "n_surfaces",
                    "centroid_x", "centroid_y", "centroid_z",
                )
            }
            for doc in pdf[doc_col]:
                for oid, coords, offsets, n_surf, cen in parse_cityjson_doc(
                    doc, source, min_surfaces
                ):
                    rows["obj_id"].append(oid)
                    rows["source"].append(source)
                    rows["coords"].append(coords)
                    rows["ring_offsets"].append(offsets)
                    rows["n_surfaces"].append(n_surf)
                    rows["centroid_x"].append(cen[0])
                    rows["centroid_y"].append(cen[1])
                    rows["centroid_z"].append(cen[2])
            if rows["obj_id"]:
                yield pd.DataFrame(rows)

    return json_docs.select(doc_col).mapInPandas(
        kernel, schema=CITYJSON_OBJECTS_SCHEMA
    )


def read_cityjson_dir(
    spark: SparkSession, path: str, source: str, min_surfaces: int = MIN_SURFACES_NUM
) -> DataFrame:
    """Directory of CityJSON tiles → objects (S1 small-scale form)."""
    docs = spark.read.text(path, wholetext=True)
    return read_cityjson(docs, source, doc_col="value", min_surfaces=min_surfaces)
