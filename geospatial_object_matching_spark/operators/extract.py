"""pages → objects: vectorized geo-extraction (SURVEY.md §2.1 S1-S3).

Replaces the reference's CityJSON directory scan + mesh decode
(pipelines.py:142-151, 204-244) with an Arrow-batched ``mapInPandas``
kernel over the pages table: regex field extraction is pandas C-level;
mesh buffers decode with ``np.frombuffer`` per row inside the batch.

The per-row invariant (BASELINE.json input_hint) — byte-identical ``text``
per ``url`` — holds trivially: ``text`` passes through untouched when
``keep_text=True`` and is never rewritten anywhere in the engine.

Output schema (FIXTURES.md §B ``objects``): the min-surfaces filter
(>= 10, reference pipelines.py:144-145) is applied *inside* the kernel so
dropped meshes never cross the Arrow boundary.
"""

from __future__ import annotations

import base64
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.types as T

from ..config import MIN_SURFACES_NUM
from ..functions.cells import lonlat_to_cell

_GEO_RE = (
    r"GEO:(?P<lat>-?\d+\.\d+),(?P<lon>-?\d+\.\d+) "
    r"ID:(?P<obj_id>\S+) SRC:(?P<source>\S+) "
    r"MESH:(?P<mesh>\S+) RINGS:(?P<rings>\S+)"
)


def objects_schema(keep_text: bool, keep_ts: bool = False) -> T.StructType:
    fields = [
        T.StructField("obj_id", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("coords", T.ArrayType(T.DoubleType()), False),
        T.StructField("ring_offsets", T.ArrayType(T.IntegerType()), False),
        T.StructField("n_surfaces", T.IntegerType(), False),
        T.StructField("lat", T.DoubleType(), False),
        T.StructField("lon", T.DoubleType(), False),
        T.StructField("centroid_x", T.DoubleType(), False),
        T.StructField("centroid_y", T.DoubleType(), False),
        T.StructField("centroid_z", T.DoubleType(), False),
        T.StructField("cell_id", T.LongType(), False),
        T.StructField("cell_res", T.IntegerType(), False),
    ]
    if keep_text:
        fields.append(T.StructField("text", T.StringType(), True))
    if keep_ts:
        fields.append(T.StructField("warc_ts", T.TimestampType(), True))
    return T.StructType(fields)


def parse_pages_batch(pdf: pd.DataFrame, min_surfaces: int = MIN_SURFACES_NUM):
    """Shared vectorized parse of one Arrow batch of pages: regex field
    extraction (pandas C), mesh buffer decode, min-surfaces filter.
    Yields (obj_id, source, url, lat, lon, coords, offsets, text)."""
    if len(pdf) == 0:
        return
    ext = pdf["text"].str.extract(_GEO_RE)
    ok = ext["obj_id"].notna()
    if not ok.any():
        return
    ext = ext[ok]
    src_pdf = pdf[ok]
    lats = ext["lat"].astype(np.float64).to_numpy()
    lons = ext["lon"].astype(np.float64).to_numpy()
    for i, (mesh_b64, rings_csv) in enumerate(
        zip(ext["mesh"].to_numpy(), ext["rings"].to_numpy())
    ):
        coords = np.frombuffer(base64.b64decode(mesh_b64), dtype="<f4").astype(
            np.float64
        )
        offsets = np.array(rings_csv.split(","), dtype=np.int64)
        if len(offsets) - 1 < min_surfaces:
            continue
        yield (
            ext["obj_id"].iloc[i],
            ext["source"].iloc[i],
            src_pdf["url"].iloc[i],
            lats[i],
            lons[i],
            coords,
            offsets,
            src_pdf["text"].iloc[i],
        )


def extract_objects(
    pages: DataFrame,
    zoom: int = 15,
    min_surfaces: int = MIN_SURFACES_NUM,
    keep_text: bool = False,
    keep_ts: bool = False,
) -> DataFrame:
    """Parse serialized geospatial objects out of page text.

    Column pruning matters at 100 TB: only ``url``/``text`` (plus
    ``warc_ts`` when ``keep_ts`` — the streaming event-time carrier) are
    read from the scan (``html`` never leaves parquet).
    """
    schema = objects_schema(keep_text, keep_ts)
    col_names = [f.name for f in schema.fields]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {name: [] for name in col_names}
            ts_by_url = (
                dict(zip(pdf["url"], pdf["warc_ts"])) if keep_ts else None
            )
            for oid, src, url, lat, lon, coords, offsets, text in parse_pages_batch(
                pdf, min_surfaces
            ):
                pts = coords.reshape(-1, 3)
                uniq = np.unique(pts, axis=0)
                centroid = uniq.mean(axis=0)
                rows["obj_id"].append(oid)
                rows["source"].append(src)
                rows["url"].append(url)
                rows["coords"].append(coords)
                rows["ring_offsets"].append(offsets.astype(np.int32))
                rows["n_surfaces"].append(len(offsets) - 1)
                rows["lat"].append(lat)
                rows["lon"].append(lon)
                rows["centroid_x"].append(centroid[0])
                rows["centroid_y"].append(centroid[1])
                rows["centroid_z"].append(centroid[2])
                rows["cell_id"].append(
                    int(lonlat_to_cell(np.array([lon]), np.array([lat]), zoom)[0])
                )
                rows["cell_res"].append(zoom)
                if keep_text:
                    rows["text"].append(text)
                if keep_ts:
                    rows["warc_ts"].append(ts_by_url[url])
            if rows["obj_id"]:
                yield pd.DataFrame(rows)[col_names]

    # prune to exactly the columns the kernel touches before the UDF
    cols = ["url", "text"] + (["warc_ts"] if keep_ts else [])
    return pages.select(*cols).mapInPandas(kernel, schema=schema)


def standardize_ids(objects: DataFrame) -> DataFrame:
    """Key standardization (reference pipelines.py:246-253): strip the
    ``bag_`` prefix from cands ids and the ``NL.IMBAG.Pand.``/``-0`` wrapper
    from index ids. Pure column expressions — no UDF."""
    from pyspark.sql import functions as F

    cleaned = (
        F.when(
            objects.source == "cands",
            F.regexp_replace("obj_id", r"^bag_", ""),
        )
        .otherwise(
            F.regexp_replace(
                F.regexp_replace("obj_id", r"^NL\.IMBAG\.Pand\.", ""), r"-0$", ""
            )
        )
    )
    return objects.withColumn("obj_id", cleaned)
