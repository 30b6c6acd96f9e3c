"""Deterministic synthetic ``pages`` table (FIXTURES.md §A).

Common-Crawl-style rows: ``pages(url, warc_ts, html, text, lang)``; each
page's ``text`` ends with a machine-parsable block carrying a serialized
3-D building mesh:

    GEO:{lat:.6f},{lon:.6f} ID:{obj_id} SRC:{source} MESH:{b64 float32 xyz} RINGS:{offsets csv}

Two sources mirror the reference's two mesh sets (cands = district files,
index = 3DBAG tiles; reference pipelines.py:204-226): every entity has a
``cands`` page; ~80% also have an ``index`` page whose mesh differs by a
per-source systematic discrepancy (scale ×(1+ε), vertex jitter, ring
rotation) — reference ``non_matched_rat=0.2`` (data_partition.py:123).

All randomness is hash-derived per entity id (stable across runs,
partitionings and scales). Positions come from Zipf-weighted city clusters
to produce hot cells for skew tests. Mesh coordinates are global
equirectangular meters so centroid blocking (blocking.py:62-76) is
meaningful; ``lonlat_of_xy`` inverts the projection for tiling/PIP.
"""

from __future__ import annotations

import base64
import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# fixed projection constants (equirectangular around lat0)
LAT0 = 52.0
LON0 = 4.0
M_PER_DEG_LAT = 111_320.0
M_PER_DEG_LON = M_PER_DEG_LAT * float(np.cos(np.radians(LAT0)))

# Zipf-weighted city cluster centers (lon, lat)
CITY_CENTERS = [
    (4.30, 52.07),  # Den Haag
    (4.47, 51.92),  # Rotterdam
    (4.89, 52.37),  # Amsterdam
    (5.12, 52.09),  # Utrecht
    (4.49, 52.16),  # Leiden
    (5.47, 51.44),  # Eindhoven
    (6.57, 53.22),  # Groningen
    (5.30, 60.39),  # Bergen (far cluster)
]
CITY_WEIGHTS = np.array([1.0 / (i + 1) ** 1.2 for i in range(len(CITY_CENTERS))])
CITY_WEIGHTS /= CITY_WEIGHTS.sum()


def _entity_rng(obj_id: str, salt: str, seed: int) -> np.random.Generator:
    h = hashlib.md5(f"{seed}|{salt}|{obj_id}".encode()).digest()
    return np.random.Generator(np.random.PCG64(int.from_bytes(h[:8], "little")))


def xy_of_lonlat(lon: float, lat: float) -> tuple[float, float]:
    return (lon - LON0) * M_PER_DEG_LON, (lat - LAT0) * M_PER_DEG_LAT


def lonlat_of_xy(x: np.ndarray, y: np.ndarray):
    return x / M_PER_DEG_LON + LON0, y / M_PER_DEG_LAT + LAT0


def _base_building(obj_id: str, seed: int):
    """Deterministic base building for an entity: position + prism mesh
    parameters. Returns (lat, lon, ring_xy (m,2) local meters, height)."""
    rng = _entity_rng(obj_id, "base", seed)
    city = int(rng.choice(len(CITY_CENTERS), p=CITY_WEIGHTS))
    clon, clat = CITY_CENTERS[city]
    lon = clon + rng.normal(0.0, 0.01)
    lat = clat + rng.normal(0.0, 0.007)
    n_wall = int(rng.integers(8, 29))  # walls → n_wall+2 surfaces ∈ [10,30]
    radius = rng.uniform(2.5, 20.0)  # footprint 5–40 m across
    height = rng.uniform(3.0, 30.0)
    angles = np.sort(rng.uniform(0.0, 2.0 * np.pi, n_wall))
    radii = radius * rng.uniform(0.7, 1.3, n_wall)
    ring = np.stack([radii * np.cos(angles), radii * np.sin(angles)], axis=1)
    # per-vertex roof elevation variation (real roofs are not flat planes;
    # also keeps z-derived properties like num_floors non-degenerate)
    roof_z = height + rng.uniform(-0.08, 0.08, n_wall) * height
    return lat, lon, ring, roof_z


def _mesh_for_source(obj_id: str, source: str, seed: int):
    """Prism mesh (floor + roof + wall quads) in global meters, float32.

    Per-source discrepancy for ``index``: scale ×(1+ε), vertex jitter,
    ring start rotation — the Hague-style two-source mismatch."""
    lat, lon, ring, roof_z = _base_building(obj_id, seed)
    if source == "index":
        rng = _entity_rng(obj_id, "index-discrepancy", seed)
        scale = 1.0 + np.clip(rng.normal(0.0, 0.02), -0.06, 0.06)
        # resample the ring to a different vertex count (independent
        # acquisitions digitize different vertices — keeps count-valued
        # properties like num_vertices/num_floors from being identical
        # across sources), then scale + jitter + rotate
        m_old = len(ring)
        m_new = int(np.clip(m_old + rng.integers(-2, 3), 8, 28))
        if m_new != m_old:
            closed = np.vstack([ring, ring[:1]])
            zc = np.concatenate([roof_z, roof_z[:1]])
            t_old = np.linspace(0.0, 1.0, m_old + 1)
            t_new = np.linspace(0.0, 1.0, m_new, endpoint=False)
            ring = np.stack(
                [
                    np.interp(t_new, t_old, closed[:, 0]),
                    np.interp(t_new, t_old, closed[:, 1]),
                ],
                axis=1,
            )
            roof_z = np.interp(t_new, t_old, zc)
        ring = ring * scale + rng.normal(0.0, 0.05, ring.shape)
        roof_z = roof_z * scale
        roll = int(rng.integers(0, len(ring)))
        ring = np.roll(ring, roll, axis=0)
        roof_z = np.roll(roof_z, roll)
    cx, cy = xy_of_lonlat(lon, lat)
    ring_g = ring + np.array([cx, cy])
    m = len(ring_g)

    surfaces = []
    # outward-consistent orientation (floor normal down, roof up) so the
    # divergence-theorem volume (object_properties.py:203-215) is exact;
    # wall-quad fan splits share edges with the roof fan → closed mesh
    floor = np.column_stack([ring_g[::-1], np.zeros(m)])
    roof = np.column_stack([ring_g, roof_z])
    surfaces.append(floor)
    surfaces.append(roof)
    for i in range(m):
        j = (i + 1) % m
        quad = np.array(
            [
                [ring_g[i, 0], ring_g[i, 1], 0.0],
                [ring_g[j, 0], ring_g[j, 1], 0.0],
                [ring_g[j, 0], ring_g[j, 1], roof_z[j]],
                [ring_g[i, 0], ring_g[i, 1], roof_z[i]],
            ]
        )
        surfaces.append(quad)

    coords = np.concatenate(surfaces, axis=0).astype(np.float32)
    offsets = np.cumsum([0] + [len(s) for s in surfaces]).astype(np.int32)
    return lat, lon, coords, offsets


def serialize_mesh(coords: np.ndarray, offsets: np.ndarray) -> tuple[str, str]:
    b64 = base64.b64encode(coords.astype("<f4").tobytes()).decode("ascii")
    rings = ",".join(str(int(o)) for o in offsets)
    return b64, rings


def page_row(obj_id: str, source: str, seed: int) -> dict:
    lat, lon, coords, offsets = _mesh_for_source(obj_id, source, seed)
    b64, rings = serialize_mesh(coords, offsets)
    url = f"https://{source}.example.org/obj/{obj_id}"
    h = int.from_bytes(hashlib.md5(url.encode()).digest()[:8], "little")
    ts = pd.Timestamp("2024-01-01", tz="UTC") + pd.Timedelta(
        days=int(h % 365), seconds=int((h >> 9) % 86_400)
    )
    lang = "en" if (h >> 3) % 10 < 9 else "nl"
    body = (
        f"Open data record for building {obj_id} ({source} register). "
        f"Crawled footprint and elevation follow. "
        f"GEO:{lat:.6f},{lon:.6f} ID:{obj_id} SRC:{source} "
        f"MESH:{b64} RINGS:{rings}"
    )
    return {
        "url": url,
        "warc_ts": ts.tz_localize(None),
        "html": b"<html><body>" + body.encode() + b"</body></html>",
        "text": body,
        "lang": lang,
    }


def entity_ids(n_entities: int) -> list[str]:
    return [f"ent{i:07d}" for i in range(n_entities)]


def has_index_twin(obj_id: str, seed: int) -> bool:
    """~80% of entities get an index twin (non_matched_rat = 0.2)."""
    h = hashlib.md5(f"{seed}|twin|{obj_id}".encode()).digest()
    return h[0] % 10 < 8


def generate_pages_pdf(n_entities: int, seed: int = 42) -> pd.DataFrame:
    """Driver-side pandas generator (tests / small fixtures)."""
    rows = []
    for oid in entity_ids(n_entities):
        rows.append(page_row(oid, "cands", seed))
        if has_index_twin(oid, seed):
            rows.append(page_row(oid, "index", seed))
    return pd.DataFrame(rows)


def generate_pages_df(
    spark: SparkSession, n_entities: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed generator: spark.range over entity ids → mapInPandas.
    Row content is a pure function of (obj_id, source, seed), so the output
    is identical for any partitioning/parallelism."""
    parts = partitions or max(2, spark.sparkContext.defaultParallelism)
    base = spark.range(0, n_entities, numPartitions=parts)

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                oid = f"ent{int(i):07d}"
                rows.append(page_row(oid, "cands", seed))
                if has_index_twin(oid, seed):
                    rows.append(page_row(oid, "index", seed))
            yield pd.DataFrame(rows)[["url", "warc_ts", "html", "text", "lang"]]

    return base.mapInPandas(gen, schema=PAGES_SCHEMA)


def write_pages_parquet(
    spark: SparkSession, path: str, n_entities: int, seed: int = 42
) -> None:
    generate_pages_df(spark, n_entities, seed).write.mode("overwrite").parquet(path)
