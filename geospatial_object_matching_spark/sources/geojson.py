"""GeoJSON feature reader (SURVEY.md §2.1 S4; reference utils.py:226-235).

Pure column expressions: ``from_json`` parses the FeatureCollection,
``explode`` emits one row per feature, ``transform``/``slice`` drop the
GeoJSON ring's closing vertex (the reference's ``coords[:-1]``). No UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
import pyspark.sql.types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField(
            "features",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "properties",
                            T.MapType(T.StringType(), T.StringType()),
                        ),
                        T.StructField(
                            "geometry",
                            T.StructType(
                                [
                                    T.StructField("type", T.StringType()),
                                    T.StructField(
                                        "coordinates",
                                        T.ArrayType(
                                            T.ArrayType(
                                                T.ArrayType(T.DoubleType())
                                            )
                                        ),
                                    ),
                                ]
                            ),
                        ),
                    ]
                )
            ),
        )
    ]
)


def read_geojson_features(json_df: DataFrame, json_col: str = "value") -> DataFrame:
    """DataFrame of GeoJSON FeatureCollection strings → one row per
    feature: (feature_idx, geom_type, ring) with the closing vertex
    dropped from each polygon ring (utils.py:231-234 semantics)."""
    parsed = json_df.select(
        F.from_json(F.col(json_col), FEATURE_SCHEMA).alias("fc")
    )
    feats = parsed.select(
        F.posexplode("fc.features").alias("feature_idx", "f")
    )
    ring = F.col("f.geometry.coordinates")[0]
    open_ring = F.slice(ring, 1, F.greatest(F.size(ring) - 1, F.lit(0)))
    return feats.select(
        "feature_idx",
        F.col("f.geometry.type").alias("geom_type"),
        open_ring.alias("ring"),
    )
