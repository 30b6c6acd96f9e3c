"""Sources + auxiliary operators: GeoJSON reader, Kabsch transform,
multimodal plumbing, results sink."""

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from geospatial_object_matching_spark.operators.extract import (
    extract_objects,
    standardize_ids,
)
from geospatial_object_matching_spark.operators.multimodal import (
    extract_media_features,
    frame_sample_plan,
)
from geospatial_object_matching_spark.operators.transform import (
    apply_centroid_transform,
    fit_centroid_transform,
)
from geospatial_object_matching_spark.sources.geojson import read_geojson_features
from geospatial_object_matching_spark.sources.pages import generate_pages_df
from geospatial_object_matching_spark.sources.results import seed_mean_results


class TestGeoJSON:
    def test_feature_rings(self, spark):
        fc = {
            "features": [
                {
                    "properties": {"name": "a"},
                    "geometry": {
                        "type": "Polygon",
                        "coordinates": [
                            [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]]
                        ],
                    },
                },
                {
                    "properties": {"name": "b"},
                    "geometry": {
                        "type": "Polygon",
                        "coordinates": [[[5.0, 5.0], [6.0, 5.0], [5.0, 6.0], [5.0, 5.0]]],
                    },
                },
            ]
        }
        df = spark.createDataFrame([(json.dumps(fc),)], "value string")
        out = read_geojson_features(df).collect()
        assert len(out) == 2
        # closing vertex dropped (reference utils.py:231-234)
        assert [list(p) for p in out[0]["ring"]] == [
            [0.0, 0.0], [1.0, 0.0], [1.0, 1.0],
        ]
        assert out[1]["feature_idx"] == 1


class TestCityJSON:
    def _make_doc(self, objs):
        """Minimal CityJSON doc: shared vertex table + boundary indices."""
        vertices = []
        city_objects = {}
        for oid, surfaces in objs.items():
            boundaries = []
            for surf in surfaces:
                ring = []
                for v in surf:
                    ring.append(len(vertices))
                    vertices.append(list(v))
                boundaries.append([ring])
            city_objects[oid] = {
                "type": "Building",
                "geometry": [{"type": "Solid", "boundaries": [boundaries]}],
            }
        return json.dumps(
            {"type": "CityJSON", "vertices": vertices, "CityObjects": city_objects}
        )

    def test_parse_resolves_indices_and_filters(self, spark):
        import itertools

        # a box-ish object with 10 surfaces (passes filter) and a 2-surface
        # object (dropped, pipelines.py:144-145)
        def quad(z):
            return [(0, 0, z), (1, 0, z), (1, 1, z), (0, 1, z)]

        big = [quad(float(i)) for i in range(10)]
        small = [quad(0.0), quad(1.0)]
        doc = self._make_doc({"bag_big": big, "tiny": small})
        df = spark.createDataFrame([(doc,)], "value string")

        from geospatial_object_matching_spark.sources.cityjson import read_cityjson

        out = read_cityjson(df, source="cands").collect()
        assert [r["obj_id"] for r in out] == ["bag_big"]
        r = out[0]
        assert r["n_surfaces"] == 10
        coords = np.asarray(r["coords"]).reshape(-1, 3)
        assert coords.shape == (40, 3)
        # vertex indices resolved: first surface is quad(0)
        np.testing.assert_allclose(coords[:4], np.asarray(quad(0.0), dtype=float))
        # centroid = mean of unique vertices
        uniq = np.unique(coords, axis=0)
        assert r["centroid_z"] == pytest.approx(uniq[:, 2].mean())

    def test_transform_scale_translate(self, spark):
        doc = json.loads(
            self._make_doc(
                {"o": [[(0, 0, z), (10, 0, z), (10, 10, z), (0, 10, z)] for z in range(10)]}
            )
        )
        doc["transform"] = {"scale": [0.001, 0.001, 0.001], "translate": [100.0, 200.0, 0.0]}
        df = spark.createDataFrame([(json.dumps(doc),)], "value string")
        from geospatial_object_matching_spark.sources.cityjson import read_cityjson

        r = read_cityjson(df, source="index").collect()[0]
        coords = np.asarray(r["coords"]).reshape(-1, 3)
        assert coords[:, 0].min() == pytest.approx(100.0)
        assert coords[:, 1].max() == pytest.approx(200.01)


class TestStandardizeIds:
    def test_prefix_suffix_stripping(self, spark):
        rows = [
            ("bag_123", "cands"),
            ("NL.IMBAG.Pand.456-0", "index"),
            ("plain", "cands"),
        ]
        df = spark.createDataFrame(rows, "obj_id string, source string")
        out = {r["source"] + ":" + r["obj_id"] for r in standardize_ids(df).collect()}
        assert out == {"cands:123", "index:456", "cands:plain"}


class TestKabsch:
    def test_recovers_planted_transform(self, spark):
        rng = np.random.default_rng(2)
        n = 200
        pts = rng.normal(0, 50, (n, 3))
        theta = 0.3
        R = np.array(
            [
                [np.cos(theta), -np.sin(theta), 0],
                [np.sin(theta), np.cos(theta), 0],
                [0, 0, 1],
            ]
        )
        s, t = 1.05, np.array([10.0, -5.0, 2.0])
        # cands frame = s*R*index + t
        index_pts = pts
        cands_pts = s * index_pts @ R.T + t
        rows = []
        for i in range(n):
            rows.append((f"e{i}", "cands", *map(float, cands_pts[i])))
            rows.append((f"e{i}", "index", *map(float, index_pts[i])))
        df = spark.createDataFrame(
            rows,
            "obj_id string, source string, centroid_x double, centroid_y double, "
            "centroid_z double",
        )
        params = fit_centroid_transform(df)
        assert params["scale"] == pytest.approx(s, rel=1e-6)
        out = apply_centroid_transform(df, params).toPandas()
        # transformed index centroids must land on their cands twins
        piv = out.pivot_table(
            index="obj_id", columns="source",
            values=["centroid_x", "centroid_y", "centroid_z"],
        )
        for ax in ("centroid_x", "centroid_y", "centroid_z"):
            np.testing.assert_allclose(
                piv[(ax, "cands")], piv[(ax, "index")], atol=1e-6
            )


class TestMultimodal:
    def test_fake_feature_plumbing(self, spark):
        rows = [(f"m{i}", bytes([i % 7] * (100 + i))) for i in range(50)]
        df = spark.createDataFrame(rows, "media_id string, blob binary")
        out = extract_media_features(df, fake=True).toPandas()
        assert len(out) == 50
        assert all(len(f) == 64 for f in out["features"])
        np.testing.assert_allclose(
            [sum(f) for f in out["features"]], 1.0, atol=1e-9
        )
        assert set(out["n_bytes"]) == {100 + i for i in range(50)}

    def test_compressed_decode_still_stubbed(self, spark):
        """PNG magic (no codec library in env) must raise, not fake."""
        df = spark.createDataFrame(
            [("m", b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)],
            "media_id string, blob binary",
        )
        with pytest.raises(Exception):
            extract_media_features(df, fake=False).collect()

    def test_decode_roundtrip_bmp_ppm(self):
        """Pure-numpy decode inverts the fixture encoders exactly, incl.
        BMP 4-byte row padding (widths chosen so w*3 % 4 ≠ 0)."""
        from geospatial_object_matching_spark.operators.multimodal import (
            _decode_image,
        )
        from geospatial_object_matching_spark.sources.media import (
            encode_bmp,
            encode_ppm,
            planted_pixels,
        )

        for i in range(20):
            img = planted_pixels(5, f"img{i:05d}")
            np.testing.assert_array_equal(_decode_image(encode_bmp(img)), img)
            np.testing.assert_array_equal(_decode_image(encode_ppm(img)), img)

    def test_planted_image_oracle_parity_and_flip(self, spark):
        """The image_features query output must equal the independent
        pixels-from-spec oracle exactly, and a corrupted pixel byte (a
        simulated decoder regression) must be caught."""
        import importlib
        import os as _os
        import sys as _sys

        tools_dir = _os.path.join(
            _os.path.dirname(_os.path.dirname(__file__)), "tools"
        )
        _sys.path.insert(0, tools_dir)
        try:
            gen = importlib.import_module("gen_expected")
        finally:
            _sys.path.remove(tools_dir)
        from geospatial_object_matching_spark.operators.multimodal import (
            _decode_image,
            _pixel_features,
        )
        from geospatial_object_matching_spark.sources.media import (
            generate_media_pdf,
        )

        n = 30
        expected = gen.expected_image_features(n, seed=5)
        media = generate_media_pdf(n, seed=5)
        got_rows = []
        for mid, blob in zip(media["media_id"], media["blob"]):
            img = _decode_image(bytes(blob))
            for bi, v in enumerate(_pixel_features(img)):
                got_rows.append(
                    (mid, len(blob), bi, np.floor(v * 1e6 + 0.5) / 1e6)
                )
        exp_rows = [
            (r.media_id, r.n_bytes, int(r.bin), r.value)
            for r in expected.itertuples(index=False)
        ]
        assert sorted(got_rows) == sorted(exp_rows)

        # flip: corrupt one pixel byte in each blob (the padding bytes
        # would be invisible — pick a real pixel) → at least one mismatch
        diffs = 0
        for mid, blob in zip(media["media_id"], media["blob"]):
            raw = bytearray(blob)
            raw[-1] ^= 0x40  # last byte of the pixel array in both formats
            img = _decode_image(bytes(raw))
            for bi, v in enumerate(_pixel_features(img)):
                got = np.floor(v * 1e6 + 0.5) / 1e6
                exp = expected[
                    (expected.media_id == mid) & (expected.bin == bi)
                ]["value"].iloc[0]
                if got != exp:
                    diffs += 1
        assert diffs > 0, "oracle missed a corrupted-pixel decode"

    def test_frame_sample_plan(self, spark):
        df = spark.createDataFrame([("v1", b"")], "media_id string, blob binary")
        out = frame_sample_plan(df, every_n=30).toPandas()
        assert list(out["frame_idx"]) == list(range(0, 300, 30))


class TestResultsSink:
    def test_seed_mean_pivot(self, spark):
        rows = [
            ("rf", 1, "f1", 0.9), ("rf", 2, "f1", 0.8), ("rf", 3, "f1", 0.7),
            ("rf", 1, "precision", 1.0), ("rf", 2, "precision", 0.9),
            ("xgb", 1, "f1", 0.6),
        ]
        df = spark.createDataFrame(rows, "model string, seed int, metric string, value double")
        out = seed_mean_results(df).toPandas().set_index("model")
        assert out.loc["rf", "f1"] == pytest.approx(0.8)
        assert out.loc["rf", "precision"] == pytest.approx(0.95)
        assert out.loc["xgb", "f1"] == pytest.approx(0.6)
