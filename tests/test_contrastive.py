"""M5 contrastive image-matching lifecycle (plans/contrastive.py).

Reference analog: "contrastive_training_matching_with contamination.py"
:27-151 ``run_pipeline`` — CLIP embeddings of rendered object PNGs, a
binary head on ``|emb1 - emb2|``, BCE training, P/R/F1 report.  The
engine re-expresses the lifecycle with a deterministic pixel-feature
encoder (no GPU/torch in env — documented stand-in), so the tests here
carry the independent signal the golden-tier ``contrastive_quality``
oracle can't: determinism, end-to-end matching power on held-out
entities, JVM pair-feature parity vs numpy, and an injected-encoder-bug
flip that proves the golden hash has teeth.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geospatial_object_matching_spark.operators.contrastive import (
    EMBED_DIM,
    encode_image,
    image_embeddings,
    pair_diff_features,
)
from geospatial_object_matching_spark.operators.extract import extract_objects
from geospatial_object_matching_spark.operators.render import (
    render_objects_png,
)
from geospatial_object_matching_spark.plans.contrastive import (
    run_contrastive_matching,
)
from geospatial_object_matching_spark.sources.pages import generate_pages_df


class TestEncoder:
    def test_encode_image_deterministic_unit_norm(self):
        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
        v1, v2 = encode_image(img), encode_image(img)
        assert np.array_equal(v1, v2)
        assert v1.shape == (EMBED_DIM,)
        assert np.isclose(np.linalg.norm(v1), 1.0)

    def test_tile_means_carry_spatial_signal(self):
        """Two images with identical global histograms but mirrored
        layout must encode differently — the measured reason the tile
        grid exists (global-only F1 capped at ~0.64)."""
        img = np.zeros((48, 48, 3), dtype=np.uint8)
        img[:, :24] = 200
        mirrored = img[:, ::-1].copy()
        assert not np.array_equal(encode_image(img), encode_image(mirrored))

    def test_projection_reduces_dim_and_renormalizes(self, spark):
        pages = generate_pages_df(spark, 8, seed=3)
        objects = extract_objects(pages).select(
            F.concat_ws("|", "source", "obj_id").alias("objkey"),
            "coords",
            "ring_offsets",
        )
        rendered = render_objects_png(objects, id_col="objkey")
        emb = image_embeddings(rendered, dim=16, seed=7).toPandas()
        mat = np.stack(emb["embedding"].to_numpy())
        assert mat.shape[1] == 16
        assert np.allclose(np.linalg.norm(mat, axis=1), 1.0)


class TestPairDiffFeatures:
    def test_matches_numpy(self, spark):
        rng = np.random.default_rng(5)
        ce = rng.normal(size=(4, 6))
        ie = rng.normal(size=(3, 6))
        cand = spark.createDataFrame(
            pd.DataFrame(
                {"obj_id": [f"c{i}" for i in range(4)], "embedding": list(ce)}
            )
        )
        index = spark.createDataFrame(
            pd.DataFrame(
                {"obj_id": [f"i{i}" for i in range(3)], "embedding": list(ie)}
            )
        )
        pairs = spark.createDataFrame(
            pd.DataFrame(
                {
                    "cand_id": ["c0", "c1", "c3"],
                    "index_id": ["i2", "i0", "i1"],
                    "label": [1, 0, 1],
                }
            )
        )
        got = (
            pair_diff_features(pairs, cand, index, 6)
            .toPandas()
            .sort_values("cand_id")
            .reset_index(drop=True)
        )
        for ci, ii in zip(["c0", "c1", "c3"], ["i2", "i0", "i1"]):
            row = got[got["cand_id"] == ci].iloc[0]
            exp = np.abs(ce[int(ci[1:])] - ie[int(ii[1:])])
            assert np.allclose(
                [row[f"d{k}"] for k in range(6)], exp
            ), (ci, ii)


class TestImageBlocking:
    """S8 image-embedding blocking + PC@k (plans/contrastive.py::
    run_image_blocking — reference blocking.py:176-191 ``_run_vit`` +
    pipelines.py:386 blocking recall)."""

    @pytest.fixture(scope="class")
    def pages(self, spark):
        return generate_pages_df(spark, 60, seed=42).persist()

    @pytest.fixture(scope="class")
    def result(self, spark, pages):
        from geospatial_object_matching_spark.plans.contrastive import (
            run_image_blocking,
        )

        return run_image_blocking(spark, pages).toPandas()

    def test_matches_independent_oracle(self, result, pages):
        """Engine PC@k rows == tools/gen_expected.expected_image_blocking
        (scalar raster → scalar encoder → brute-force IP rank, no engine
        imports) on the same pages."""
        import os
        import sys

        sys.path.insert(
            0,
            os.path.join(os.path.dirname(__file__), "..", "tools"),
        )
        import gen_expected as GE
        from oracle.reference_oracle import object_dicts_from_pages

        objs = object_dicts_from_pages(pages.toPandas())
        exp = GE.expected_image_blocking(objs)
        got = result.sort_values("k").reset_index(drop=True)
        exp = exp.sort_values("k").reset_index(drop=True)
        assert list(got["k"]) == list(exp["k"])
        assert list(got["n_hits"]) == list(exp["n_hits"])
        assert list(got["n_intersection"]) == list(exp["n_intersection"])
        assert np.allclose(got["pc"], exp["pc"])

    def test_monotone_and_bounded(self, result):
        r = result.sort_values("k")
        assert (r["n_hits"].diff().dropna() >= 0).all()
        assert (r["n_hits"] <= r["n_intersection"]).all()
        assert (r["pc"] >= 0).all() and (r["pc"] <= 1).all()

    def test_oracle_flips_on_global_only_encoder_bug(
        self, spark, pages, result, monkeypatch
    ):
        """Injected bug: an encoder that zeroes the tile means (the
        global-histogram-only form the tile grid exists to beat). PC@1
        collapses (measured 0.755 → 0.347 at this fixture size), so the
        independent oracle catches a silently-degraded encoder, not just
        a crashed one."""
        import geospatial_object_matching_spark.operators.contrastive as OC
        from geospatial_object_matching_spark.operators.multimodal import (
            _pixel_features,
        )
        from geospatial_object_matching_spark.plans.contrastive import (
            run_image_blocking,
        )

        def global_only(img):
            base = _pixel_features(img) * OC.feature_scale(64)
            v = np.concatenate([base, 0.0 * OC._tile_means(img)])
            n = np.linalg.norm(v)
            return v / (n if n else 1.0)

        monkeypatch.setattr(OC, "encode_image", global_only)
        bad = run_image_blocking(spark, pages).toPandas()
        assert not result.equals(bad)


class TestLifecycle:
    @pytest.fixture(scope="class")
    def result(self, spark):
        pages = generate_pages_df(spark, 100, seed=42)
        return run_contrastive_matching(spark, pages, n_neg=2, seed=1)

    def test_schema_and_quality(self, result):
        assert list(result.columns) == ["model", "precision", "recall", "f1"]
        assert result.iloc[0]["model"] == "ContrastiveImageMatcher"
        # held-out-entity matching power: well above the n_neg=2 chance
        # floor (all-positive predicts ~0.33 precision / f1 ~0.5)
        assert result.iloc[0]["f1"] >= 0.6

    def test_deterministic(self, spark, result):
        pages = generate_pages_df(spark, 100, seed=42)
        again = run_contrastive_matching(spark, pages, n_neg=2, seed=1)
        pd.testing.assert_frame_equal(result, again)

    def test_golden_flips_on_signed_diff_bug(self, spark, result, monkeypatch):
        """Injected bug: drop the ``abs`` from the pair features — signed
        ``e_c - e_i`` where the reference head consumes
        ``torch.abs(emb1 - emb2)`` (contrastive_training…py:40-44).  The
        bug is injected at the driver-side expression-construction point
        (plans.contrastive's binding), so it provably reaches the plan;
        the emitted P/R/F1 row — the golden artifact — must move,
        proving the driver's value-hash comparison has teeth."""
        import geospatial_object_matching_spark.plans.contrastive as PC

        def signed_diff(pairs, cand_emb, index_emb, dim):
            ce = cand_emb.select(
                F.col("obj_id").alias("cand_id"),
                F.col("embedding").alias("_ce"),
            )
            ie = index_emb.select(
                F.col("obj_id").alias("index_id"),
                F.col("embedding").alias("_ie"),
            )
            joined = pairs.join(ce, "cand_id").join(ie, "index_id")
            cols = [
                (
                    F.element_at("_ce", i + 1) - F.element_at("_ie", i + 1)
                ).alias(f"d{i}")
                for i in range(dim)
            ]
            return joined.select("cand_id", "index_id", "label", *cols)

        monkeypatch.setattr(PC, "pair_diff_features", signed_diff)
        pages = generate_pages_df(spark, 100, seed=42)
        bad = run_contrastive_matching(spark, pages, n_neg=2, seed=1)
        assert not result.equals(bad)
