"""Engine geometry kernels vs closed-form shapes and the independent
numpy oracle (SURVEY.md §5 layer 1)."""

import numpy as np
import pytest

from geospatial_object_matching_spark.functions import geometry as G
from geospatial_object_matching_spark.sources import pages as P
from oracle import reference_oracle as O


def box_mesh(w=2.0, l=3.0, h=4.0):
    """Closed box as floor+roof+4 walls; surfaces as (coords, offsets)."""
    ring = np.array([[0, 0], [w, 0], [w, l], [0, l]], dtype=float)
    surfaces = [
        np.column_stack([ring[::-1], np.zeros(4)]),
        np.column_stack([ring, np.full(4, h)]),
    ]
    for i in range(4):
        j = (i + 1) % 4
        surfaces.append(
            np.array(
                [
                    [*ring[i], 0.0],
                    [*ring[j], 0.0],
                    [*ring[j], h],
                    [*ring[i], h],
                ]
            )
        )
    coords = np.concatenate(surfaces).ravel()
    offsets = np.cumsum([0] + [len(s) for s in surfaces])
    return coords, offsets


class TestClosedForm:
    def test_box_area_volume_perimeter(self):
        w, l, h = 2.0, 3.0, 4.0
        coords, offsets = box_mesh(w, l, h)
        assert G.mesh_area(coords, offsets) == pytest.approx(2 * w * l + 2 * (w + l) * h)
        assert G.mesh_volume(coords, offsets) == pytest.approx(w * l * h)
        assert G.mesh_perimeter(coords, offsets) == pytest.approx(2 * (w + l))

    def test_hull_3d_volume_cube_with_interior_points(self):
        cube = np.array(
            [[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)], dtype=float
        )
        rng = np.random.default_rng(7)
        interior = rng.uniform(0.05, 0.95, (40, 3))
        pts = np.vstack([cube, interior])
        assert G.convex_hull_3d_volume(pts) == pytest.approx(1.0, rel=1e-9)

    def test_hull_3d_volume_tetrahedron(self):
        tet = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=float)
        assert G.convex_hull_3d_volume(tet) == pytest.approx(1.0 / 6.0)

    def test_hull_3d_volume_rotated_scaled(self):
        cube = np.array(
            [[x, y, z] for x in (0, 2) for y in (0, 3) for z in (0, 5)], dtype=float
        )
        theta = 0.73
        R = np.array(
            [
                [np.cos(theta), -np.sin(theta), 0],
                [np.sin(theta), np.cos(theta), 0],
                [0, 0, 1],
            ]
        )
        assert G.convex_hull_3d_volume(cube @ R.T + 100.0) == pytest.approx(
            30.0, rel=1e-8
        )

    def test_hull_3d_degenerate_coplanar(self):
        flat = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0], [0.5, 0.5, 0]])
        assert G.convex_hull_3d_volume(flat) == 0.0

    def test_hull_2d_perimeter_square_with_interior(self):
        rng = np.random.default_rng(3)
        pts = np.vstack(
            [np.array([[0, 0], [4, 0], [4, 4], [0, 4]]), rng.uniform(0.5, 3.5, (30, 2))]
        )
        assert G.convex_hull_2d_perimeter(pts) == pytest.approx(16.0)

    def test_hull_3d_matches_oracle_on_random_clouds(self):
        rng = np.random.default_rng(11)
        for n in (8, 20, 50):
            pts = rng.normal(0, 10, (n, 3))
            assert G.convex_hull_3d_volume(pts) == pytest.approx(
                O.hull_3d_volume(pts), rel=1e-7
            )


class TestPropertiesVsOracle:
    @pytest.fixture(scope="class")
    def fixture_objects(self):
        pdf = P.generate_pages_pdf(30, seed=42)
        return O.object_dicts_from_pages(pdf)

    @pytest.mark.parametrize("log1p", [True, False])
    def test_all_25_properties_match(self, fixture_objects, log1p):
        checked = 0
        for obj_type in ("cands", "index"):
            for obj_id, rec in fixture_objects[obj_type].items():
                mesh = rec["mesh"]
                coords = np.concatenate([np.asarray(s) for s in mesh]).ravel()
                offsets = np.cumsum([0] + [len(s) for s in mesh])
                engine = G.compute_properties_object(coords, offsets, log1p=log1p)
                oracle = O.properties_of_object(rec, log1p=log1p)
                for name in O.PROPERTY_NAMES:
                    assert engine[name] == pytest.approx(
                        oracle[name], rel=1e-9, abs=1e-12
                    ), f"{name} mismatch for {obj_type}/{obj_id}"
                checked += 1
        assert checked >= 50

    def test_generator_determinism_and_row_invariant(self):
        a = P.generate_pages_pdf(10, seed=42)
        b = P.generate_pages_pdf(10, seed=42)
        assert list(a["url"]) == list(b["url"])
        assert list(a["text"]) == list(b["text"])
        c = P.generate_pages_pdf(10, seed=43)
        assert list(a["text"]) != list(c["text"])

    def test_min_surfaces_respected(self, fixture_objects):
        for obj_type in ("cands", "index"):
            for rec in fixture_objects[obj_type].values():
                assert 10 <= len(rec["mesh"]) <= 30
