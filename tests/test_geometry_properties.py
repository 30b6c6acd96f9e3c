"""Property-based invariants of the geometry kernels (hypothesis) —
SURVEY.md §5 layer 4."""

import numpy as np
from hypothesis import example, given, settings, strategies as st

from geospatial_object_matching_spark.functions import geometry as G
from geospatial_object_matching_spark.functions.cells import (
    points_in_polygon,
    polygon_area_2d,
    rasterize_footprint,
    tile_bounds,
)

coords3d = st.lists(
    st.tuples(
        st.floats(-100, 100, allow_nan=False),
        st.floats(-100, 100, allow_nan=False),
        st.floats(-100, 100, allow_nan=False),
    ),
    min_size=6,
    max_size=40,
)


@settings(max_examples=30, deadline=None)
@given(coords3d, st.floats(-1000, 1000, allow_nan=False))
@example(
    pts=[(0.0, 0.0, 0.0),
         (0.0, 0.0, 0.0),
         (0.0, 0.0, 58.0),
         (0.0, 0.0, 2.225073858507203e-309),
         (0.0, 0.0078125, 0.0),
         (5.0, 0.0, 0.0)],
    shift=1.0,
).via('discovered failure')  # r4 counterexample: 58-unit sliver, +1.0 shift
def test_hull_volume_translation_invariant(pts, shift):
    """Translation moves the hull volume by at most the PROVABLE
    quantization bound, not an arbitrary 1e-6 (the r4 red gate).

    ``p + shift`` is rounded by float arithmetic before the operator sees
    it, so bit-exact invariance is impossible for arbitrary shifts; what
    the HULL_GRID spec (functions/geometry.py) does guarantee is a
    Hausdorff distance d <= sqrt(3)*(cell0+cell1) between the two snapped
    hulls (each snap moves a vertex <= 0.5*sqrt(3)*cell; input rounding and
    the pitch-snapped centering offset contribute << one cell, absorbed by
    the 2x margin), whence the Steiner bound
    |dV| <= 2*d*A + 100*d^2*diam + 10*d^3 with A the bbox surface area
    (>= hull area).
    """
    p = np.asarray(pts, dtype=np.float64)
    v0 = G.convex_hull_3d_volume(p)
    v1 = G.convex_hull_3d_volume(p + shift)
    _, c0 = G.quantize_hull_points(p)
    _, c1 = G.quantize_hull_points(p + shift)
    ext = p.max(axis=0) - p.min(axis=0)
    area = 2.0 * (ext[0] * ext[1] + ext[1] * ext[2] + ext[0] * ext[2])
    diam = float(np.linalg.norm(ext))
    d = np.sqrt(3.0) * (c0 + c1)
    tol = 2.0 * d * area + 100.0 * d * d * diam + 10.0 * d**3 + 1e-12
    assert abs(v0 - v1) <= tol


@settings(max_examples=30, deadline=None)
@given(coords3d, st.floats(0.1, 10.0, allow_nan=False))
@example(
    pts=[(0.0, 0.0, 1.0),
     (0.0, -2.0, -7.0),
     (0.0, -7.0, 0.0),
     (0.0, -7.0, 1.19073486328125e-05),
     (0.0, -7.0, -1.0),
     (1.19073486328125e-05, 0.0, 0.0),
     (-1.0, 0.0, 0.0)],
    s=3.0,
).via('discovered failure')
def test_hull_volume_scale_cubic(pts, s):
    p = np.asarray(pts, dtype=np.float64)
    v0 = G.convex_hull_3d_volume(p)
    v1 = G.convex_hull_3d_volume(p * s)
    assert abs(v1 - v0 * s**3) <= 1e-6 * max(1.0, v0 * s**3)


@settings(max_examples=30, deadline=None)
@given(coords3d, st.randoms())
def test_hull_volume_permutation_invariant(pts, rnd):
    p = np.asarray(pts, dtype=np.float64)
    v0 = G.convex_hull_3d_volume(p)
    idx = list(range(len(p)))
    rnd.shuffle(idx)
    v1 = G.convex_hull_3d_volume(p[idx])
    assert abs(v0 - v1) <= 1e-9 * max(1.0, v0)


@settings(max_examples=30, deadline=None)
@given(coords3d)
def test_hull_contains_mesh_volume_bound(pts):
    """Hull volume upper-bounds any closed-surface fan volume of a subset
    polygon; weaker sanity: hull of points ⊇ points → volume ≥ 0."""
    p = np.asarray(pts, dtype=np.float64)
    assert G.convex_hull_3d_volume(p) >= 0.0


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.floats(0.0, 2 * np.pi - 1e-6), min_size=3, max_size=10, unique=True
    ),
    st.integers(0, 1000),
)
def test_rasterize_coverage_conserves_area(angles, rseed):
    """Σ coverage × tile_area == polygon area for any SIMPLE ring.

    Angle-sorted vertices alone do NOT guarantee simplicity (a wrap-around
    angular gap > π lets the closing chord cross other edges — found by this
    very test in round 1/2). Sufficient condition: every consecutive angular
    gap, including the wrap, is < π; then each edge stays inside its own
    convex wedge and edges can only meet at shared vertices.
    """
    ang = np.sort(np.asarray(angles))
    if np.min(np.diff(ang)) < 1e-6:
        return
    gaps = np.diff(np.concatenate([ang, [ang[0] + 2 * np.pi]]))
    if np.max(gaps) >= np.pi - 1e-6:
        return  # simplicity not guaranteed — out of the rasterizer's contract
    r = 0.0005 + 0.0015 * np.abs(np.sin(np.arange(len(ang)) + 1.0 + rseed))
    poly = np.stack(
        [4.3 + r * np.cos(ang), 52.07 + r * np.sin(ang)], axis=1
    )
    area = polygon_area_2d(poly)
    if area <= 1e-12:
        return
    total = 0.0
    for tx, ty, cov in rasterize_footprint(poly, 18):
        b = tile_bounds(tx, ty, 18)
        total += cov * (b[2] - b[0]) * (b[3] - b[1])
    assert abs(total - area) <= 1e-9 + 1e-6 * area


def _conservation_err(poly):
    area = polygon_area_2d(poly)
    total = 0.0
    for tx, ty, cov in rasterize_footprint(poly, 18):
        b = tile_bounds(tx, ty, 18)
        total += cov * (b[2] - b[0]) * (b[3] - b[1])
    return abs(total - area) / area


def test_rasterize_concave_l_shape():
    """Concave (L-shaped) building footprint — the round-1 rasterizer
    over-counted these by +14% (Sutherland–Hodgman on a concave subject);
    the signed-fan-triangle clip is exact."""
    s = 0.002
    base = np.array(
        [[0, 0], [2, 0], [2, 1], [1, 1], [1, 3], [0, 3]], dtype=np.float64
    )
    poly = base * s + np.array([4.3, 52.07])
    assert _conservation_err(poly) <= 1e-6


def test_rasterize_concave_star():
    """4-point star (alternating radii) spanning several tiles."""
    ang = np.linspace(0, 2 * np.pi, 8, endpoint=False)
    r = np.where(np.arange(8) % 2 == 0, 0.003, 0.0008)
    poly = np.stack([4.3 + r * np.cos(ang), 52.07 + r * np.sin(ang)], axis=1)
    assert _conservation_err(poly) <= 1e-6


def test_rasterize_clockwise_ring_matches_ccw():
    """Ring orientation must not change coverage."""
    s = 0.002
    base = np.array(
        [[0, 0], [2, 0], [2, 1], [1, 1], [1, 3], [0, 3]], dtype=np.float64
    )
    poly = base * s + np.array([4.3, 52.07])
    fwd = {(tx, ty): cov for tx, ty, cov in rasterize_footprint(poly, 18)}
    rev = {(tx, ty): cov for tx, ty, cov in rasterize_footprint(poly[::-1], 18)}
    assert fwd.keys() == rev.keys()
    for k in fwd:
        assert abs(fwd[k] - rev[k]) <= 1e-6


@settings(max_examples=30, deadline=None)
@given(
    st.floats(0.1, 3.9),
    st.floats(0.1, 3.9),
)
def test_pip_convex_square_membership(px, py):
    poly = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], dtype=float)
    assert points_in_polygon(np.array([px]), np.array([py]), poly)[0]
    assert not points_in_polygon(np.array([px + 10]), np.array([py]), poly)[0]


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(
            st.tuples(
                st.floats(-50, 50, allow_nan=False),
                st.floats(-50, 50, allow_nan=False),
                st.floats(0, 20, allow_nan=False),
            ),
            min_size=3,
            max_size=8,
        ),
        min_size=1,
        max_size=6,
    ),
    st.integers(1, 4),
)
def test_batch_kernel_equals_object_kernel_on_random_meshes(surfaces, n_objs):
    """compute_properties_batch ≡ compute_properties_object on arbitrary
    random meshes (not just the building fixture) — the batch segment
    reductions must not depend on any fixture regularity (equal-size
    surfaces, closedness, z-ring structure)."""
    coords = np.concatenate(
        [np.asarray(s, dtype=np.float64).ravel() for s in surfaces]
    )
    offsets = np.cumsum([0] + [len(s) for s in surfaces]).astype(np.int64)
    cl = [coords] * n_objs
    ol = [offsets] * n_objs
    batch = G.compute_properties_batch(cl, ol, log1p=True)
    ref = G.compute_properties_object(coords, offsets, log1p=True)
    for k, v in ref.items():
        for i in range(n_objs):
            bv = float(batch[k][i])
            if np.isnan(v):
                assert np.isnan(bv), k
            elif np.isinf(v):
                assert bv == v, k
            else:
                assert abs(bv - v) <= 1e-9 * max(1.0, abs(v)), (k, v, bv)
