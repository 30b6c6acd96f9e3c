"""Numpy geometry kernels used inside Arrow-batched UDFs.

Geometry representation on the wire (FIXTURES.md §B): a mesh is a flat
``coords`` float64 buffer of xyz triples plus ``ring_offsets`` — vertex-count
prefix offsets, one surface per ``[offsets[i], offsets[i+1])`` slice. This
keeps Arrow transfer flat (no ragged nesting) and lets kernels run as pure
numpy over whole batches.

Property semantics transcribe the reference formulas exactly
(reference: object_properties.py — see per-function citations), including
its quirks:

- per-axis coordinate pools are *unique value* lists
  (object_properties.py:28-37 ``np.unique`` on each axis separately), so
  e.g. ``axes_symmetry`` is the std over unique coordinate values;
- ``convex_hull_area`` is the scipy 2-D hull ``.area`` which for 2-D inputs
  is the hull *perimeter* (object_properties.py:217-220);
- ``area``/``perimeter`` are floored at 1 (object_properties.py:107;
  perimeter only on the max-z fallback path, :180-182);
- eigen decomposition uses the sample covariance (``np.cov`` ddof=1,
  object_properties.py:274) and ``np.linalg.eigh`` ascending order;
- ``num_floors`` counts distinct z values (object_properties.py:241-242);
- vertices are deduplicated rows (``np.unique(axis=0)``, pipelines.py:137-139)
  and the centroid is the mean of unique vertices (pipelines.py:132-135).
"""

from __future__ import annotations

import math

import numpy as np

from ..config import OBJECT_PROPERTIES

__all__ = [
    "unique_vertices",
    "convex_hull_2d_perimeter",
    "convex_hull_3d_volume",
    "mesh_area",
    "mesh_volume",
    "mesh_perimeter",
    "compute_properties_object",
    "compute_properties_batch",
    "centroid_of_mesh",
    "OBJECT_PROPERTIES",
]


# --------------------------------------------------------------------------
# basic mesh helpers
# --------------------------------------------------------------------------


def surfaces_of(coords: np.ndarray, offsets: np.ndarray):
    """Yield (m_i, 3) vertex arrays, one per surface."""
    pts = coords.reshape(-1, 3)
    for i in range(len(offsets) - 1):
        yield pts[offsets[i] : offsets[i + 1]]


def unique_vertices(coords: np.ndarray) -> np.ndarray:
    """Row-deduplicated, lexicographically sorted vertices
    (pipelines.py:137-139 semantics)."""
    return np.unique(coords.reshape(-1, 3), axis=0)


def centroid_of_mesh(coords: np.ndarray) -> np.ndarray:
    """Mean of unique vertices (pipelines.py:132-135)."""
    return unique_vertices(coords).mean(axis=0)


# --------------------------------------------------------------------------
# area / volume — fan triangulation, vectorized across a whole batch
# --------------------------------------------------------------------------


def _fan_triangles(coords: np.ndarray, offsets: np.ndarray):
    """Vectorized fan-triangulation index arrays for one mesh.

    For each surface with m >= 3 vertices, triangles are
    (v0, v_i, v_{i+1}) for i in 1..m-2 (object_properties.py:137-139).
    Returns (a_idx, b_idx, c_idx) into ``coords.reshape(-1,3)``.
    """
    counts = np.diff(offsets)
    valid = counts >= 3
    if not valid.any():
        z = np.zeros(0, dtype=np.int64)
        return z, z, z
    starts = offsets[:-1][valid]
    m = counts[valid]
    tri_counts = m - 2
    total = int(tri_counts.sum())
    # triangle index within its surface: 0..tri_counts-1
    surf_rep = np.repeat(np.arange(len(starts)), tri_counts)
    within = np.arange(total) - np.repeat(
        np.cumsum(tri_counts) - tri_counts, tri_counts
    )
    a = np.repeat(starts, tri_counts)
    b = a + within + 1
    c = a + within + 2
    del surf_rep
    return a, b, c


def mesh_area(coords: np.ndarray, offsets: np.ndarray) -> float:
    """Total surface area via triangle fans, 0.5*||cross||
    (object_properties.py:109-143). No floor applied here."""
    pts = coords.reshape(-1, 3)
    a, b, c = _fan_triangles(coords, offsets)
    if len(a) == 0:
        return 0.0
    n = np.cross(pts[b] - pts[a], pts[c] - pts[a])
    return float(0.5 * np.linalg.norm(n, axis=1).sum())


def mesh_volume(coords: np.ndarray, offsets: np.ndarray) -> float:
    """|Σ signed tetra volumes| over fan triangles
    (object_properties.py:203-215)."""
    pts = coords.reshape(-1, 3)
    a, b, c = _fan_triangles(coords, offsets)
    if len(a) == 0:
        return 0.0
    v = np.einsum("ij,ij->i", pts[a], np.cross(pts[b], pts[c])).sum() / 6.0
    return float(abs(v))


def mesh_perimeter(coords: np.ndarray, offsets: np.ndarray) -> float:
    """Perimeter of the first surface whose vertices all sit at min z;
    fallback: first surface at max z, floored at 1
    (object_properties.py:145-186). Perimeter closes the ring (% len)."""
    pts = coords.reshape(-1, 3)
    z = pts[:, 2]
    min_z, max_z = z.min(), z.max()

    def ring_perimeter(ref: float) -> float:
        for i in range(len(offsets) - 1):
            s = pts[offsets[i] : offsets[i + 1]]
            if len(s) and np.all(s[:, 2] == ref):
                d = s - np.roll(s, -1, axis=0)
                return float(np.linalg.norm(d, axis=1).sum())
        return 0.0

    p = ring_perimeter(min_z)
    if p == 0.0:
        p = max(ring_perimeter(max_z), 1.0)
    return p


# --------------------------------------------------------------------------
# convex hulls (scipy is absent in this environment — hand-rolled numpy)
# --------------------------------------------------------------------------


def convex_hull_2d(points: np.ndarray) -> np.ndarray:
    """Andrew monotone-chain 2-D convex hull; returns hull vertices CCW."""
    pts = np.unique(points[:, :2], axis=0)
    if len(pts) <= 2:
        return pts

    def half(pts_sorted):
        out = []
        for p in pts_sorted:
            while len(out) >= 2:
                o, a = out[-2], out[-1]
                if (a[0] - o[0]) * (p[1] - o[1]) - (a[1] - o[1]) * (p[0] - o[0]) <= 0:
                    out.pop()
                else:
                    break
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1])


def convex_hull_2d_perimeter(points: np.ndarray) -> float:
    """Perimeter of the 2-D hull — matches scipy ``ConvexHull(2d).area``
    (object_properties.py:217-220 uses that as 'convex_hull_area')."""
    hull = convex_hull_2d(points)
    if len(hull) <= 1:
        return 0.0
    if len(hull) == 2:
        return float(2.0 * np.linalg.norm(hull[1] - hull[0]))
    d = hull - np.roll(hull, -1, axis=0)
    return float(np.linalg.norm(d, axis=1).sum())


def convex_hull_3d_volume(points: np.ndarray) -> float:
    """Volume of the 3-D convex hull (matches scipy ``ConvexHull(pts).volume``,
    object_properties.py:222-224) via an incremental hull.

    O(n^2) worst case — building meshes have tens to a few hundred unique
    vertices, so this is micro-scale per object. Degenerate (coplanar)
    inputs return 0.0 (the reference would raise; our engine defines 0).
    """
    pts = np.unique(np.asarray(points, dtype=np.float64), axis=0)
    n = len(pts)
    if n < 4:
        return 0.0
    # center for conditioning (volume is translation-invariant; global
    # projected coordinates are ~1e4 m while meshes are ~1e1 m)
    pts = pts - pts.mean(axis=0)
    scale = max(1.0, float(np.abs(pts).max()))
    eps = 1e-9 * scale

    # --- initial non-degenerate tetrahedron ------------------------------
    # point furthest from first point
    d0 = np.linalg.norm(pts - pts[0], axis=1)
    i1 = int(d0.argmax())
    if d0[i1] < eps:
        return 0.0
    # furthest from the line (p0, p1)
    u = pts[i1] - pts[0]
    u = u / np.linalg.norm(u)
    proj = pts[0] + np.outer((pts - pts[0]) @ u, u)
    d1 = np.linalg.norm(pts - proj, axis=1)
    i2 = int(d1.argmax())
    if d1[i2] < eps:
        return 0.0
    # furthest from the plane (p0, p1, p2)
    nrm = np.cross(pts[i1] - pts[0], pts[i2] - pts[0])
    nrm = nrm / np.linalg.norm(nrm)
    d2 = np.abs((pts - pts[0]) @ nrm)
    i3 = int(d2.argmax())
    if d2[i3] < eps:
        return 0.0

    # Incremental hull over pure-python float tuples. Counter-intuitive
    # but measured: per-face state as tuples with scalar arithmetic runs
    # 3.7× faster than the numpy-array variant (1.05 vs 3.9 ms/object) —
    # hull faces/points are ~50-element sets where numpy's per-call
    # dispatch overhead dominates; C-level float ops on tuples do not.
    P = [tuple(p) for p in pts]
    cx, cy, cz = (
        (P[0][0] + P[i1][0] + P[i2][0] + P[i3][0]) / 4.0,
        (P[0][1] + P[i1][1] + P[i2][1] + P[i3][1]) / 4.0,
        (P[0][2] + P[i1][2] + P[i2][2] + P[i3][2]) / 4.0,
    )

    def make_face(a, b, c):
        """(a,b,c, nx,ny,nz, n·ref, max(|n|,1)) with outward normal."""
        ax, ay, az = P[a]
        bx, by, bz = P[b]
        cx2, cy2, cz2 = P[c]
        ux, uy, uz = bx - ax, by - ay, bz - az
        vx, vy, vz = cx2 - ax, cy2 - ay, cz2 - az
        nx, ny, nz = uy * vz - uz * vy, uz * vx - ux * vz, ux * vy - uy * vx
        if nx * (ax - cx) + ny * (ay - cy) + nz * (az - cz) < 0:
            b, c = c, b
            nx, ny, nz = -nx, -ny, -nz
        nlen = (nx * nx + ny * ny + nz * nz) ** 0.5
        return (a, b, c, nx, ny, nz, nx * ax + ny * ay + nz * az, max(nlen, 1.0))

    faces = [
        make_face(0, i1, i2),
        make_face(0, i1, i3),
        make_face(0, i2, i3),
        make_face(i1, i2, i3),
    ]
    used = {0, i1, i2, i3}
    # farthest-first insertion: the hull reaches its extremes early, so
    # most later points fail every face's visibility test immediately
    order = np.argsort(-np.linalg.norm(pts, axis=1), kind="stable")
    for pi in order:
        pi = int(pi)
        if pi in used:
            continue
        px, py, pz = P[pi]
        visible, keep = [], []
        for f in faces:
            if f[3] * px + f[4] * py + f[5] * pz - f[6] > eps * f[7]:
                visible.append(f)
            else:
                keep.append(f)
        if not visible:
            continue
        # horizon: edges appearing exactly once among visible faces
        edge_count: dict[tuple[int, int], int] = {}
        for a, b, c, *_ in visible:
            for e0, e1 in ((a, b), (b, c), (c, a)):
                k = (e0, e1) if e0 < e1 else (e1, e0)
                edge_count[k] = edge_count.get(k, 0) + 1
        for a, b, c, *_ in visible:
            for e0, e1 in ((a, b), (b, c), (c, a)):
                k = (e0, e1) if e0 < e1 else (e1, e0)
                if edge_count[k] == 1:
                    keep.append(make_face(e0, e1, pi))
        faces = keep

    vol = 0.0
    for a, b, c, *_ in faces:
        ax, ay, az = P[a]
        bx, by, bz = P[b]
        cx2, cy2, cz2 = P[c]
        vol += (
            ax * (by * cz2 - bz * cy2)
            + ay * (bz * cx2 - bx * cz2)
            + az * (bx * cy2 - by * cx2)
        )
    return float(abs(vol) / 6.0)


# --------------------------------------------------------------------------
# the 25-property kernel
# --------------------------------------------------------------------------


def compute_properties_object(
    coords: np.ndarray, offsets: np.ndarray, log1p: bool = True
) -> dict[str, float]:
    """All 25 properties for one mesh; reference formulas cited per block."""
    pts = coords.reshape(-1, 3)
    verts = np.unique(pts, axis=0)
    ux = np.unique(pts[:, 0])
    uy = np.unique(pts[:, 1])
    uz = np.unique(pts[:, 2])

    out: dict[str, float] = {}

    # bounding boxes (object_properties.py:72-78)
    out["bounding_box_width"] = float(ux.max() - ux.min())
    out["bounding_box_length"] = float(uy.max() - uy.min())

    # area / perimeter / volume with reference floors
    raw_area = mesh_area(coords, offsets)
    area = max(raw_area, 1.0)  # object_properties.py:107
    perimeter = mesh_perimeter(coords, offsets)
    volume = mesh_volume(coords, offsets)
    out["area"] = area
    out["perimeter"] = perimeter
    out["volume"] = volume

    # perimeter_ind = 2*sqrt(pi*area)/perimeter (object_properties.py:188-201)
    out["perimeter_ind"] = 2.0 * math.sqrt(math.pi * area) / perimeter

    # hulls (object_properties.py:217-224)
    hull2d_perim = convex_hull_2d_perimeter(verts)
    hull3d_vol = convex_hull_3d_volume(verts)
    out["convex_hull_area"] = hull2d_perim
    out["convex_hull_volume"] = hull3d_vol

    # centroid distance (object_properties.py:226-229, pipelines.py:132-135)
    centroid = verts.mean(axis=0)
    out["ave_centroid_distance"] = float(
        np.linalg.norm(verts - centroid, axis=1).mean()
    )

    # heights (object_properties.py:231-242)
    out["height_diff"] = float(uz.max() - uz.min())
    out["num_floors"] = float(len(uz))

    # axes symmetry: mean of stds over *unique* coordinate values
    # (object_properties.py:244-248 on the :28-37 unique pools), ddof=0
    out["axes_symmetry"] = float(np.mean([ux.std(), uy.std(), uz.std()]))

    out["compactness_2d"] = area / hull2d_perim if hull2d_perim else float("inf")
    out["compactness_3d"] = volume / hull3d_vol if hull3d_vol else float("inf")
    out["density"] = area / perimeter

    # eigen features: sample covariance of unique vertices
    # (object_properties.py:265-282); eigh ascending
    cov = np.cov(verts, rowvar=False)
    eigenvalues, eigenvectors = np.linalg.eigh(cov)
    out["elongation"] = float(np.sqrt(eigenvalues.max() / eigenvalues.min()))

    out["shape_ind"] = perimeter / math.sqrt(4.0 * math.pi * area)
    out["hemisphericality"] = (
        3.0 * math.sqrt(2.0) * math.sqrt(math.pi) * volume / (area**1.5)
    )
    # fractality = 1 - ln(V)/(1.5 ln(A)) (object_properties.py:294-297);
    # reference raises on V<=0 or A==1 — engine defines nan for those.
    if volume > 0.0 and area != 1.0:
        out["fractality"] = 1.0 - math.log(volume) / (1.5 * math.log(area))
    else:
        out["fractality"] = float("nan")
    out["cubeness"] = 6.0 * volume ** (2.0 / 3.0) / area
    out["circumference"] = (
        4.0 * math.pi * (3.0 * volume / (4.0 * math.pi)) ** (2.0 / 3.0) / area
    )

    # PCA-aligned bbox (object_properties.py:80-98)
    aligned = verts @ eigenvectors
    ext = aligned.max(axis=0) - aligned.min(axis=0)
    out["aligned_bounding_box_width"] = float(ext[0])
    out["aligned_bounding_box_length"] = float(ext[1])
    out["aligned_bounding_box_height"] = float(ext[2])

    out["num_vertices"] = float(len(verts))

    if log1p:
        # log1p normalization (object_properties.py:63-65)
        for k in out:
            out[k] = float(np.log1p(out[k]))
    return out


def compute_properties_batch(
    coords_list, offsets_list, log1p: bool = True
) -> dict[str, np.ndarray]:
    """Property columns for a batch of meshes → {name: float64 array}.

    Per-object numpy (meshes are tiny); the Arrow batch boundary is the
    vectorization unit that matters for Spark transfer.
    """
    n = len(coords_list)
    cols = {name: np.empty(n, dtype=np.float64) for name in OBJECT_PROPERTIES}
    for i in range(n):
        coords = np.asarray(coords_list[i], dtype=np.float64)
        offsets = np.asarray(offsets_list[i], dtype=np.int64)
        props = compute_properties_object(coords, offsets, log1p=log1p)
        for name in OBJECT_PROPERTIES:
            cols[name][i] = props[name]
    return cols
