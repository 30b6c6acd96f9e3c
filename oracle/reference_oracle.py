"""Numpy oracle: straight-line transcription of the reference pipeline's
semantics (SURVEY.md §5 layer 1/2 ground truth).

Deliberately *not* the engine's code path: meshes are ragged
list-of-surfaces (like reference ``polygon_mesh``), loops are per-object,
hulls use brute-force algorithms (O(n^3) facet enumeration for 3-D, Graham
scan for 2-D) so engine kernels are checked against independent math.

Reference citations per function. Everything is deterministic.
"""

from __future__ import annotations

import base64
import math
import re

import numpy as np

GEO_RE = re.compile(
    r"GEO:(-?\d+\.\d+),(-?\d+\.\d+) ID:(\S+) SRC:(\S+) MESH:(\S+) RINGS:(\S+)"
)

PROPERTY_NAMES = [
    "bounding_box_width", "bounding_box_length", "area", "perimeter",
    "perimeter_ind", "volume", "convex_hull_area", "convex_hull_volume",
    "ave_centroid_distance", "height_diff", "num_floors", "axes_symmetry",
    "compactness_2d", "compactness_3d", "density", "elongation", "shape_ind",
    "hemisphericality", "fractality", "cubeness", "circumference",
    "aligned_bounding_box_width", "aligned_bounding_box_length",
    "aligned_bounding_box_height", "num_vertices",
]


# --------------------------------------------------------------------------
# parsing (independent of engine extract kernel)
# --------------------------------------------------------------------------


def parse_page_text(text: str):
    m = GEO_RE.search(text)
    if not m:
        return None
    lat, lon = float(m.group(1)), float(m.group(2))
    obj_id, source = m.group(3), m.group(4)
    coords = np.frombuffer(base64.b64decode(m.group(5)), dtype="<f4").astype(
        np.float64
    ).reshape(-1, 3)
    offsets = [int(v) for v in m.group(6).split(",")]
    mesh = [coords[offsets[i]: offsets[i + 1]].tolist() for i in range(len(offsets) - 1)]
    return {
        "obj_id": obj_id, "source": source, "lat": lat, "lon": lon, "mesh": mesh,
    }


def object_dicts_from_pages(pages_pdf, min_surfaces: int = 10):
    """pages pandas DF → {'cands': {id: rec}, 'index': {id: rec}} with
    vertices/centroid as in pipelines.py:132-151."""
    out = {"cands": {}, "index": {}}
    for _, row in pages_pdf.iterrows():
        rec = parse_page_text(row["text"])
        if rec is None or len(rec["mesh"]) < min_surfaces:
            continue
        all_pts = np.array([v for surf in rec["mesh"] for v in surf])
        vertices = np.unique(all_pts, axis=0)
        rec["vertices"] = vertices
        rec["centroid"] = vertices.mean(axis=0)
        out[rec["source"]][rec["obj_id"]] = rec
    return out


# --------------------------------------------------------------------------
# geometry oracles (brute force, independent algorithms)
# --------------------------------------------------------------------------


def polygon_area(polygon) -> float:
    """Fan-triangle area (object_properties.py:124-143)."""
    area = 0.0
    if len(polygon) < 3:
        return area
    for i in range(1, len(polygon) - 1):
        a, b, c = np.array(polygon[0]), np.array(polygon[i]), np.array(polygon[i + 1])
        area += 0.5 * np.linalg.norm(np.cross(b - a, c - a))
    return area


def mesh_area(mesh) -> float:
    return sum(polygon_area(s) for s in mesh)


def mesh_volume(mesh) -> float:
    """Signed fan tetra sum, abs (object_properties.py:203-215)."""
    volume = 0.0
    for polygon in mesh:
        for i in range(1, len(polygon) - 1):
            t0, t1, t2 = polygon[0], polygon[i], polygon[i + 1]
            volume += np.dot(t0, np.cross(t1, t2)) / 6.0
    return abs(volume)


def mesh_perimeter(mesh) -> float:
    """First all-at-min-z ring; fallback max-z floored at 1
    (object_properties.py:145-186)."""
    zs = [v[2] for s in mesh for v in s]
    min_z, max_z = min(zs), max(zs)

    def ring(ref):
        for polygon in mesh:
            if all(v[2] == ref for v in polygon):
                p = 0.0
                for i in range(len(polygon)):
                    p += np.linalg.norm(
                        np.array(polygon[i]) - np.array(polygon[(i + 1) % len(polygon)])
                    )
                return p
        return 0.0

    p = ring(min_z)
    if p == 0.0:
        p = max(ring(max_z), 1.0)
    return p


def hull_2d_perimeter(points) -> float:
    """Graham scan (angle sort) hull perimeter — independent of the engine's
    monotone chain. Matches scipy ConvexHull(2d).area."""
    pts = np.unique(np.asarray(points, dtype=np.float64)[:, :2], axis=0)
    if len(pts) <= 2:
        return 0.0 if len(pts) < 2 else 2.0 * float(np.linalg.norm(pts[1] - pts[0]))
    start = min(range(len(pts)), key=lambda i: (pts[i][1], pts[i][0]))
    p0 = pts[start]
    rest = np.delete(pts, start, axis=0)
    ang = np.arctan2(rest[:, 1] - p0[1], rest[:, 0] - p0[0])
    d = np.linalg.norm(rest - p0, axis=1)
    order = np.lexsort((d, ang))
    rest = rest[order]
    stack = [p0]
    for p in rest:
        while len(stack) >= 2:
            o, a = stack[-2], stack[-1]
            cross = (a[0] - o[0]) * (p[1] - o[1]) - (a[1] - o[1]) * (p[0] - o[0])
            if cross <= 1e-15:
                stack.pop()
            else:
                break
        stack.append(p)
    hull = np.array(stack)
    return float(np.linalg.norm(hull - np.roll(hull, -1, axis=0), axis=1).sum())


def hull_3d_volume(points) -> float:
    """Brute-force O(n^4) facet enumeration hull volume: every point triple
    whose plane has all points on one side is a hull facet; volume = sum of
    signed origin tetras over outward-oriented facets / via divergence.

    Used only on small point sets (meshes have <= ~120 unique vertices)."""
    pts = np.unique(np.asarray(points, dtype=np.float64), axis=0)
    n = len(pts)
    if n < 4:
        return 0.0
    # center for conditioning: volume is translation-invariant but the
    # plane tests are not scale-free at large global offsets
    pts = pts - pts.mean(axis=0)
    interior = pts.mean(axis=0)
    scale = max(1.0, float(np.abs(pts).max()))
    eps = 1e-9 * scale
    vol = 0.0
    seen_planes = set()
    for i in range(n):
        for j in range(i + 1, n):
            for k in range(j + 1, n):
                a, b, c = pts[i], pts[j], pts[k]
                nrm = np.cross(b - a, c - a)
                norm_len = np.linalg.norm(nrm)
                if norm_len < eps:
                    continue
                side = (pts - a) @ nrm
                if side.max() > eps * norm_len and side.min() < -eps * norm_len:
                    continue  # not a hull plane
                # dedup coplanar triples: quantized plane key
                nrm_u = nrm / norm_len
                if nrm_u @ (a - interior) < 0:
                    nrm_u = -nrm_u
                dpl = nrm_u @ a
                key = (round(nrm_u[0], 7), round(nrm_u[1], 7), round(nrm_u[2], 7),
                       round(dpl / scale, 7))
                if key in seen_planes:
                    continue
                seen_planes.add(key)
                # facet polygon = 2-D hull of the on-plane points in a
                # local plane basis (plane may contain facet-interior
                # points, e.g. non-hull floor vertices of a prism)
                on_plane = pts[np.abs(side) <= eps * norm_len]
                ctr = on_plane.mean(axis=0)
                u = on_plane[np.argmax(np.linalg.norm(on_plane - ctr, axis=1))] - ctr
                u = u / np.linalg.norm(u)
                v = np.cross(nrm_u, u)
                uv = np.stack([(on_plane - ctr) @ u, (on_plane - ctr) @ v], axis=1)
                hull_idx = _hull_2d_indices(uv)
                ordered = on_plane[hull_idx]
                for t in range(1, len(ordered) - 1):
                    tri_vol = np.dot(
                        ordered[0] - interior,
                        np.cross(ordered[t] - interior, ordered[t + 1] - interior),
                    ) / 6.0
                    vol += abs(tri_vol)
    return float(vol)


def _hull_2d_indices(uv: np.ndarray) -> list[int]:
    """Indices of the 2-D convex hull of ``uv`` in CCW order (gift wrap)."""
    n = len(uv)
    if n <= 3:
        return list(range(n))
    start = min(range(n), key=lambda i: (uv[i][1], uv[i][0]))
    hull = [start]
    while True:
        cur = hull[-1]
        cand = (cur + 1) % n
        for j in range(n):
            if j == cur:
                continue
            cross = np.cross(uv[cand] - uv[cur], uv[j] - uv[cur])
            d_cand = np.linalg.norm(uv[cand] - uv[cur])
            d_j = np.linalg.norm(uv[j] - uv[cur])
            if cross < -1e-12 or (abs(cross) <= 1e-12 and d_j > d_cand):
                cand = j
        if cand == start:
            break
        hull.append(cand)
        if len(hull) > n:
            break
    return hull


# --------------------------------------------------------------------------
# 25 properties (object_properties.py transcription)
# --------------------------------------------------------------------------


def properties_of_object(rec, log1p: bool = True) -> dict[str, float]:
    mesh = rec["mesh"]
    vertices = rec["vertices"]
    centroid = rec["centroid"]
    all_pts = np.array([v for surf in mesh for v in surf])
    ux = np.unique(all_pts[:, 0])
    uy = np.unique(all_pts[:, 1])
    uz = np.unique(all_pts[:, 2])

    raw_area = mesh_area(mesh)
    area = max(raw_area, 1.0)
    perimeter = mesh_perimeter(mesh)
    volume = mesh_volume(mesh)
    hull2 = hull_2d_perimeter(vertices)
    hull3 = hull_3d_volume(vertices)

    cov = np.cov(vertices, rowvar=False)
    eigenvalues, eigenvectors = np.linalg.eigh(cov)
    aligned = vertices @ eigenvectors
    ext = aligned.max(axis=0) - aligned.min(axis=0)

    props = {
        "bounding_box_width": float(ux.max() - ux.min()),
        "bounding_box_length": float(uy.max() - uy.min()),
        "area": area,
        "perimeter": perimeter,
        "perimeter_ind": 2 * math.sqrt(math.pi * area) / perimeter,
        "volume": volume,
        "convex_hull_area": hull2,
        "convex_hull_volume": hull3,
        "ave_centroid_distance": float(
            np.mean([np.linalg.norm(np.array(v) - centroid) for v in vertices])
        ),
        "height_diff": float(uz.max() - uz.min()),
        "num_floors": float(len(set(uz.tolist()))),
        "axes_symmetry": float(np.mean([np.std(ux), np.std(uy), np.std(uz)])),
        "compactness_2d": area / hull2,
        "compactness_3d": volume / hull3,
        "density": area / perimeter,
        "elongation": float(np.sqrt(eigenvalues.max() / eigenvalues.min())),
        "shape_ind": perimeter / math.sqrt(4 * np.pi * area),
        "hemisphericality": 3 * math.sqrt(2) * math.sqrt(math.pi) * volume
        / (math.pow(area, 1.5)),
        "fractality": (
            1 - math.log(volume) / (1.5 * math.log(area))
            if volume > 0 and area != 1.0
            else float("nan")
        ),
        "cubeness": 6 * math.pow(volume, 2 / 3) / area,
        "circumference": 4 * math.pi * math.pow(3 * volume / (4 * math.pi), 2 / 3)
        / area,
        "aligned_bounding_box_width": float(ext[0]),
        "aligned_bounding_box_length": float(ext[1]),
        "aligned_bounding_box_height": float(ext[2]),
        "num_vertices": float(len(vertices)),
    }
    if log1p:
        props = {k: float(np.log1p(v)) for k, v in props.items()}
    return props


def property_dict_of(object_dict, log1p: bool = True):
    """{prop: {'cands': {id: val}, 'index': {id: val}}} (reference
    object_properties.py:39-67 layout)."""
    prop_dict = {p: {"cands": {}, "index": {}} for p in PROPERTY_NAMES}
    for obj_type in ["cands", "index"]:
        for obj_id, rec in object_dict[obj_type].items():
            props = properties_of_object(rec, log1p=log1p)
            for p in PROPERTY_NAMES:
                prop_dict[p][obj_type][obj_id] = props[p]
    return prop_dict


# --------------------------------------------------------------------------
# blocking oracle (classifier.py:224-233 + blocking.py semantics)
# --------------------------------------------------------------------------


def property_ratios(prop_dict):
    """index/cand ratio mean/std per property over matched ids, rounded 3,
    sorted by std ascending (classifier.py:224-233)."""
    out = {}
    for prop, d in prop_dict.items():
        ratios = [
            d["index"][i] / d["cands"][i]
            for i in d["index"].keys()
            if i in d["cands"]
        ]
        out[prop] = {
            "mean": round(float(np.mean(ratios)), 3),
            "std": round(float(np.std(ratios)), 3),
        }
    return dict(sorted(out.items(), key=lambda kv: kv[1]["std"]))


def robust_scale_fit(X: np.ndarray):
    """sklearn RobustScaler semantics: per-column median and IQR
    (linear-interpolated quartiles); zero IQR → scale 1 (blocking.py:107-112)."""
    center = np.percentile(X, 50, axis=0)
    q1 = np.percentile(X, 25, axis=0)
    q3 = np.percentile(X, 75, axis=0)
    scale = q3 - q1
    scale = np.where(scale == 0.0, 1.0, scale)
    return center, scale


def knn_join(cands: dict, index: dict, k: int, round_dists: int = 3):
    """Exact kNN with RobustScaler fit on cands (blocking.py:106-118),
    ties broken by (dist, index_id). Returns {cand_id: [(index_id, dist)]}."""
    cand_ids = list(cands.keys())
    index_ids = list(index.keys())
    Xc = np.array([cands[c] for c in cand_ids], dtype=np.float64)
    Xi = np.array([index[i] for i in index_ids], dtype=np.float64)
    if Xc.ndim == 1:
        Xc, Xi = Xc[:, None], Xi[:, None]
    center, scale = robust_scale_fit(Xc)
    Xc = (Xc - center) / scale
    Xi = (Xi - center) / scale
    out = {}
    k_eff = min(k, len(index_ids))
    for ci, cid in enumerate(cand_ids):
        d = np.linalg.norm(Xi - Xc[ci], axis=1)
        order = sorted(range(len(index_ids)), key=lambda j: (d[j], index_ids[j]))
        out[cid] = [
            (index_ids[j], round(float(d[j]), round_dists)) for j in order[:k_eff]
        ]
    return out


def bkafi_vectors(prop_dict, feature_order, dim, sdr_factors=None):
    """Top-``dim`` features (already sorted by criterion) → per-object
    vectors (blocking.py:154-174). ``sdr_factors`` maps feature → train
    mean ratio applied to the CANDS side only (sdr_factor=True run flag);
    None = factor 1.0 everywhere."""
    feats = feature_order[:dim]
    cands = {}
    index = {}
    for obj_type, store in (("cands", cands), ("index", index)):
        ids = prop_dict[feats[0]][obj_type].keys()
        for oid in ids:
            vals = [prop_dict[f][obj_type][oid] for f in feats]
            if sdr_factors is not None and obj_type == "cands":
                vals = [v * sdr_factors[f] for v, f in zip(vals, feats)]
            store[oid] = vals
    return cands, index


def candidate_pairs(nn: dict, k: int):
    """(cand, neighbor) pairs over top-k lists; pos iff ids equal
    (blocking.py:211-230)."""
    pos, neg = [], []
    for cid, lst in nn.items():
        for iid, _ in lst[:k]:
            (pos if cid == iid else neg).append((cid, iid))
    return pos, neg


def blocking_recall(nn: dict, cand_ids, index_ids, k: int) -> float:
    """|pos pairs| / |cands ∩ index| rounded 3 (pipelines.py:381-394)."""
    inter = set(cand_ids) & set(index_ids)
    pos, _ = candidate_pairs(nn, k)
    return round(len(set(pos)) / len(inter), 3)


# --------------------------------------------------------------------------
# matching oracle
# --------------------------------------------------------------------------


def ratio_feature(cand_val: float, index_val: float, max_ratio: float = 1000.0) -> float:
    """min(1000, round(c/i, 3)); div-by-zero → clip value
    (process_pairs.py:42-66 with numpy inf semantics)."""
    if index_val == 0.0:
        return max_ratio
    return min(max_ratio, round(cand_val / index_val, 3))


def pair_features(prop_dict, pairs):
    """{(cand,index): [25 ratio features in PROPERTY_NAMES order]}"""
    out = {}
    for c, i in pairs:
        out[(c, i)] = [
            ratio_feature(prop_dict[p]["cands"][c], prop_dict[p]["index"][i])
            for p in PROPERTY_NAMES
        ]
    return out


def matched_pair_distances(cands_vecs: dict, index_vecs: dict, matched_ids):
    """Scaled L2 distance per matched pair (bkafi_with_threshold.py:176-182):
    scaler fit on the matched cand vectors."""
    ids = list(matched_ids)
    Xc = np.array([cands_vecs[i] for i in ids], dtype=np.float64)
    Xi = np.array([index_vecs[i] for i in ids], dtype=np.float64)
    center, scale = robust_scale_fit(Xc)
    Xc = (Xc - center) / scale
    Xi = (Xi - center) / scale
    return np.linalg.norm(Xc - Xi, axis=1)


def percentile_thresholds(dists: np.ndarray, percentiles) -> dict[float, float]:
    """np.percentile (linear interp) per q (bkafi_with_threshold.py:131-134)."""
    return {p: float(np.percentile(dists, p * 100)) for p in percentiles}


def threshold_filter_stats(nn: dict, threshold: float, cand_ids, index_ids):
    """Filter neighbor lists by dist<=threshold; recall / cand_pairs /
    reduction ratio (bkafi_with_threshold.py:239-269)."""
    filtered = {
        cid: [(iid, d) for iid, d in lst if d <= threshold] for cid, lst in nn.items()
    }
    inter = set(cand_ids) & set(index_ids)
    recall = round(
        sum(
            1
            for oid in inter
            if oid in filtered and any(iid == oid for iid, _ in filtered[oid])
        )
        / len(inter),
        3,
    )
    cand_pairs_num = sum(len(lst) for lst in filtered.values())
    rr = round(1 - cand_pairs_num / (len(set(cand_ids)) * len(set(index_ids))), 8)
    return {
        "recall": recall,
        "cand_pairs_num": cand_pairs_num,
        "reduction_ratio": rr,
        "threshold_val": threshold,
    }
