"""S7 — per-object mesh → PNG rendering, Spark-first.

The reference renders every 3-D object to a PNG for its image-based
matching baseline (reference utils.py:134-163 ``generate_png_fig``: one
matplotlib 3-D figure per object, surfaces drawn translucent, axes off).
Here the same artifact — one deterministic raster per object, every mesh
surface visible, painter-ordered by depth — is produced headless and
scan-side: a ``mapInPandas`` kernel rasterizes each object and emits real
PNG bytes (functions/png.py), so at 100 TB rendering is an
embarrassingly parallel scan stage whose blobs are born on executors and
never shuffled.

RENDER SPEC v1 (reimplemented independently, scalar, by
tools/gen_expected.py — keep in sync BY SPEC, not by import):

  input: flat xyz coords + ring offsets (surface s = vertices
  [off[s], off[s+1])), raster size S, margin m.

  1. isometric orthographic projection, float64 elementwise:
       u_i = x_i - y_i
       v_i = z_i - (x_i + y_i) / 2
  2. span = max(max(u)-min(u), max(v)-min(v)); if span <= 0: span = 1.0
     scale = (S - 1 - 2*m) / span
  3. EVEN-integer snap (the exact-hull trick — all geometry after this
     step is integer, so fill decisions are bit-exact across
     implementations):
       U_i = 2 * (floor((u_i - min(u)) * scale + 0.5) + m)
       V_i = 2 * (floor((v_i - min(v)) * scale + 0.5) + m)
     pixel (px, pv) has center (2*px+1, 2*pv+1): odd vs even parity
     guarantees no center ever coincides with a vertex ordinate.
  4. painter order: surfaces sorted ascending by (dmax_s, s) where
     dmax_s = max over the surface's vertices of (x_i + y_i) + z_i
     (far surfaces first, stable index tie-break).
  5. shade_s = 64 + floor(191 * r + 0.5) where
     r = 1.0 if zspan <= 0 else (zmax_s - zmin_obj) / zspan,
     zspan = zmax_obj - zmin_obj.
     surface color = (shade_s, 255 - shade_s, (37 * (s + 1)) % 256).
  6. fill rule: even-odd crossing test at each pixel center c over the
     surface's integer polygon edges (a, b): a crossing is counted when
     (a_V > c_v) != (b_V > c_v) and the signed integer comparison
     (c_v - a_V) * (b_U - a_U) < (c_u - a_U) * (b_V - a_V) holds after
     orienting by sign(b_V - a_V). Pure integer arithmetic — exact.
  7. raster row y = S - 1 - pv (v axis points up); background (0, 0, 0);
     surfaces with < 3 vertices are skipped.
  8. container: functions/png.py::encode_png (8-bit RGB, filter 0,
     zlib level 6).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
import pyspark.sql.types as T

from ..functions.png import encode_png

RENDER_SCHEMA = T.StructType(
    [
        T.StructField("obj_id", T.StringType(), False),
        T.StructField("blob", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)


def render_mesh(
    coords: np.ndarray, offsets: np.ndarray, size: int = 48, margin: int = 2
) -> np.ndarray:
    """RENDER SPEC v1 kernel: one object's mesh → (size, size, 3) uint8.
    Vectorized per surface (edges × bounding-box pixels broadcast); the
    oracle recomputes the identical integers with scalar loops."""
    S, m = size, margin
    img = np.zeros((S, S, 3), dtype=np.uint8)
    pts = np.asarray(coords, dtype=np.float64).reshape(-1, 3)
    off = np.asarray(offsets, dtype=np.int64)
    if len(pts) == 0 or len(off) < 2:
        return img
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
    u = x - y
    v = z - (x + y) / 2.0
    umin, vmin = u.min(), v.min()
    span = max(u.max() - umin, v.max() - vmin)
    if span <= 0:
        span = 1.0
    scale = (S - 1 - 2 * m) / span
    U = 2 * (np.floor((u - umin) * scale + 0.5).astype(np.int64) + m)
    V = 2 * (np.floor((v - vmin) * scale + 0.5).astype(np.int64) + m)

    depth = (x + y) + z
    zmin_o, zmax_o = z.min(), z.max()
    zspan = zmax_o - zmin_o

    n_surf = len(off) - 1
    # vectorized per-surface reductions (same values the scalar loop
    # took): reduceat over EVERY boundary so each segment is exactly
    # [off[s], off[s+1]); <3-vertex surfaces are filtered afterwards
    # (their reduceat slots are garbage-but-unused; starts clipped so an
    # empty trailing surface cannot index past the buffer)
    scnt = np.diff(off)
    ok = scnt >= 3
    sidx = np.flatnonzero(ok)
    if len(sidx) == 0:
        return img
    if (scnt > 0).all() and int(off[0]) == 0 and int(off[-1]) == len(pts):
        starts_all = off[:-1]
        dmax = np.maximum.reduceat(depth, starts_all)[sidx]
        zmax_s_all = np.maximum.reduceat(z, starts_all)[sidx]
        umin_s = np.minimum.reduceat(U, starts_all)[sidx]
        umax_s = np.maximum.reduceat(U, starts_all)[sidx]
        vmin_s = np.minimum.reduceat(V, starts_all)[sidx]
        vmax_s = np.maximum.reduceat(V, starts_all)[sidx]
    else:  # ragged/degenerate offsets: per-surface reductions, as before
        dmax = np.array([depth[off[s] : off[s + 1]].max() for s in sidx])
        zmax_s_all = np.array([z[off[s] : off[s + 1]].max() for s in sidx])
        umin_s = np.array([U[off[s] : off[s + 1]].min() for s in sidx])
        umax_s = np.array([U[off[s] : off[s + 1]].max() for s in sidx])
        vmin_s = np.array([V[off[s] : off[s + 1]].min() for s in sidx])
        vmax_s = np.array([V[off[s] : off[s + 1]].max() for s in sidx])
    # ascending (dmax, surface-index) painter order — np.lexsort keys are
    # (secondary, primary), stable, identical to sorted((dmax, s))
    paint = np.lexsort((sidx, dmax))

    # pixel-center coordinate grids (doubled lattice)
    cu_ax = 2 * np.arange(S, dtype=np.int64) + 1

    for j in paint:
        s = int(sidx[j])
        a, b = int(off[s]), int(off[s + 1])
        Us, Vs = U[a:b], V[a:b]
        r = 1.0 if zspan <= 0 else (float(zmax_s_all[j]) - zmin_o) / zspan
        shade = 64 + int(np.floor(191 * r + 0.5))
        # bounding box of candidate pixels
        px_lo = max(0, int((umin_s[j] - 1) // 2))
        px_hi = min(S - 1, int(umax_s[j] // 2))
        pv_lo = max(0, int((vmin_s[j] - 1) // 2))
        pv_hi = min(S - 1, int(vmax_s[j] // 2))
        if px_lo > px_hi or pv_lo > pv_hi:
            continue
        B_u_full = np.roll(Us, -1)
        B_v_full = np.roll(Vs, -1)
        # horizontal edges (A_v == B_v) can never satisfy the straddle
        # test — drop them up front (identical crossings)
        ev = Vs != B_v_full
        Au, Av = Us[ev], Vs[ev]
        Bu, Bv = B_u_full[ev], B_v_full[ev]
        if len(Au) == 0:
            continue
        W = px_hi - px_lo + 1
        H = pv_hi - pv_lo + 1
        cv_ax = cu_ax[pv_lo : pv_hi + 1]  # (H,) odd pixel-center v coords
        # spec step 6 crossing, solved for the column instead of tested
        # per pixel: with orient = sign(B_v - A_v) (= ±1 after the
        # horizontal-edge drop) and Dp = orient*(B_v - A_v) > 0,
        #   crossing(cu) ⟺ orient*[(cu-A_u)(B_v-A_v) − (cv-A_v)(B_u-A_u)] > 0
        #               ⟺ cu > A_u + orient*(cv-A_v)(B_u-A_u) / Dp
        # so per (edge, row) a single exact integer cutoff
        #   cut = A_u + floordiv(orient*(cv-A_v)(B_u-A_u), Dp) + 1
        # marks the first crossing column; the even-odd fill is then a
        # parity cumsum of per-row cutoff counts — O(E·H + H·W) integer
        # ops instead of the O(E·W·H) per-pixel matrix, bit-identical
        # (floor division is exact; cu = 2*px+1 ≥ cut ⟺ px ≥ cut//2).
        straddle = (Av[:, None] > cv_ax[None, :]) != (Bv[:, None] > cv_ax[None, :])
        if len(Au) * W * H >= 2048:
            orient = np.where(Bv > Av, 1, -1)
            Dp = orient * (Bv - Av)
            num = (orient * (Bu - Au))[:, None] * (cv_ax[None, :] - Av[:, None])
            cut = Au[:, None] + num // Dp[:, None] + 1
            pxf = np.clip(cut // 2, px_lo, px_hi + 1) - px_lo
            er, hr = np.nonzero(straddle)
            if len(er) == 0:
                continue
            delta = np.bincount(
                hr * (W + 1) + pxf[er, hr], minlength=H * (W + 1)
            ).reshape(H, W + 1)
            inside = delta.cumsum(axis=1)[:, :W] % 2 == 1  # (H, W): [pv, px]
        else:
            # small surface: the fused per-pixel matrix has less overhead
            # (same predicate —  orient*(rhs-lhs) > 0  — so bit-identical)
            cu = cu_ax[px_lo : px_hi + 1][None, :, None]  # (1, W, 1)
            cv = cv_ax[None, None, :]  # (1, 1, H)
            A_u3, A_v3 = Au[:, None, None], Av[:, None, None]
            B_u3, B_v3 = Bu[:, None, None], Bv[:, None, None]
            diff = (cu - A_u3) * (B_v3 - A_v3) - (cv - A_v3) * (B_u3 - A_u3)
            diff *= np.where(B_v3 > A_v3, 1, -1)
            crossing = straddle[:, None, :] & (diff > 0)
            inside = (crossing.sum(axis=0) % 2 == 1).T  # (H, W): [pv, px]
        if not inside.any():
            continue
        pvs, pxs = np.nonzero(inside)
        img[S - 1 - (pvs + pv_lo), pxs + px_lo] = (
            shade,
            255 - shade,
            (37 * (s + 1)) % 256,
        )
    return img


def render_objects_png(
    objects: DataFrame,
    size: int = 48,
    margin: int = 2,
    id_col: str = "obj_id",
    batch_rows: int = 256,
) -> DataFrame:
    """objects (obj_id, coords, ring_offsets) → (obj_id, blob PNG, width,
    height, n_bytes), one Arrow-batched scan-side pass. ``batch_rows``
    caps rows per emitted batch so PNG blobs cannot balloon an Arrow
    transfer (same contract as extract_media_features)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for st in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[st : st + batch_rows]
                ids, blobs = [], []
                for oid, coords, offs in zip(
                    chunk[id_col], chunk["coords"], chunk["ring_offsets"]
                ):
                    img = render_mesh(
                        np.asarray(coords, dtype=np.float64),
                        np.asarray(offs, dtype=np.int64),
                        size=size,
                        margin=margin,
                    )
                    ids.append(oid)
                    blobs.append(encode_png(img))
                yield pd.DataFrame(
                    {
                        "obj_id": ids,
                        "blob": blobs,
                        "width": np.int32(size),
                        "height": np.int32(size),
                        "n_bytes": [len(b) for b in blobs],
                    }
                )

    return objects.select(
        F.col(id_col).alias(id_col), "coords", "ring_offsets"
    ).mapInPandas(kernel, schema=RENDER_SCHEMA)
