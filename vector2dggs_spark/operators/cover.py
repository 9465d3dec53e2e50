"""Mixed-level adaptive region covers — the S2RegionCoverer analog,
backend-generic (SURVEY §2 residual noted in VERDICT r02/r03: the
reference's fixed-resolution polyfill has no adaptive-cover companion;
s2geometry's RegionCoverer is the published construction this follows).

``adaptive_cover(backend, rings, max_cells)`` returns a SUPERSET cover
of the polygon as at most ``max_cells`` cells of MIXED resolutions:
coarse cells where the polygon is fat, fine cells along the boundary.
Use cases: broadcast pre-filters (J2 ``broadcast_compact_join`` accepts
mixed-res cell sets), cheap containment pre-tests, spatial partition
pruning hints.

Construction (top-down refinement, the RegionCoverer shape):

* seed with the coarsest tessellation level whose padded-bbox fill is a
  handful of cells (padding by ``pad_factor`` cell widths makes the
  center-inside polyfill of the padded bbox a superset of every cell
  that intersects the true bbox);
* classify each cell conservatively — FULL (entirely inside: all bbox
  corners inside and no polygon vertex inside the cell) goes to the
  cover, PARTIAL (bbox overlap + corner-inside / vertex-in-cell /
  edge-bbox overlap) refines to its children, disjoint cells drop;
* stop refining when the budget would be exceeded or ``max_res`` is
  reached; remaining partial cells join the cover as-is.

Every classification error is in the conservative direction (a
non-intersecting cell may be kept, never the reverse), so the covering
property — every polyfill cell of the region at any finer resolution
has an ancestor in the cover — holds by construction and is
property-tested per backend.
"""
from __future__ import annotations

import numpy as np

from vector2dggs_spark.geometry.kernels import points_in_polygon


def _seg_box_hit(sx0, sy0, sx1, sy1, lox, hix, loy, hiy):
    """(n_box, n_seg) bool — EXACT segment/axis-box intersection
    (vectorized Liang-Barsky clip; boundary touches count, which is the
    conservative direction for cover classification)."""
    dx = (sx1 - sx0)[None, :]
    dy = (sy1 - sy0)[None, :]
    x0 = sx0[None, :]
    y0 = sy0[None, :]
    shape = np.broadcast_shapes(lox[:, None].shape, x0.shape)
    t0 = np.zeros(shape)
    t1 = np.ones(shape)
    ok = np.ones(shape, dtype=bool)
    for p, q in (
        (-dx, x0 - lox[:, None]),
        (dx, hix[:, None] - x0),
        (-dy, y0 - loy[:, None]),
        (dy, hiy[:, None] - y0),
    ):
        pz = p == 0
        ok &= ~(pz & (q < 0))  # parallel and fully outside this slab
        with np.errstate(divide="ignore", invalid="ignore"):
            r = np.where(pz, 0.0, q / np.where(pz, 1.0, p))
        t0 = np.where(~pz & (p < 0), np.maximum(t0, r), t0)
        t1 = np.where(~pz & (p > 0), np.minimum(t1, r), t1)
    return ok & (t0 <= t1)


def _classify(backend, cells: np.ndarray, res: int, rings, bbox):
    """-> (full_mask, partial_mask) — conservative, vectorized.

    Vertex-in-cell and edge tests run over ALL rings (holes included),
    matching the even-odd ``points_in_polygon`` sampling: with
    outer-ring-only tests, a cell sitting inside a non-convex hole with
    all 5 sample points in the hole but still overlapping polygon
    material along the hole boundary would be dropped, breaking the
    superset invariant (ADVICE r04).  A hole edge through a cell also
    correctly demotes it from FULL to PARTIAL.

    The edge test is an EXACT segment/cell-bbox intersection (Liang-
    Barsky), not an edge-bbox overlap: a long diagonal edge no longer
    marks every cell under its bounding rectangle PARTIAL, so covers
    are tighter for the same budget.  Exactness argument for the
    superset property: if polygon material meets a cell and no ring
    edge crosses the cell bbox, the bbox lies wholly inside material
    (its boundary is uncrossed), so all five samples are inside and
    ``any_in`` keeps it."""
    rings_arr = [np.asarray(r, dtype=np.float64) for r in rings]
    bx0, by0, bx1, by1 = bbox
    lat_lo, lon_lo, lat_hi, lon_hi = backend.cell_bbox(cells, res)
    lat_lo = np.atleast_1d(lat_lo)
    lon_lo = np.atleast_1d(lon_lo)
    lat_hi = np.atleast_1d(lat_hi)
    lon_hi = np.atleast_1d(lon_hi)
    overlap = (lon_hi >= bx0) & (lon_lo <= bx1) & (lat_hi >= by0) & (lat_lo <= by1)

    # cell-bbox corners + center inside the polygon
    n = len(cells)
    cx = np.stack([lon_lo, lon_hi, lon_hi, lon_lo, (lon_lo + lon_hi) / 2.0])
    cy = np.stack([lat_lo, lat_lo, lat_hi, lat_hi, (lat_lo + lat_hi) / 2.0])
    inside = points_in_polygon(cx.ravel(), cy.ravel(), rings).reshape(5, n)
    all_in = inside.all(axis=0)
    any_in = inside.any(axis=0)

    # any polygon vertex (any ring, holes included) inside the cell bbox
    vx = np.concatenate([r[:, 0] for r in rings_arr])
    vy = np.concatenate([r[:, 1] for r in rings_arr])
    v_in = (
        (vx[None, :] >= lon_lo[:, None])
        & (vx[None, :] <= lon_hi[:, None])
        & (vy[None, :] >= lat_lo[:, None])
        & (vy[None, :] <= lat_hi[:, None])
    ).any(axis=1)

    # any ring edge intersecting the cell bbox — exact, per ring (no
    # spurious cross-ring segments)
    sx0 = np.concatenate([r[:-1, 0] for r in rings_arr])
    sy0 = np.concatenate([r[:-1, 1] for r in rings_arr])
    sx1 = np.concatenate([r[1:, 0] for r in rings_arr])
    sy1 = np.concatenate([r[1:, 1] for r in rings_arr])
    e_hit = _seg_box_hit(
        sx0, sy0, sx1, sy1, lon_lo, lon_hi, lat_lo, lat_hi
    ).any(axis=1)

    touch = overlap & (any_in | v_in | e_hit)
    full = all_in & ~v_in & ~e_hit
    partial = touch & ~full
    return full, partial


def adaptive_cover(
    backend,
    rings,
    max_cells: int = 64,
    max_res: int | None = None,
    pad_factor: float = 2.0,
) -> np.ndarray:
    """Polygon rings ([(m, 2) lon/lat closed], outer first) -> sorted
    array of mixed-resolution cell ids covering the polygon.

    The cover holds at most ``max_cells`` cells EXCEPT when even the
    touching cells of the backend's coarsest resolution exceed the
    budget (e.g. a hemisphere-scale polygon with a tiny budget): the
    coarsening back-off bottoms out at ``backend.min_res`` and returns
    that seed cover intact — truncating it would break the superset
    invariant, which always wins over the budget (ADVICE r04).

    PRECONDITION (ADVICE r05): ``rings`` must not straddle the
    antimeridian — vertices live in [-180, 180] and edges do not wrap.
    The conservative cell-edge test compares ``cap_bbox``'s UNWRAPPED
    longitude bounds against vertex longitudes, so a wrapping polygon
    would silently break the superset invariant.  Geometry from the
    pipeline satisfies this (prepare's antimeridian split, G4); cut
    other inputs at 180° first."""
    if max_cells < 1:
        raise ValueError("max_cells must be >= 1")
    outer = np.asarray(rings[0], dtype=np.float64)
    bx0, by0 = outer[:, 0].min(), outer[:, 1].min()
    bx1, by1 = outer[:, 0].max(), outer[:, 1].max()
    bbox = (bx0, by0, bx1, by1)
    if max_res is None:
        max_res = backend.max_res

    # seed level: coarsest res whose cells are no wider than the bbox —
    # the center-inside fill of the padded bbox then reliably catches
    # every cell intersecting the true bbox (at coarser levels cell
    # centers can all fall outside the region entirely)
    extent = max(bx1 - bx0, by1 - by0, 1e-9)
    res = backend.min_res
    while res < max_res and backend.cell_width_deg(res) > extent:
        res += 1

    def _seed(r: int):
        pad = pad_factor * backend.cell_width_deg(r)
        x0, x1 = max(bx0 - pad, -180.0), min(bx1 + pad, 180.0)
        y0, y1 = max(by0 - pad, -90.0), min(by1 + pad, 90.0)
        rect = np.array(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]
        )
        return np.unique(np.asarray(backend.polyfill([rect], r), dtype=str))

    # back off to coarser levels while even the TOUCHING seed cells
    # exceed the budget (tiny-budget / fine-extent combinations)
    while True:
        seeds = _seed(res)
        if len(seeds):
            full, partial = _classify(backend, seeds, res, rings, bbox)
        else:
            full = partial = np.zeros(0, dtype=bool)
        if int(full.sum() + partial.sum()) <= max_cells or res <= backend.min_res:
            break
        res -= 1
    cover: list[str] = []
    import heapq

    queue: list[tuple[int, str]] = []  # (res, cell) — coarsest first
    if len(seeds):
        cover.extend(seeds[full].tolist())
        for c in seeds[partial]:
            heapq.heappush(queue, (res, str(c)))
    # refine coarsest-first, one cell at a time, while the budget allows
    # (the RegionCoverer shape: boundary cells end up finest)
    while queue:
        r, cell = queue[0]
        if r >= max_res:
            break
        kids = np.asarray(backend.children_at_res(cell, r + 1), dtype=str)
        full, partial = _classify(backend, kids, r + 1, rings, bbox)
        n_new = int(full.sum()) + int(partial.sum())
        if len(cover) + (len(queue) - 1) + n_new > max_cells:
            break
        heapq.heappop(queue)
        cover.extend(kids[full].tolist())
        for c in kids[partial]:
            heapq.heappush(queue, (r + 1, str(c)))
    cover.extend(c for _, c in queue)
    return np.asarray(sorted(set(cover)), dtype=str)
