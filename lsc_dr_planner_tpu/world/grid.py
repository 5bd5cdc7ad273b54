"""Static world preprocessing: occupancy, blocked masks, distance fields.

TPU-first replacement for the reference's octomap + DynamicEDTOctomap
stack (reference: src/map_manager.cpp:59-98 builds the octree + EDT;
CSV box rasterization :262-305; the EDT is queried per cell during SFC
expansion, collision_constraints.cpp:779-809, and per grid node during
MAPF occupancy, grid_based_planner.cpp:102-139).

Design: the world is static per mission, so everything expensive is
precomputed ONCE into dense arrays:

  * `occ`            [X, Y, Z]  — cell occupancy (reference rasterization
                                  semantics: cell centers at (i+½)·res)
  * `blocked`        [X+1, Y+1, Z+1] — lattice points within L∞ distance
                                  `radius` of an occupied cell's box (the
                                  reference's isObstacleInSFC test)
  * `blocked_cumsum` [X+2,...]  — 3-D integral image of `blocked`, making
                                  "any blocked lattice point inside this
                                  box?" an O(1) 8-corner lookup. This is
                                  what turns the reference's per-cell EDT
                                  scans (1.3 ms/agent/step) into O(1)
                                  queries inside the SFC expansion loop.

Point distance queries (`distance_to_obstacle`) are computed analytically
against the rasterized-cell-center geometry of the world's box list —
the same "Euclidean-nearest occupied cell center" semantics as
DynamicEDTOctomap::getDistanceAndClosestObstacle, but exact and O(#boxes)
per query, fully batched.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class GridWorld:
    """Precomputed static world. Arrays are jnp (device) unless noted."""

    resolution: float
    world_min: np.ndarray  # host [3]
    world_max: np.ndarray  # host [3]
    origin_idx: np.ndarray  # host int [3]; lattice index 0 is at origin_idx*res
    occ: jnp.ndarray  # [X, Y, Z] bool
    blocked: jnp.ndarray  # [X+1, Y+1, Z+1] bool (lattice points)
    blocked_cumsum: jnp.ndarray  # [X+2, Y+2, Z+2] int32 integral image
    cell_ranges: jnp.ndarray  # [B, 3, 2] int32: rasterized cell index range
    #                            per box per axis [lo, hi) in global indices
    n_boxes: int
    radius: float

    @property
    def dims(self) -> Tuple[int, int, int]:
        return tuple(int(d) for d in self.occ.shape)

    # ------------------------------------------------------------------
    def lattice_to_point(self, idx):
        """Lattice index [..., 3] → world coordinates (lattice points are
        at integer multiples of the resolution)."""
        return (jnp.asarray(idx, jnp.float32) + jnp.asarray(
            self.origin_idx, jnp.float32)) * self.resolution

    def point_to_lattice_floor(self, p):
        return jnp.floor(
            jnp.asarray(p) / self.resolution + 1e-6
        ).astype(jnp.int32) - jnp.asarray(self.origin_idx, jnp.int32)

    def point_to_lattice_ceil(self, p):
        return jnp.ceil(
            jnp.asarray(p) / self.resolution - 1e-6
        ).astype(jnp.int32) - jnp.asarray(self.origin_idx, jnp.int32)

    def point_to_lattice_round(self, p):
        return jnp.round(jnp.asarray(p) / self.resolution).astype(
            jnp.int32
        ) - jnp.asarray(self.origin_idx, jnp.int32)

    # ------------------------------------------------------------------
    def box_blocked_count(self, lo, hi):
        """Number of blocked lattice points with index in [lo, hi]
        (inclusive), via the integral image. lo, hi: [..., 3] int32.
        Out-of-range indices are clamped (boundary handled separately by
        the in-bounds check in the SFC expansion)."""
        S = self.blocked_cumsum
        X1, Y1, Z1 = (d - 1 for d in S.shape)
        lo = jnp.clip(lo, 0, jnp.asarray([X1, Y1, Z1]) - 1)
        hi1 = jnp.clip(hi + 1, 0, jnp.asarray([X1, Y1, Z1]))

        def at(ix, iy, iz):
            return S[ix, iy, iz]

        x0, y0, z0 = lo[..., 0], lo[..., 1], lo[..., 2]
        x1, y1, z1 = hi1[..., 0], hi1[..., 1], hi1[..., 2]
        return (
            at(x1, y1, z1)
            - at(x0, y1, z1)
            - at(x1, y0, z1)
            - at(x1, y1, z0)
            + at(x0, y0, z1)
            + at(x0, y1, z0)
            + at(x1, y0, z0)
            - at(x0, y0, z0)
        )

    def box_is_free(self, lo, hi):
        return self.box_blocked_count(lo, hi) == 0

    # ------------------------------------------------------------------
    def distance_to_obstacle(self, p):
        """Euclidean distance from point(s) p [..., 3] to the nearest
        occupied cell center, and that center. Matches
        DynamicEDTOctomap::getDistanceAndClosestObstacle semantics
        exactly (up to ties), with no max-dist clamp.

        Returns (dist [...], closest_center [..., 3]). With no obstacles,
        dist = +inf and center = 0.
        """
        if self.n_boxes == 0:
            p = jnp.asarray(p)
            return (
                jnp.full(p.shape[:-1], jnp.inf, dtype=p.dtype),
                jnp.zeros_like(p),
            )
        p = jnp.asarray(p)
        res = self.resolution
        # nearest cell index to p per box: clamp(round(p/res - 0.5), lo, hi-1)
        pidx = jnp.floor(p / res).astype(jnp.int32)  # index of cell containing p
        lo = self.cell_ranges[..., 0]  # [B, 3]
        hi = self.cell_ranges[..., 1] - 1  # inclusive
        near_idx = jnp.clip(pidx[..., None, :], lo, hi)  # [..., B, 3]
        centers = (near_idx.astype(p.dtype) + 0.5) * res
        d = jnp.linalg.norm(p[..., None, :] - centers, axis=-1)  # [..., B]
        best = jnp.argmin(d, axis=-1)
        dist = jnp.take_along_axis(d, best[..., None], axis=-1)[..., 0]
        center = jnp.take_along_axis(
            centers, best[..., None, None], axis=-2
        )[..., 0, :]
        return dist, center


# ----------------------------------------------------------------------
# Device-side blocked-lattice + integral-image build (for per-agent
# local maps that change every step — see world/map_manager.py)
# ----------------------------------------------------------------------


def dilation_offsets(resolution: float, radius: float) -> Tuple[int, int]:
    """Cell-to-lattice dilation offset range (see _blocked_lattice_mask):
    lattice point j is blocked iff an occupied cell i = j + d exists with
    d ∈ [d_lo, d_hi]."""
    r = radius / resolution
    eps = 1e-6
    return int(np.ceil(-r - 1 + eps)), int(np.floor(r - eps))


def blocked_cumsum_jnp(occ: jnp.ndarray, resolution: float, radius: float):
    """Jit-compatible version of `_blocked_lattice_mask` + integral image.

    `occ`: [..., X, Y, Z] bool (leading batch axes allowed — per-agent
    local maps batch over the fleet). Returns (blocked [..., X+1, Y+1,
    Z+1] bool, cumsum [..., X+2, Y+2, Z+2] int32). Matches the host
    numpy build bit-for-bit (asserted in tests/test_map.py)."""
    d_lo, d_hi = dilation_offsets(resolution, radius)
    cur = occ
    nb = occ.ndim - 3
    for axis3 in range(3):
        axis = nb + axis3
        n_in = cur.shape[axis]
        n_out = n_in + 1
        shp = list(cur.shape)
        shp[axis] = n_out
        nxt = jnp.zeros(shp, dtype=bool)
        for d in range(d_lo, d_hi + 1):
            src_lo = max(0, d)
            src_hi = min(n_in, n_out + d)
            if src_hi <= src_lo:
                continue
            sl_src = [slice(None)] * cur.ndim
            sl_dst = [slice(None)] * cur.ndim
            sl_src[axis] = slice(src_lo, src_hi)
            sl_dst[axis] = slice(src_lo - d, src_hi - d)
            nxt = nxt.at[tuple(sl_dst)].set(
                nxt[tuple(sl_dst)] | cur[tuple(sl_src)]
            )
        cur = nxt
    blocked = cur
    S = blocked.astype(jnp.int32)
    for axis3 in range(3):
        S = jnp.cumsum(S, axis=nb + axis3)
    pad = [(0, 0)] * nb + [(1, 0)] * 3
    S = jnp.pad(S, pad)
    return blocked, S


def local_grid_world(base: "GridWorld", occ: jnp.ndarray,
                     blocked: jnp.ndarray, cumsum: jnp.ndarray) -> "GridWorld":
    """A GridWorld view over a (possibly traced) occupancy variant of
    `base` — used inside the jitted pipeline for per-agent local maps.
    Distance queries (`distance_to_obstacle`) are not available on the
    view (cell_ranges describe the base world's boxes, not the local
    occupancy)."""
    return GridWorld(
        resolution=base.resolution,
        world_min=base.world_min,
        world_max=base.world_max,
        origin_idx=base.origin_idx,
        occ=occ,
        blocked=blocked,
        blocked_cumsum=cumsum,
        cell_ranges=base.cell_ranges,
        n_boxes=0,
        radius=base.radius,
    )


# ----------------------------------------------------------------------
# Construction (host side, numpy; once per mission)
# ----------------------------------------------------------------------


def rasterize_boxes(boxes: np.ndarray, world_min, world_max,
                    resolution: float):
    """Rasterize a CSV box list into an occupancy grid. Returns
    (occ [X, Y, Z] bool, cell_ranges [B, 3, 2] int32 global index ranges,
    origin_idx [3] int64, dims [3] int64). Semantics match
    MapManager::updateOctreeFromCSV (src/map_manager.cpp:262-305)."""
    world_min = np.asarray(world_min, dtype=np.float64)
    world_max = np.asarray(world_max, dtype=np.float64)
    origin_idx = np.round(world_min / resolution).astype(np.int64)
    end_idx = np.round(world_max / resolution).astype(np.int64)
    dims = (end_idx - origin_idx).astype(np.int64)
    X, Y, Z = (int(d) for d in dims)

    occ = np.zeros((X, Y, Z), dtype=bool)
    boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 6)
    cell_ranges = np.zeros((max(len(boxes), 1), 3, 2), dtype=np.int32)
    for b, row in enumerate(boxes):
        com, size = row[:3], row[3:]
        lo = np.round((com - 0.5 * size) / resolution).astype(np.int64)
        hi = np.round((com + 0.5 * size) / resolution).astype(np.int64)
        cell_ranges[b, :, 0] = lo
        cell_ranges[b, :, 1] = hi
        clo = np.maximum(lo - origin_idx, 0)
        chi = np.minimum(hi - origin_idx, dims)
        if np.all(chi > clo):
            occ[clo[0] : chi[0], clo[1] : chi[1], clo[2] : chi[2]] = True
    return occ, cell_ranges, origin_idx, dims


def build_grid_world(
    boxes: np.ndarray,
    world_min,
    world_max,
    resolution: float,
    radius: float,
) -> GridWorld:
    """Rasterize the CSV box list and precompute all static fields.

    `boxes`: [B, 6] rows (cx, cy, cz, sx, sy, sz). Rasterization matches
    MapManager::updateOctreeFromCSV (src/map_manager.cpp:262-305): cells
    with index i in [round((c−s/2)/res), round((c+s/2)/res)) per axis.
    `radius` is the agent radius used for the blocked-lattice mask
    (all agents share one radius in the shipped benchmarks; rebuild per
    distinct radius if heterogeneous).
    """
    occ, cell_ranges, origin_idx, dims = rasterize_boxes(
        boxes, world_min, world_max, resolution
    )
    world_min = np.asarray(world_min, dtype=np.float64)
    world_max = np.asarray(world_max, dtype=np.float64)
    boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 6)

    blocked = _blocked_lattice_mask(occ, resolution, radius)
    S = np.zeros(tuple(d + 1 for d in blocked.shape), dtype=np.int32)
    S[1:, 1:, 1:] = np.cumsum(np.cumsum(np.cumsum(blocked, 0), 1), 2)

    return GridWorld(
        resolution=resolution,
        world_min=world_min,
        world_max=world_max,
        origin_idx=origin_idx,
        occ=jnp.asarray(occ),
        blocked=jnp.asarray(blocked),
        blocked_cumsum=jnp.asarray(S),
        cell_ranges=jnp.asarray(cell_ranges),
        n_boxes=len(boxes),
        radius=radius,
    )


def _blocked_lattice_mask(occ: np.ndarray, res: float, radius: float) -> np.ndarray:
    """Lattice point j is blocked iff some occupied cell i has
    L∞(j·res, cell box of i) < radius (+ε), i.e. |(i−j) + ½| < radius/res + ½
    per axis ⇔ (i−j) ∈ (−radius/res − 1, radius/res).

    This is the reference's isObstacleInSFC test
    (collision_constraints.cpp:779-809) evaluated exactly (true L∞
    nearest instead of the EDT's Euclidean-nearest approximation),
    computed for every lattice point at once by separable dilation.
    """
    X, Y, Z = occ.shape
    d_lo, d_hi = dilation_offsets(res, radius)
    out = np.zeros((X + 1, Y + 1, Z + 1), dtype=bool)
    # separable dilation: axis by axis
    cur = occ
    for axis in range(3):
        n_lat = cur.shape[axis] + 1 if axis == 0 else None
        # dilate cells → lattice along this axis
        shp = list(cur.shape)
        shp[axis] += 1
        nxt = np.zeros(shp, dtype=bool)
        for d in range(d_lo, d_hi + 1):
            # lattice j gets cell j + d
            src_lo = max(0, d)
            src_hi = min(cur.shape[axis], shp[axis] + d)
            if src_hi <= src_lo:
                continue
            dst_lo = src_lo - d
            dst_hi = src_hi - d
            sl_src = [slice(None)] * 3
            sl_dst = [slice(None)] * 3
            sl_src[axis] = slice(src_lo, src_hi)
            sl_dst[axis] = slice(dst_lo, dst_hi)
            nxt[tuple(sl_dst)] |= cur[tuple(sl_src)]
        cur = nxt
    out = cur
    return out
