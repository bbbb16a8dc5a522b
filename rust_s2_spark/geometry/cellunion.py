"""CellUnion: a normalized, sorted (unsigned) set of cell ids.

Semantics per the reference (/root/reference/src/s2/cellunion.rs):
sorted unsigned, no duplicates, no cell containing another, no four
sibling cells (collapsed to the parent). Stored as a numpy uint64
array; set algebra is vectorized where the shapes allow.
"""

from __future__ import annotations

import numpy as np

from ..kernels import cellid as k
from ..kernels import metric as metrics

U = np.uint64


class CellUnion:
    __slots__ = ("ids",)

    def __init__(self, ids, normalized: bool = False):
        arr = np.asarray(ids, dtype=np.uint64).ravel()
        self.ids = arr
        if not normalized:
            self.normalize()

    # -- normalization (ref cellunion.rs:69-135) ------------------------------

    def normalize(self) -> None:
        v = np.sort(self.ids)
        out: list[int] = []
        rmin = k.range_min(v)
        rmax = k.range_max(v)
        last_max = -1  # running unsigned max of accepted range_max
        for idx in range(len(v)):
            ci = int(v[idx])
            if out and int(rmax[idx]) <= last_max:
                continue  # contained in the previously accepted cell
            # pop accepted cells contained by this one (cell ranges nest,
            # so range inclusion of the accepted id is the exact test)
            while out and int(rmin[idx]) <= out[-1][2] <= int(rmax[idx]):
                out.pop()
            # sibling collapse (cascading)
            while len(out) >= 3:
                f0, f1, f2 = out[-3][2], out[-2][2], out[-1][2]
                if f0 ^ f1 ^ f2 ^ ci != 0:
                    break
                lsb_ci = ci & (-ci & 0xFFFFFFFFFFFFFFFF)
                mask = (lsb_ci << 1) & 0xFFFFFFFFFFFFFFFF
                mask = ~(mask + (mask << 1)) & 0xFFFFFFFFFFFFFFFF
                should = ci & mask
                if (
                    (f0 & mask) != should
                    or (f1 & mask) != should
                    or (f2 & mask) != should
                    or (ci & ((1 << 60) - 1)) == 0  # is_face
                ):
                    break
                out.pop()
                out.pop()
                out.pop()
                nlsb = lsb_ci << 2
                ci = (ci & (~nlsb + 1) & 0xFFFFFFFFFFFFFFFF) | nlsb
            w = (ci & -ci) - 1
            out.append((ci - w, ci + w, ci))
            last_max = ci + w
        self.ids = np.array([c for _, _, c in out], dtype=np.uint64)

    def is_normalized(self) -> bool:
        other = CellUnion(self.ids.copy())
        return np.array_equal(other.ids, self.ids)

    # -- membership -----------------------------------------------------------

    def contains_id(self, cell_id: int) -> bool:
        return bool(self.contains_ids(np.array([cell_id], dtype=np.uint64))[0])

    def intersects_id(self, cell_id: int) -> bool:
        return bool(self.intersects_ids(np.array([cell_id], dtype=np.uint64))[0])

    def contains_ids(self, ids: np.ndarray) -> np.ndarray:
        """Vectorized membership via searchsorted (ref binary search)."""
        if len(self.ids) == 0:
            return np.zeros(len(ids), dtype=bool)
        ids = np.asarray(ids, dtype=np.uint64)
        i = np.searchsorted(self.ids, ids, side="right")
        res = np.zeros(len(ids), dtype=bool)
        has_next = i < len(self.ids)
        res[has_next] = k.range_min(self.ids[i[has_next]]) <= ids[has_next]
        has_prev = i > 0
        prev = k.range_max(self.ids[np.maximum(i - 1, 0)])
        res |= has_prev & (prev >= ids)
        return res

    def intersects_ids(self, ids: np.ndarray) -> np.ndarray:
        if len(self.ids) == 0:
            return np.zeros(len(ids), dtype=bool)
        ids = np.asarray(ids, dtype=np.uint64)
        i = np.searchsorted(self.ids, ids, side="right")
        res = np.zeros(len(ids), dtype=bool)
        has_next = i < len(self.ids)
        res[has_next] = k.range_min(self.ids[i[has_next]]) <= k.range_max(
            ids[has_next]
        )
        has_prev = i > 0
        prev = k.range_max(self.ids[np.maximum(i - 1, 0)])
        res |= has_prev & (prev >= k.range_min(ids))
        return res

    def contains_union(self, o: "CellUnion") -> bool:
        return bool(np.all(self.contains_ids(o.ids)))

    def intersects_union(self, o: "CellUnion") -> bool:
        return bool(np.any(self.intersects_ids(o.ids)))

    # -- set algebra (ref cellunion.rs:234-345) --------------------------------

    def union(self, o: "CellUnion") -> "CellUnion":
        return CellUnion(np.concatenate([self.ids, o.ids]))

    def intersection(self, o: "CellUnion") -> "CellUnion":
        mine = self.ids[self.intersects_ids_of(o)]
        theirs = o.ids[o.intersects_ids_of(self)]
        keep_mine = mine[CellUnion._contained_in(mine, o)]
        keep_theirs = theirs[CellUnion._contained_in(theirs, self)]
        out = np.unique(np.concatenate([keep_mine, keep_theirs]))
        cu = CellUnion(out, normalized=True)
        cu.normalize()
        return cu

    def intersects_ids_of(self, o: "CellUnion") -> np.ndarray:
        return o.intersects_ids(self.ids) if len(self.ids) else np.zeros(0, bool)

    @staticmethod
    def _contained_in(ids: np.ndarray, cu: "CellUnion") -> np.ndarray:
        return cu.contains_ids(ids)

    def difference(self, o: "CellUnion") -> "CellUnion":
        """Cells of self not covered by o, via recursive 4-way
        subdivision of partially-covered cells (ref cellunion.rs:503-523)."""
        out: list[int] = []

        def walk(cid: np.ndarray) -> None:
            if not o.intersects_ids(cid)[0]:
                out.append(int(cid[0]))
                return
            if o.contains_ids(cid)[0]:
                return
            if bool(k.is_leaf(cid)[0]):
                return
            for ch in k.children(cid)[0]:
                walk(np.array([ch], dtype=np.uint64))

        for cid in self.ids:
            walk(np.array([cid], dtype=np.uint64))
        return CellUnion(np.array(out, dtype=np.uint64))

    def denormalize(self, min_level: int, level_mod: int) -> np.ndarray:
        """Expanded copy satisfying min_level/level_mod (ref cellunion.rs:168-192).

        Vectorized: level-L descendants of a cell are the arithmetic
        progression first = id - lsb + lsb_L, step = 2·lsb_L, count =
        4^(L-level) — built with repeat/cumsum instead of a per-descendant
        Python loop (a min_level-7 hemisphere covering denormalizes to
        ~50k cells)."""
        if len(self.ids) == 0:
            return np.zeros(0, dtype=np.uint64)
        lv = k.level(self.ids).astype(np.int64)
        new_level = np.maximum(lv, min_level)
        if level_mod > 1:
            new_level += (k.MAX_LEVEL - (new_level - min_level)) % level_mod
            new_level = np.minimum(new_level, k.MAX_LEVEL)
        counts = np.left_shift(np.int64(1), 2 * (new_level - lv))
        lsb_new = k.lsb_for_level(new_level.astype(np.uint64))
        first = self.ids - k.lsb(self.ids) + lsb_new
        step = lsb_new << U(1)
        total = int(counts.sum())
        gid = np.repeat(np.arange(len(self.ids)), counts)
        pos = (
            np.arange(total, dtype=np.int64)
            - np.repeat(np.cumsum(counts) - counts, counts)
        ).astype(np.uint64)
        return first[gid] + step[gid] * pos

    # -- expansion (ref cellunion.rs:363-395) ----------------------------------

    def expand_at_level(self, level: int) -> "CellUnion":
        output: list[np.ndarray] = []
        level_lsb = k.lsb_for_level(level)
        for idx in range(len(self.ids) - 1, -1, -1):
            cid = self.ids[idx : idx + 1]
            if int(k.lsb(cid)[0]) < int(level_lsb):
                cid = k.parent(cid, level)
                if output and bool(k.contains(cid, output[-1][:1])[0]):
                    continue
            output.append(cid)
            output.append(k.all_neighbors(cid, level)[0])
        return CellUnion(np.concatenate(output) if output else np.zeros(0, np.uint64))

    def expand_by_radius(self, min_radius_rad: float, max_level_diff: int) -> "CellUnion":
        min_level = k.MAX_LEVEL
        if len(self.ids):
            min_level = int(np.min(k.level(self.ids)))
        radius_level = metrics.MIN_WIDTH.max_level(min_radius_rad)
        if radius_level == 0 and min_radius_rad > metrics.MIN_WIDTH.value(0):
            return self.expand_at_level(0)
        return self.expand_at_level(min(min_level + max_level_diff, radius_level))

    # -- measures ---------------------------------------------------------------

    def average_area(self) -> float:
        """Σ AVG_AREA(level) over cells (ref cellunion.rs:348-356)."""
        from ..kernels.cellid import cell_area_average

        return float(np.sum(cell_area_average(self.ids))) if len(self.ids) else 0.0

    def exact_area(self) -> float:
        """Σ exact spherical cell areas (ref cellunion.rs:366-374)."""
        from ..kernels.cellid import cell_area_exact

        return float(np.sum(cell_area_exact(self.ids))) if len(self.ids) else 0.0

    def rect_bound(self):
        """Union of per-cell exact rect bounds (ref cellunion.rs:452-472)."""
        from .cell import Cell
        from .rect import Rect

        out = Rect.empty()
        for cid in self.ids:
            out = out.union(Cell(int(cid)).rect_bound())
        return out

    def cap_bound(self):
        """Cap around the area-weighted cell-center centroid
        (ref cellunion.rs:413-449)."""
        from ..kernels.cellid import cell_area_average
        from .cap import Cap
        from .cell import Cell

        if len(self.ids) == 0:
            return Cap.empty()
        x, y, z = k.cell_to_xyz(self.ids)
        n = np.sqrt(x * x + y * y + z * z)
        w = cell_area_average(self.ids)
        cx = float(np.sum(w * x / n))
        cy = float(np.sum(w * y / n))
        cz = float(np.sum(w * z / n))
        norm = (cx * cx + cy * cy + cz * cz) ** 0.5
        center = (1.0, 0.0, 0.0) if norm == 0 else (cx / norm, cy / norm, cz / norm)
        cap = Cap(center, 0.0)
        for cid in self.ids:
            cap = cap.add_cap(Cell(int(cid)).cap_bound())
        return cap

    # -- region protocol (coverable like any other region;
    #    ref cellunion.rs:413-472) ------------------------------------------

    def contains_cell(self, cell) -> bool:
        return self.contains_id(int(cell.id))

    def intersects_cell(self, cell) -> bool:
        return self.intersects_id(int(cell.id))

    def cell_union_bound(self) -> list[int]:
        return self.cap_bound().cell_union_bound()

    def contains_point_xyz(self, x: float, y: float, z: float) -> bool:
        from .. import kernels

        leaf = kernels.cell_from_xyz(
            np.array([x]), np.array([y]), np.array([z])
        )
        return bool(self.contains_ids(leaf)[0])

    def leaf_cells_covered(self) -> int:
        if len(self.ids) == 0:
            return 0
        lv = k.level(self.ids).astype(np.int64)
        return int(np.sum((np.uint64(1) << ((30 - lv).astype(np.uint64) << np.uint64(1))).astype(object)))

    def __len__(self) -> int:
        return len(self.ids)

    def __iter__(self):
        return iter(int(x) for x in self.ids)

    def tokens(self) -> list[str]:
        return k.to_token(self.ids)
