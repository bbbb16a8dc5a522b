"""RegionCoverer — approximate an arbitrary region by ≤ max_cells cells.

Algorithm per the public S2 RegionCoverer as exercised by the reference
tests (/root/reference/src/s2/region.rs:124-549): seed with a ≤4-cell
fast covering of the region's cap bound, then refine largest-first via
a priority queue; priority = -((level << 2k + num_children) << 2k +
num_terminals). Runs on the driver per query region (the result is
broadcast into joins); also callable inside a pandas UDF for per-row
footprints.

Determinism: candidate pop order replicates Rust std's BinaryHeap
exactly (see _RustHeap) so coverings match the reference cell-for-cell,
verified against tests/golden/refdump.jsonl.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..kernels import cellid as k
from .cell import Cell
from .cellunion import CellUnion


@dataclass
class RegionCoverer:
    min_level: int = 0
    max_level: int = 30
    level_mod: int = 1
    max_cells: int = 8

    def covering(self, region) -> CellUnion:
        cu = self._cell_union(region, interior=False)
        ids = cu.denormalize(
            max(0, min(30, self.min_level)), max(1, min(3, self.level_mod))
        )
        return CellUnion(ids, normalized=True)

    def interior_covering(self, region) -> CellUnion:
        cu = self._cell_union(region, interior=True)
        ids = cu.denormalize(
            max(0, min(30, self.min_level)), max(1, min(3, self.level_mod))
        )
        return CellUnion(ids, normalized=True)

    def fast_covering(self, region) -> CellUnion:
        ids = np.array(region.cell_union_bound(), dtype=np.uint64)
        return self._normalize_covering(ids)

    # ------------------------------------------------------------------

    def _cell_union(self, region, interior: bool) -> CellUnion:
        c = _Coverer(self, region, interior)
        c.run()
        return CellUnion(np.array(c.result, dtype=np.uint64))

    def _adjust_level(self, level: int) -> int:
        if self.level_mod > 1 and level > self.min_level:
            level -= (level - self.min_level) % self.level_mod
        return level

    def _normalize_covering(self, ids: np.ndarray) -> CellUnion:
        """ref region.rs:504-549."""
        if self.max_level < 30 or self.level_mod > 1:
            out = []
            for cid in ids:
                lvl = int(k.level(np.array([cid], dtype=np.uint64))[0])
                new_level = self._adjust_level(min(lvl, self.max_level))
                if new_level != lvl:
                    cid = int(k.parent(np.array([cid], dtype=np.uint64), new_level)[0])
                out.append(int(cid))
            ids = np.array(out, dtype=np.uint64)
        cu = CellUnion(ids)
        while len(cu) > self.max_cells:
            best_index, best_level = -1, -1
            v = cu.ids
            cal = k.common_ancestor_level(v[:-1], v[1:])
            for i in range(len(v) - 1):
                lvl = int(cal[i])
                if lvl < 0:
                    continue
                lvl = self._adjust_level(lvl)
                if lvl > best_level:
                    best_level, best_index = lvl, i
            if best_level < self.min_level:
                break
            new_ids = v.copy()
            new_ids[best_index] = k.parent(v[best_index : best_index + 1], best_level)[0]
            cu = CellUnion(new_ids)
        if self.min_level > 0 or self.level_mod > 1:
            cu = CellUnion(cu.denormalize(self.min_level, self.level_mod), normalized=True)
        return cu


@dataclass
class _Candidate:
    priority: int
    cell: Cell
    terminal: bool
    children: list = field(default_factory=list)


class _RustHeap:
    """Bit-faithful emulation of Rust std's ``BinaryHeap`` (max-heap) so
    that candidate pop order — and therefore covering output — matches the
    reference cell-for-cell, including priority ties (the reference's
    Candidate Ord compares priority only, region.rs:166-170, so tie order
    is decided by the heap mechanics: hole-based sift_up on push and
    sift_down_to_bottom on pop, right child preferred on equal children).

    Verified against 459 reference-dumped coverings in
    tests/golden/refdump.jsonl (tools/refdump dumps them by running the
    reference library itself).
    """

    def __init__(self):
        self.data: list[_Candidate] = []

    def __len__(self) -> int:
        return len(self.data)

    def push(self, item: _Candidate) -> None:
        self.data.append(item)
        self._sift_up(0, len(self.data) - 1)

    def pop(self) -> _Candidate:
        d = self.data
        item = d.pop()
        if d:
            item, d[0] = d[0], item
            self._sift_down_to_bottom(0)
        return item

    def clear(self) -> None:
        self.data.clear()

    def _sift_up(self, start: int, pos: int) -> None:
        d = self.data
        elem = d[pos]
        while pos > start:
            parent = (pos - 1) >> 1
            if elem.priority <= d[parent].priority:
                break
            d[pos] = d[parent]
            pos = parent
        d[pos] = elem

    def _sift_down_to_bottom(self, pos: int) -> None:
        d = self.data
        end = len(d)
        start = pos
        elem = d[pos]
        child = 2 * pos + 1
        while child <= end - 2:
            if d[child].priority <= d[child + 1].priority:
                child += 1
            d[pos] = d[child]
            pos = child
            child = 2 * pos + 1
        if child == end - 1:
            d[pos] = d[child]
            pos = child
        d[pos] = elem
        self._sift_up(start, pos)


class _Coverer:
    def __init__(self, constraint: RegionCoverer, region, interior: bool):
        self.c = constraint
        self.region = region
        self.interior = interior
        self.result: list[int] = []
        self.pq = _RustHeap()

    def new_candidate(self, cell: Cell) -> _Candidate | None:
        if not self.region.intersects_cell(cell):
            return None
        level = cell.level
        terminal = False
        if level >= self.c.min_level:
            if self.interior:
                if self.region.contains_cell(cell):
                    terminal = True
                elif level + self.c.level_mod > self.c.max_level:
                    return None
            elif level + self.c.level_mod > self.c.max_level or self.region.contains_cell(cell):
                terminal = True
        return _Candidate(priority=0, cell=cell, terminal=terminal)

    def expand_children(self, cand: _Candidate, cell: Cell, num_levels: int) -> int:
        num_levels -= 1
        num_terminals = 0
        for child_id in cell.children_ids():
            child_cell = Cell(child_id)
            if num_levels > 0:
                if self.region.intersects_cell(child_cell):
                    num_terminals += self.expand_children(cand, child_cell, num_levels)
                continue
            child = self.new_candidate(child_cell)
            if child is not None:
                if child.terminal:
                    num_terminals += 1
                cand.children.append(child)
        return num_terminals

    def add_candidate(self, cand: _Candidate) -> None:
        if cand.terminal:
            self.result.append(cand.cell.id)
            return
        level = cand.cell.level
        num_levels = 1 if level < self.c.min_level else self.c.level_mod
        num_terminals = self.expand_children(cand, cand.cell, num_levels)
        max_children_shift = 2 * self.c.level_mod
        if not cand.children:
            return
        if (
            not self.interior
            and num_terminals == (1 << max_children_shift)
            and level >= self.c.min_level
        ):
            cand.terminal = True
            self.add_candidate(cand)
            return
        cand.priority = -(
            (((level << max_children_shift) + len(cand.children)) << max_children_shift)
            + num_terminals
        )
        self.pq.push(cand)

    def initial_candidates(self) -> None:
        temp = RegionCoverer(
            min_level=0,
            max_level=self.c.max_level,
            level_mod=1,
            max_cells=min(self.c.max_cells, 4),
        )
        cells = temp.fast_covering(self.region)
        ids = self._adjust_cell_levels(cells.ids)
        for cid in ids:
            cand = self.new_candidate(Cell(int(cid)))
            if cand is not None:
                self.add_candidate(cand)

    def _adjust_cell_levels(self, ids: np.ndarray) -> np.ndarray:
        """ref region.rs:283-316."""
        if self.c.level_mod == 1:
            return ids
        out: list[int] = []
        for cid in ids:
            arr = np.array([cid], dtype=np.uint64)
            lvl = int(k.level(arr)[0])
            new_level = self.c._adjust_level(lvl)
            cur = int(k.parent(arr, new_level)[0]) if new_level != lvl else int(cid)
            if out:
                last = np.array([out[-1]], dtype=np.uint64)
                cur_a = np.array([cur], dtype=np.uint64)
                if bool(k.contains(last, cur_a)[0]):
                    continue
                if bool(k.contains(cur_a, last)[0]):
                    out.pop()
            out.append(cur)
        return np.array(out, dtype=np.uint64)

    def run(self) -> None:
        self.initial_candidates()
        while len(self.pq):
            if self.interior and len(self.result) >= self.c.max_cells:
                break
            cand = self.pq.pop()
            if (
                self.interior
                or cand.cell.level < self.c.min_level
                or len(cand.children) == 1
                or len(self.result) + len(self.pq) + len(cand.children) <= self.c.max_cells
            ):
                for child in cand.children:
                    if not self.interior or len(self.result) < self.c.max_cells:
                        self.add_candidate(child)
            else:
                cand.terminal = True
                self.add_candidate(cand)
        self.pq.clear()
