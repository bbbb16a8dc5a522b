"""Denormalize golden cases (reference cellunion.rs:1133-1191).

The reference applies denormalize to raw (possibly duplicated) vectors;
our CellUnion normalizes on construction, so the duplicate-preserving
aspect is out of scope — the level-expansion semantics are what these
cases pin down.
"""

from __future__ import annotations

import numpy as np

from rust_s2_spark.geometry import CellUnion
from rust_s2_spark.kernels import cellid as k

U = np.uint64


def cfbl(face: int, level: int) -> int:
    """from_face_pos_level(face, 0, level) (ref cellid.rs:85-88)."""
    raw = (face << 61) + 1
    return int(k.parent(np.array([raw], dtype=np.uint64), level)[0])


def children(v: int) -> list[int]:
    return [int(c) for c in k.children(np.array([v], dtype=np.uint64))[0]]


def denorm(cells: list[int], min_level: int, level_mod: int) -> set[int]:
    cu = CellUnion(cells)
    return {int(c) for c in cu.denormalize(min_level, level_mod)}


def test_not_expanded_level_mod_1():
    cells = [cfbl(2, 11), cfbl(3, 14), cfbl(0, 10)]
    assert denorm(cells, 10, 1) == set(cells)


def test_not_expanded_level_mod_2():
    cells = [cfbl(2, 12), cfbl(3, 14), cfbl(0, 10)]
    assert denorm(cells, 10, 2) == set(cells)


def test_expanded_level_mod_3():
    cells = [cfbl(2, 12), cfbl(5, 11)]
    want = set(children(cfbl(2, 12)))
    for ch in children(cfbl(5, 11)):
        want |= set(children(ch))
    assert denorm(cells, 10, 3) == want


def test_expanded_below_min_level():
    cells = [cfbl(2, 9)]
    assert denorm(cells, 10, 3) == set(children(cfbl(2, 9)))
