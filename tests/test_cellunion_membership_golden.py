"""CellUnion membership golden tables (reference cellunion.rs:619-731):
NYC single cell, NYC+SFO 8-cell union, contiguous-US Hilbert chain —
each with contained / overlapping / disjoint probes."""

from __future__ import annotations

import numpy as np
import pytest

from rust_s2_spark.geometry import CellUnion
from rust_s2_spark.kernels import cellid as k

U = np.uint64


def one(v: int) -> np.ndarray:
    return np.array([v], dtype=np.uint64)


def child_begin(v: int) -> int:
    b = k.lsb(one(v))[0]
    return int(one(v)[0] - b + (b >> U(2)))


def child_begin_at(v: int, lvl: int) -> int:
    return int(k.child_begin_at_level(one(v), lvl)[0])


def imm_parent(v: int) -> int:
    return int(k.immediate_parent(one(v))[0])


NYC = 0x89C25C0000000000

CASES = [
    # (union cells, contained probes, overlapping probes, disjoint probes)
    (
        [NYC],
        [child_begin(NYC), child_begin_at(NYC, 28)],
        [imm_parent(NYC), int(k.from_face(np.array([int(k.face(one(NYC))[0])]))[0])],
        [
            int(k.next_id(one(NYC))[0]),
            child_begin_at(int(k.next_id(one(NYC))[0]), 28),
            0x89C2700000000000,
            0x89E9000000000000,
            0x89C1000000000000,
        ],
    ),
    (
        [
            0x89C25B0000000000, 0x89C2590000000000, 0x89C2F70000000000,
            0x89C2F50000000000, 0x8085870000000000, 0x8085810000000000,
            0x808F7D0000000000, 0x808F7F0000000000,
        ],
        [
            0x808F7EF300000000, 0x808F7E5CF0000000, 0x808587F000000000,
            0x89C25AC000000000, 0x89C259A400000000, 0x89C258FA10000000,
            0x89C258F174007000,
        ],
        [0x808C000000000000, 0x89C4000000000000],
        [
            0x89C15A4FCB1BB000, 0x89C15A4E4AA95000, 0x8094000000000000,
            0x8096F10000000000, 0x87C0000000000000,
        ],
    ),
    (
        [
            0x8100000000000000, 0x8740000000000000, 0x8790000000000000,
            0x87F4000000000000, 0x87F9000000000000, 0x87FF400000000000,
            0x87FF900000000000, 0x87FFF40000000000, 0x87FFF90000000000,
            0x87FFFF4000000000, 0x87FFFF9000000000, 0x87FFFFF400000000,
            0x87FFFFF900000000, 0x87FFFFFF40000000, 0x87FFFFFF90000000,
            0x87FFFFFFF4000000, 0x87FFFFFFF9000000, 0x87FFFFFFFF400000,
        ],
        [
            0x808F400000000000, 0x80EB118B00000000, 0x8136A7A11D000000,
            0x8136A7A11DAC0000, 0x876C7C0000000000, 0x87F96D0000000000,
            0x87FFFFFFFF400000,
        ],
        [imm_parent(0x8100000000000000), imm_parent(0x8740000000000000)],
        [
            0x52AAAAAAAB300000, 0x52AAAAAAACD00000, 0x87FFFFFFFA100000,
            0x87FFFFFFED500000, 0x87FFFFFFA0100000, 0x87FFFFFED5540000,
            0x87FFFFFED6240000, 0x52AAAACCCB340000, 0x87A0000400000000,
            0x87A000001F000000, 0x87A0000029D00000, 0x9500000000000000,
        ],
    ),
]


@pytest.mark.parametrize("idx", range(len(CASES)))
def test_cellunion_membership(idx):
    cells, contained, overlapping, disjoint = CASES[idx]
    cu = CellUnion(cells)
    for probe in contained:
        assert cu.contains_id(probe), hex(probe)
        assert cu.intersects_id(probe), hex(probe)
    for probe in overlapping:
        assert not cu.contains_id(probe), hex(probe)
        assert cu.intersects_id(probe), hex(probe)
    for probe in disjoint:
        assert not cu.contains_id(probe), hex(probe)
        assert not cu.intersects_id(probe), hex(probe)
    # the union's own cells are contained (normalization may merge them)
    for c in cells:
        assert cu.contains_id(c), hex(c)
