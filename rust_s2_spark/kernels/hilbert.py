"""S2 Hilbert-curve 4-bit lookup tables, built vectorized in numpy.

Semantics follow the public S2 cell decomposition (reference:
/root/reference/src/s2/cellid.rs:863-945 defines the same tables via a
recursive initializer; we build them iteratively with numpy level
expansion instead).

Table layout (identical to the reference so the 8-round encode/decode
loops produce bit-identical ids):

  LOOKUP_POS[(ij << 2) | orientation] = (pos << 2) | final_orientation
  LOOKUP_IJ [(pos << 2) | orientation] = (ij << 2) | final_orientation

where ij = (i << 4) | j for a 4-level (16x16) sub-block and pos is the
corresponding Hilbert position within the block.
"""

from __future__ import annotations

import numpy as np

U = np.uint64

SWAP_MASK = 0x01
INVERT_MASK = 0x02
LOOKUP_BITS = 4

# Per-level Hilbert traversal tables (public S2 constants).
# POS_TO_IJ[orientation][pos] -> ij (2 bits: i<<1 | j)
POS_TO_IJ = np.array(
    [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]], dtype=np.uint64
)
# IJ_TO_POS[orientation][ij] -> pos
IJ_TO_POS = np.array(
    [[0, 1, 3, 2], [0, 3, 1, 2], [2, 3, 1, 0], [2, 1, 3, 0]], dtype=np.uint64
)
POS_TO_ORIENTATION = np.array(
    [SWAP_MASK, 0, 0, INVERT_MASK | SWAP_MASK], dtype=np.uint64
)


def _build_tables() -> tuple[np.ndarray, np.ndarray]:
    size = 1 << (2 * LOOKUP_BITS + 2)  # 1024
    lookup_pos = np.zeros(size, dtype=np.uint64)
    lookup_ij = np.zeros(size, dtype=np.uint64)

    for orig in (0, SWAP_MASK, INVERT_MASK, SWAP_MASK | INVERT_MASK):
        # State vectors for every Hilbert position at the current depth.
        pos = np.zeros(1, dtype=np.uint64)
        i = np.zeros(1, dtype=np.uint64)
        j = np.zeros(1, dtype=np.uint64)
        orient = np.full(1, orig, dtype=np.uint64)
        for _ in range(LOOKUP_BITS):
            n = len(pos)
            k = np.tile(np.arange(4, dtype=np.uint64), n)
            pos = (np.repeat(pos, 4) << U(2)) | k
            rep_orient = np.repeat(orient, 4)
            ij2 = POS_TO_IJ[rep_orient, k]
            i = (np.repeat(i, 4) << U(1)) | (ij2 >> U(1))
            j = (np.repeat(j, 4) << U(1)) | (ij2 & U(1))
            orient = rep_orient ^ POS_TO_ORIENTATION[k]
        ij = (i << U(LOOKUP_BITS)) | j
        lookup_pos[(ij << U(2)) + U(orig)] = (pos << U(2)) | orient
        lookup_ij[(pos << U(2)) + U(orig)] = (ij << U(2)) | orient

    lookup_pos.setflags(write=False)
    lookup_ij.setflags(write=False)
    return lookup_pos, lookup_ij


LOOKUP_POS, LOOKUP_IJ = _build_tables()
