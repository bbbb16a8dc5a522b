from .cell_stream import (  # noqa: F401
    assign_cells,
    streaming_first_seen,
    windowed_cell_counts,
)
