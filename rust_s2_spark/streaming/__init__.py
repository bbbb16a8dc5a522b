from .cell_stream import (  # noqa: F401
    assign_cells,
    streaming_first_seen,
    streaming_region_rollup,
    windowed_cell_counts,
)
