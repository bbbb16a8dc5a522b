from .cell_stream import assign_cells, windowed_cell_counts  # noqa: F401
