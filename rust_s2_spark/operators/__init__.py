from . import (  # noqa: F401
    covering_join,
    dedup,
    knn,
    multimodal,
    packing,
    pip,
    polyline,
    sampling,
    sessions,
    similarity,
    text,
    tiles,
)
