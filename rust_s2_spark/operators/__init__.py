from . import covering_join, dedup, knn, similarity, text  # noqa: F401
