from . import oracle_sql  # noqa: F401
