from .images import images_from_orders, oracle_images_sql  # noqa: F401
