from .session import get_spark, load_tables, register_views, TABLES

__all__ = ["get_spark", "load_tables", "register_views", "TABLES"]
