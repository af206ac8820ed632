from .tables import read_pages, read_table, table_path

__all__ = ["read_pages", "read_table", "table_path"]
