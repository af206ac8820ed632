from .tables import (
    documents_row_count,
    read_documents_varied,
    read_pages,
    read_table,
    read_tabular,
    table_path,
)

__all__ = [
    "documents_row_count",
    "read_documents_varied",
    "read_pages",
    "read_table",
    "read_tabular",
    "table_path",
]
