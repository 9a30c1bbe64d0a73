from .registry import TABLES, load_table, load_tables, read_text_corpus

__all__ = ["TABLES", "load_table", "load_tables", "read_text_corpus"]
