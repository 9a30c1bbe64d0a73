from .queries import QUERIES, ORACLES, entry_query

__all__ = ["QUERIES", "ORACLES", "entry_query"]
