from .api import KeyValue, run_map_reduce, run_map_reduce_files, simple_reduce

__all__ = ["KeyValue", "run_map_reduce", "run_map_reduce_files", "simple_reduce"]
