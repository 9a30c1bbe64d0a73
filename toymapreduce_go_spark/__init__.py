"""toymapreduce_go_spark — a PySpark-native analytics engine with the
capabilities of the reference MapReduce runtime (sunyakun/toymapreduce-go),
re-expressed Spark-first.

Design stance (SURVEY.md §7): the DataFrame/Catalyst stack *is* the engine.
Everything the reference implements at the framework level (scheduling,
shuffle, retry, heartbeats — reference `internal/coordinator/coordinator.go`,
`internal/worker/worker.go`) is Spark core and costs zero code here. This
package is a library of:

- ``sources``   — typed table loading (Parquet first; CSV/JSON/text too)
- ``functions`` — reusable column expressions (tokenization, vector math,
                  text-quality features) that stay JVM-side
- ``operators`` — the declared query surface (SURVEY.md §2d) plus the
                  LLM-data-pipeline extensions (dedup, similarity search,
                  text analysis)
- ``mr``        — a thin map/reduce compat API matching the reference's
                  UDF plugin contract (`pkg/mr/mr.go:96-98`)
- ``plans``     — wiring from (spark, sf_dir) to deterministic,
                  oracle-checkable result DataFrames
- ``streaming`` — Structured Streaming variants of the event queries
- ``multimodal``— binary-column plumbing (decode/resize stubs)
"""

__version__ = "0.1.0"


def _register_pickle_by_value() -> None:
    """Ship this package's functions to Python workers by value.

    The driver process may import this package from a path its Spark
    Python workers don't share (no PYTHONPATH propagation in local mode);
    cloudpickle pickles module-level functions by reference by default,
    which then fails to import on the worker. Registering the package for
    pickle-by-value makes every mr-compat / mapInPandas closure
    self-contained. Registering the top package covers all submodules.
    """
    try:
        import sys

        from pyspark import cloudpickle

        cloudpickle.register_pickle_by_value(sys.modules[__name__])
    except Exception:
        pass  # older cloudpickle: fall back to normal by-reference pickling


_register_pickle_by_value()
