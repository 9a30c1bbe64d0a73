"""Python UDF-surface extensions beyond the mr-compat layer: a pandas
(Arrow-batched) grouped aggregate and a Python UDTF.

The reference's entire UDF surface is the Go plugin Map/Reduce pair
(`pkg/mr/mr.go:96-98`, loaded via `internal/worker/worker.go:31-59`);
Spark adds scalar UDFs, grouped UDAFs, and table functions (UDTF,
Spark 3.5+). These exist to *declare* that surface with oracle-checked
semantics — hot paths stay on built-in functions per the design rules.

Both are shipped to workers by value (package-level
``register_pickle_by_value``), so they work under any driver cwd.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql.functions import pandas_udf, udtf


@pandas_udf("double")
def geomean(v: pd.Series) -> float:
    """Grouped-aggregate pandas UDAF: geometric mean. Arrow ships the
    group's values as one Series; numpy does the log/mean. Equivalent to
    exp(avg(ln(x))) — the DuckDB oracle's form."""
    import numpy as np

    return float(np.exp(np.log(v.to_numpy(dtype="float64")).mean()))


@udtf(returnType="word: string")
class SplitWords:
    """Python UDTF: tokenize one text into rows, reference tokenizer
    contract (split on non-letter runs, drop empties — FIXTURES.md §1).
    Used via a correlated LATERAL join; each eval() yields the row's
    tokens."""

    def eval(self, text: str):  # noqa: D102
        if text:
            for w in re.split(r"[^a-zA-Z]+", text):
                if w:
                    yield (w,)
