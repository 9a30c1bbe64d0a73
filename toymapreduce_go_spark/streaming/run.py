"""Shared driver for the availableNow foreachBatch jobs (telemetry,
incremental dedup, composed ingest): one checkpoint under the job's
state dir, and a FAIL-LOUD timeout contract shared by all three —
``awaitTermination(timeout)`` returning False means the run OUTLIVED
the budget, and treating that as success would report a committed
PREFIX of batches as the whole job."""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame


def run_available_now(stream_df: DataFrame, state_dir: str,
                      step: Callable[[DataFrame, int], None],
                      timeout: int):
    """Start ``stream_df`` → ``foreachBatch(step)`` with the checkpoint
    under ``state_dir``, drain all currently-available input
    (availableNow; production leaves the query running), and return the
    finished query — or stop it and raise TimeoutError if the budget
    elapses first (the state dir then holds only the committed prefix;
    re-running resumes from the checkpoint)."""
    ckpt = os.path.join(state_dir, "_checkpoint")
    q = (stream_df.writeStream
         .foreachBatch(step)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True)
         .start())
    if not q.awaitTermination(timeout):
        q.stop()
        raise TimeoutError(
            f"streaming run did not finish within {timeout}s "
            f"(state under {state_dir!r} holds only the committed "
            f"prefix; re-run to resume from the checkpoint)")
    return q
