"""Timestamp-encoding matrix (round-5 postmortem): the driver's testdata
generator has shipped ``events.ts`` as parquet TIMESTAMP(NANOS) (rounds
1-4) and as µs TIMESTAMP_NTZ (round 5) — each switch broke every
event-time consumer at once. ``sources.registry.normalize_event_time``
is the single owner of the fix; this matrix pins all three physical
encodings against the batch AND streaming event-time surfaces so the
next encoding change fails here first, loudly, with the encoding named.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from toymapreduce_go_spark.operators.events import (
    events_sessionize, events_tumbling)
from toymapreduce_go_spark.sources.registry import load_table

# Spans two hours and contains one >30-min gap per user, so tumbling
# produces multiple windows and sessionize produces multiple sessions.
_BASE = datetime.datetime(2024, 3, 1, 10, 0, 0)
_ROWS = [
    # (event_id, minutes-offset, user_id, event_type, value)
    (1, 0, 1, "click", 1.0),
    (2, 5, 1, "click", 2.0),
    (3, 90, 1, "error", 3.0),   # >30 min gap -> new session, new hour
    (4, 0, 2, "view", 4.0),
    (5, 61, 2, "click", 5.0),   # >30 min gap -> new session, new hour
    (6, 62, 2, "click", 6.0),
]
ENCODINGS = ("nanos", "us_ntz", "us_utc")


def _write_events(dir_path: str, encoding: str) -> str:
    ts = [_BASE + datetime.timedelta(minutes=m) for _, m, _, _, _ in _ROWS]
    if encoding == "nanos":
        ts_arr = pa.array(ts, type=pa.timestamp("ns"))
    elif encoding == "us_ntz":
        ts_arr = pa.array(ts, type=pa.timestamp("us"))
    else:  # us_utc -> isAdjustedToUTC=true, Spark TIMESTAMP natively
        ts_arr = pa.array(ts, type=pa.timestamp("us", tz="UTC"))
    table = pa.table({
        "event_id": pa.array([r[0] for r in _ROWS], type=pa.int64()),
        "ts": ts_arr,
        "user_id": pa.array([r[2] for r in _ROWS], type=pa.int64()),
        "event_type": pa.array([r[3] for r in _ROWS], type=pa.string()),
        "value": pa.array([r[4] for r in _ROWS], type=pa.float64()),
        "props": pa.array(["{}"] * len(_ROWS), type=pa.string()),
    })
    # store_schema=False drops the Arrow schema parquet metadata so Spark
    # infers from the PHYSICAL parquet type — the driver's generator goes
    # through pandas and keeps the metadata, but the physical type is what
    # decides NTZ-vs-TIMESTAMP inference either way.
    pq.write_table(table, f"{dir_path}/events.parquet",
                   use_deprecated_int96_timestamps=False,
                   coerce_timestamps=None, store_schema=False)
    return dir_path


@pytest.fixture(scope="module", params=ENCODINGS)
def events_dir(request, tmp_path_factory):
    d = tmp_path_factory.mktemp(f"events_{request.param}")
    return request.param, _write_events(str(d), request.param)


def test_load_table_normalizes_to_timestamp(spark, events_dir):
    encoding, d = events_dir
    df = load_table(spark, d, "events")
    assert df.schema["ts"].dataType.simpleString() == "timestamp", (
        f"{encoding}: load_table must yield session-tz TIMESTAMP, got "
        f"{df.schema['ts'].dataType.simpleString()}")
    # wall-clock value preserved exactly (session tz pinned UTC)
    first = df.orderBy("event_id").select("ts").first()[0]
    assert first.replace(tzinfo=None) == _BASE, (encoding, first)


def test_tumbling_identical_across_encodings(spark, events_dir):
    encoding, d = events_dir
    rows = sorted(
        (r.window_start.isoformat(), r.event_type, r.n_events, r.sum_value)
        for r in events_tumbling(load_table(spark, d, "events")).collect())
    assert rows == [
        ("2024-03-01T10:00:00", "click", 2, 3.0),
        ("2024-03-01T10:00:00", "view", 1, 4.0),
        ("2024-03-01T11:00:00", "click", 2, 11.0),
        ("2024-03-01T11:00:00", "error", 1, 3.0),
    ], encoding


def test_sessionize_identical_across_encodings(spark, events_dir):
    encoding, d = events_dir
    rows = sorted(
        (r.user_id, r.session_id, r.n_events)
        for r in events_sessionize(load_table(spark, d, "events")).collect())
    assert rows == [(1, 1, 2), (1, 2, 1), (2, 1, 1), (2, 2, 2)], encoding


def test_streaming_watermark_accepts_every_encoding(spark, events_dir):
    """round-5 failure mode: withWatermark raises
    EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on an unnormalized NTZ stream."""
    from toymapreduce_go_spark.streaming.events_stream import (
        read_events_stream, run_to_memory, stream_events_tumbling)

    encoding, d = events_dir
    stream = read_events_stream(spark, d)
    assert stream.schema["ts"].dataType.simpleString() == "timestamp", encoding
    run_to_memory(stream_events_tumbling(stream), f"t_enc_{encoding}", spark)
    got = sorted(
        (r.window_start.isoformat(), r.event_type, r.n_events, r.sum_value)
        for r in spark.table(f"t_enc_{encoding}").collect())
    assert got == [
        ("2024-03-01T10:00:00", "click", 2, 3.0),
        ("2024-03-01T10:00:00", "view", 1, 4.0),
        ("2024-03-01T11:00:00", "click", 2, 11.0),
        ("2024-03-01T11:00:00", "error", 1, 3.0),
    ], encoding


@pytest.fixture(scope="module")
def reference_results(spark, tmp_path_factory):
    """us_utc results for the wider events family — the fixed point the
    other encodings must reproduce byte-for-byte."""
    d = _write_events(str(tmp_path_factory.mktemp("events_ref")), "us_utc")
    return {name: _family_result(spark, d, name) for name in _FAMILY}


def _family_result(spark, d, name):
    from toymapreduce_go_spark.operators.events import (events_gapfill,
                                                        events_sliding)
    from toymapreduce_go_spark.operators.joins import events_asof_join
    from toymapreduce_go_spark.operators.relational import events_cube

    fns = {"sliding": events_sliding, "asof": events_asof_join,
           "cube": events_cube, "gapfill": events_gapfill}
    df = fns[name](load_table(spark, d, "events"))
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


_FAMILY = ("sliding", "asof", "cube", "gapfill")


@pytest.mark.parametrize("name", _FAMILY)
def test_events_family_identical_across_encodings(spark, events_dir,
                                                  reference_results, name):
    encoding, d = events_dir
    assert _family_result(spark, d, name) == reference_results[name], (
        encoding, name)
