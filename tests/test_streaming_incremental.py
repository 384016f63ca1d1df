"""Stateful incremental streaming: the chunked-parse analogue.

Drives stream_incremental_kg through drain -> restart -> drain:
conversation turns arrive across micro-batches (one even split
mid-triple across turns), per-conv state buffers them through the
streaming checkpoint, and the event-time gap timeout finalizes each
conversation exactly once with the full reassembled document.
"""

from __future__ import annotations

import datetime as dt
import glob
import os

import pytest

from tests.conftest import spark  # noqa: F401  (fixture)

T0 = dt.datetime(2026, 1, 1, 12, 0, 0)
GAP = 600  # seconds — conversations stay open across the two waves


def _rows(conv, chunks, t0, step=10, tool="ntriples", start_idx=0):
    return [
        (conv, start_idx + i, "user", text, tool,
         t0 + dt.timedelta(seconds=step * i))
        for i, text in enumerate(chunks)
    ]


SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp"
)

# conversation A: three turns, the second triple split mid-line across
# turns 1 and 2 — turn 2 arrives only in the second wave
A_CHUNKS = [
    "<http://ex/a> <http://ex/p> <http://ex/o1> .\n",
    "<http://ex/a> <http://ex/p> ",
    '"late chunk" .\n',
]
B_CHUNKS = [
    "<http://ex/b> <http://ex/p> <http://ex/o1> .\n",
    "<http://ex/b> <http://ex/q> \"v\" .\n",
]


def _write(spark, rows, path, n):  # noqa: F811
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)
    # one file per wave segment keeps micro-batches deterministic enough
    assert len(glob.glob(os.path.join(path, "*.parquet"))) >= n


def _drain(spark, inp, out):  # noqa: F811
    from raptor_spark.streaming.incremental import stream_incremental_kg

    stream_incremental_kg(
        spark, inp, out, gap_seconds=GAP, max_files_per_trigger=1
    )


def _result(spark, out):  # noqa: F811
    path = os.path.join(out, "triples")
    if not glob.glob(os.path.join(path, "*.parquet")):
        return []
    return [
        (r.conv_id, r.subj, r.pred, r.obj_kind, r.obj_lex)
        for r in spark.read.parquet(path).collect()
    ]


def test_incremental_assembly_across_drains(spark, tmp_path):  # noqa: F811
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")

    # wave 1: A's first two turns + all of B, then a watermark advancer
    _write(spark, _rows("A", A_CHUNKS[:2], T0), inp, 1)
    _write(spark, _rows("B", B_CHUNKS, T0), inp, 2)
    _write(
        spark,
        _rows("W1", ["<http://ex/w1> <http://ex/p> <http://ex/o> .\n"],
              T0 + dt.timedelta(seconds=300)),
        inp, 3,
    )
    _drain(spark, inp, out)
    got1 = _result(spark, out)
    # A must NOT be finalized yet (its last turn is still to come)
    assert not any(r[0] == "A" for r in got1)

    # wave 2: A's final turn first (its buffer must extend before any
    # watermark advance can fire A's timer), then a far-future advancer
    _write(
        spark,
        _rows("A", A_CHUNKS[2:], T0 + dt.timedelta(seconds=400),
              start_idx=2),
        inp, 4,
    )
    _drain(spark, inp, out)
    _write(
        spark,
        _rows("W2", ["<http://ex/w2> <http://ex/p> <http://ex/o> .\n"],
              T0 + dt.timedelta(seconds=2000)),
        inp, 5,
    )
    _drain(spark, inp, out)
    # one more empty-input drain gives timers a final chance to fire
    _write(
        spark,
        _rows("W3", ["<http://ex/w3> <http://ex/p> <http://ex/o> .\n"],
              T0 + dt.timedelta(seconds=4000)),
        inp, 6,
    )
    _drain(spark, inp, out)

    got = _result(spark, out)
    a_rows = sorted(r for r in got if r[0] == "A")
    b_rows = sorted(r for r in got if r[0] == "B")
    # B: both triples, exactly once
    assert b_rows == [
        ("B", "http://ex/b", "http://ex/p", 1, "http://ex/o1"),
        ("B", "http://ex/b", "http://ex/q", 2, "v"),
    ]
    # A: assembled from state across two drains, split line healed
    assert a_rows == [
        ("A", "http://ex/a", "http://ex/p", 1, "http://ex/o1"),
        ("A", "http://ex/a", "http://ex/p", 2, "late chunk"),
    ]


def test_windowed_rates_shape(spark, tmp_path):  # noqa: F811
    """The watermarked window aggregation compiles to a streaming plan
    and produces per-window counts on a batch drain."""
    from raptor_spark.streaming.incremental import (
        TRANSCRIPT_SCHEMA,
        windowed_rates,
    )

    inp = str(tmp_path / "in")
    _write(spark, _rows("A", A_CHUNKS, T0), inp, 1)
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(inp)
    )
    agg = windowed_rates(stream, window="1 minute", late="2 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("rates")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from rates").collect()
    assert rows and sum(r.n_turns for r in rows) == len(A_CHUNKS)
    assert all(r.tool == "ntriples" for r in rows)


def test_drain_on_non_utc_session_timezone(spark, tmp_path):  # noqa: F811
    """Event-time timeouts must not shift with the session timezone:
    the state function reads a JVM-computed UTC epoch column (ts_sec),
    because .timestamp() on the session-LOCAL naive pandas timestamp is
    offset by the timezone — west of UTC the timeout lands EARLIER than
    the watermark (a hard GroupState error), east of it conversations
    finalize hours late."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        _write(spark, _rows("C", B_CHUNKS[:1], T0), inp, 1)
        _drain(spark, inp, out)
        _write(
            spark,
            _rows("W", ["<http://ex/w> <http://ex/p> <http://ex/o> .\n"],
                  T0 + dt.timedelta(seconds=2000)),
            inp, 2,
        )
        _drain(spark, inp, out)
        _write(
            spark,
            _rows("W2", ["<http://ex/w2> <http://ex/p> <http://ex/o> .\n"],
                  T0 + dt.timedelta(seconds=4000)),
            inp, 3,
        )
        _drain(spark, inp, out)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    got = [r for r in _result(spark, out) if r[0] == "C"]
    assert got == [("C", "http://ex/b", "http://ex/p", 1, "http://ex/o1")]
