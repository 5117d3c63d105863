"""Streaming gap sessionization (streaming/sessions.py) vs the batch twin.

Contract under test (module doc): after an in-order bounded replay,

* closed-session emissions == the batch sessionizer's output minus each
  user's final (still-open) session;
* with the event-time watermark flush, an open session whose close
  deadline the watermark passed is emitted too, with batch-identical
  fields and numbering;
* numbering survives a timeout flush (a returning user's next session
  continues where the batch twin's would).

The batch reference is q_events_sessionize's exact logic applied in
plain pandas (that operator itself is DuckDB-hash-verified by the entry
contract), so this file pins stream ≡ batch, not stream ≡ itself.
"""

import os
import time

import pandas as pd
import pytest

from searchengine_spark.streaming import sessions as sess_mod

GAP = sess_mod.SESSION_GAP_SEC


def _batch_sessions(rows):
    """Reference sessionizer: plain-python fold of (event_id, user, t, v)
    in (t, event_id) order — the batch twin's exact semantics."""
    out = {}
    for eid, u, t, v in sorted(rows, key=lambda r: (r[2], r[0])):
        s = out.setdefault(u, [])
        if not s or t - s[-1]["t_end"] > GAP:
            s.append(
                {"session_no": len(s) + 1, "n_events": 1, "t_start": t,
                 "t_end": t, "sum_value": v}
            )
        else:
            cur = s[-1]
            cur["n_events"] += 1
            cur["t_end"] = t
            cur["sum_value"] += v
    return {
        (u, c["session_no"]): (c["n_events"], c["t_start"], c["t_end"],
                               round(c["sum_value"], 4))
        for u, cs in out.items()
        for c in cs
    }


# deterministic 3-user event log; times in epoch seconds (UTC)
BASE = 1_700_000_000
FILE1 = [  # user 1 session A; user 2 session A starts
    (1, 1, BASE + 0, 1.0),
    (2, 1, BASE + 10, 2.0),
    (3, 2, BASE + 0, 5.0),
]
FILE2 = [  # user 1: new session (gap > 1800); user 2 extends session A
    (4, 1, BASE + 2000, 3.0),
    (5, 1, BASE + 2010, 4.0),
    (6, 2, BASE + 100, 7.0),
]
FILE3 = [  # a far-future user-3 event pushes the watermark past everyone
    (7, 3, BASE + 100_000, 9.0),
]
ALL = FILE1 + FILE2 + FILE3


def _write_file(path, rows):
    pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "user_id": [r[1] for r in rows],
            "ts": pd.to_datetime([r[2] for r in rows], unit="s").astype("datetime64[us]"),
            "value": [r[3] for r in rows],
        }
    ).to_parquet(path)
    time.sleep(1.1)  # distinct mtimes: file source orders batches by mtime


def _run(spark, in_dir, work_dir, watermark_delay):
    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType, TimestampNTZType,
    )

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("ts", TimestampNTZType()),
            StructField("value", DoubleType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    out = sess_mod.sessionize_stream(stream, watermark_delay=watermark_delay)
    sink = os.path.join(work_dir, "sessions")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", os.path.join(work_dir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    try:
        return {
            (r["user_id"], r["session_no"]): (
                r["n_events"], r["t_start"], r["t_end"],
                round(r["sum_value"], 4),
            )
            for r in spark.read.parquet(sink).collect()
        }
    except Exception:
        return {}


def test_stream_equals_batch_minus_open_sessions(spark, tmp_path):
    """No watermark flush: emissions are exactly the batch sessions minus
    each user's final session."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, rows in enumerate((FILE1, FILE2, FILE3)):
        _write_file(str(in_dir / f"f{i}.parquet"), rows)
    got = _run(spark, str(in_dir), str(tmp_path / "w1"), watermark_delay=None)
    batch = _batch_sessions(ALL)
    last = {}
    for (u, sn) in batch:
        last[u] = max(last.get(u, 0), sn)
    want = {k: v for k, v in batch.items() if k[1] != last[k[0]]}
    assert got == want, (got, want)


def test_watermark_flush_emits_expired_open_sessions(spark, tmp_path):
    """With a 0-second watermark, the far-future FILE3 event advances the
    watermark past every earlier user's close deadline, so their final
    sessions flush with batch-identical fields; only the watermark-driving
    user's own final session stays open."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, rows in enumerate((FILE1, FILE2, FILE3)):
        _write_file(str(in_dir / f"f{i}.parquet"), rows)
    got = _run(
        spark, str(in_dir), str(tmp_path / "w2"), watermark_delay="0 seconds"
    )
    batch = _batch_sessions(ALL)
    want = {k: v for k, v in batch.items() if k[0] != 3}  # user 3 still open
    assert got == want, (got, want)


def test_numbering_continues_after_flush_across_restart(spark, tmp_path):
    """A user who returns AFTER a timeout flush gets the next session
    number (the closed-marker state), matching the batch twin — proven
    across a stream restart on the same checkpoint."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    for i, rows in enumerate((FILE1, FILE2, FILE3)):
        _write_file(str(in_dir / f"f{i}.parquet"), rows)
    work = str(tmp_path / "w3")
    got1 = _run(spark, str(in_dir), work, watermark_delay="0 seconds")
    assert (1, 2) in got1  # user 1's second session flushed
    # user 1 returns much later; a user-4 event even further out pushes the
    # watermark past user 1's new deadline so the restart run flushes it
    file4 = [(8, 1, BASE + 200_000, 1.5), (9, 4, BASE + 400_000, 0.5)]
    _write_file(str(in_dir / "f3.parquet"), file4)
    got2 = _run(spark, str(in_dir), work, watermark_delay="0 seconds")
    batch = _batch_sessions(ALL + file4)
    assert got2[(1, 3)] == batch[(1, 3)], got2  # numbering continued: 3


def test_hourly_rollup_stream_matches_batch_closed_windows(spark, tmp_path):
    """Built-in tumbling window + watermark: every (hour, type) row the
    stream emits must equal the batch rollup's row, and every window the
    watermark closed must be emitted (only windows at/after the final
    watermark may be withheld)."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rows = [
        # two types across three distinct hours + one far-future event
        (1, 1, BASE + 0, 1.0, "view"),
        (2, 1, BASE + 100, 2.0, "view"),
        (3, 2, BASE + 200, 5.0, "click"),
        (4, 1, BASE + 4000, 3.0, "view"),
        (5, 2, BASE + 7300, 7.0, "click"),
        (6, 3, BASE + 100_000, 9.0, "view"),
    ]
    pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "user_id": [r[1] for r in rows],
            "ts": pd.to_datetime([r[2] for r in rows], unit="s").astype(
                "datetime64[us]"
            ),
            "value": [r[3] for r in rows],
            "event_type": [r[4] for r in rows],
        }
    ).to_parquet(str(in_dir / "f0.parquet"))
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
        TimestampNTZType,
    )

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("ts", TimestampNTZType()),
            StructField("value", DoubleType()),
            StructField("event_type", StringType()),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(str(in_dir))
    out = sess_mod.hourly_rollup_stream(stream)
    sink = str(tmp_path / "sink")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["hour_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(sink).collect()
    }
    # batch twin semantics, folded in plain python
    batch = {}
    for _, _, t, v, et in rows:
        k = (t - t % 3600, et)
        n, s = batch.get(k, (0, 0.0))
        batch[k] = (n + 1, round(s + v, 4))
    final_wm = max(r[2] for r in rows)  # 0-second delay
    closed = {k: v for k, v in batch.items() if k[0] + 3600 <= final_wm}
    # every emitted row is batch-exact, and all closed windows are emitted
    for k, v in got.items():
        assert batch[k] == v, (k, v, batch[k])
    assert set(closed) <= set(got), (sorted(closed), sorted(got))


def test_late_event_does_not_rewind_t_end(spark, tmp_path):
    """A late event that lands INSIDE an open session (possible across
    micro-batches: watermarks gate timeouts but do not drop late rows
    before applyInPandasWithState) must not rewind t_last. Regression:
    t_last was unconditionally set to the late event's time, so the next
    on-time event's gap was measured against the rewound value and the
    session falsely split; now t_end stays monotone and the stream output
    matches the batch twin exactly."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    # open session: events at +0 and +100 (t_last = +100)
    _write_file(str(in_dir / "f0.parquet"), [(1, 9, BASE + 0, 1.0),
                                             (2, 9, BASE + 100, 2.0)])
    # LATE event at +50 — inside the open session, before its t_last
    _write_file(str(in_dir / "f1.parquet"), [(3, 9, BASE + 50, 4.0)])
    # on-time event exactly GAP after the TRUE t_last (+100): must extend.
    # Against a rewound t_last (+50) the measured gap would be GAP+50 and
    # the session would falsely split.
    _write_file(str(in_dir / "f2.parquet"), [(4, 9, BASE + 100 + GAP, 8.0)])
    # far-future event opens session 2, closing session 1 for emission
    _write_file(str(in_dir / "f3.parquet"),
                [(5, 9, BASE + 100 + GAP * 3, 0.5)])
    got = _run(spark, str(in_dir), str(tmp_path / "w"), watermark_delay=None)
    rows = [(1, 9, BASE + 0, 1.0), (2, 9, BASE + 100, 2.0),
            (3, 9, BASE + 50, 4.0), (4, 9, BASE + 100 + GAP, 8.0),
            (5, 9, BASE + 100 + GAP * 3, 0.5)]
    batch = _batch_sessions(rows)
    assert got == {(9, 1): batch[(9, 1)]}, (got, batch)


def test_late_event_pulls_t_start_back(spark, tmp_path):
    """The symmetric half of the late-event fix: a late event EARLIER than
    the open session's first seen event must pull t_start back (min), so
    (t_start, t_end) match the batch sessionizer over the same rows.
    Regression: t_start stayed at the first-arrived event's time, so the
    emitted session claimed t_start later than an event it contained."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    # open session at +100 (t_start = t_last = +100)
    _write_file(str(in_dir / "f0.parquet"), [(1, 9, BASE + 100, 1.0)])
    # LATE event at +40 — inside gap range of the open session but BEFORE
    # its current t_start: must fold in AND rewind t_start to +40
    _write_file(str(in_dir / "f1.parquet"), [(2, 9, BASE + 40, 2.0)])
    # far-future event opens session 2, closing session 1 for emission
    _write_file(str(in_dir / "f2.parquet"),
                [(3, 9, BASE + 100 + GAP * 3, 0.5)])
    got = _run(spark, str(in_dir), str(tmp_path / "w"), watermark_delay=None)
    rows = [(1, 9, BASE + 100, 1.0), (2, 9, BASE + 40, 2.0),
            (3, 9, BASE + 100 + GAP * 3, 0.5)]
    batch = _batch_sessions(rows)
    assert got == {(9, 1): batch[(9, 1)]}, (got, batch)
    # the closed session must start at the late event's time
    assert got[(9, 1)][1] == BASE + 40  # (n_events, t_start, t_end, sum)


def test_hot_user_state_stays_o1_and_output_exact(spark, tmp_path):
    """A single user emitting thousands of events across many sessions
    must not grow state (one fixed-width row) and must sessionize
    batch-identically — the skew case a 100 TB event log actually has."""
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rows = []
    t = BASE
    for i in range(2000):
        # bursts of 4 events 10 s apart, then a gap that closes the session
        t += (GAP + 60) if i % 4 == 0 else 10
        rows.append((i + 1, 7, t, float(i % 5)))
    _write_file(str(in_dir / "f0.parquet"), rows[:1000])
    _write_file(str(in_dir / "f1.parquet"), rows[1000:])
    got = _run(spark, str(in_dir), str(tmp_path / "w"), watermark_delay=None)
    batch = _batch_sessions(rows)
    last = max(sn for (_, sn) in batch)
    want = {k: v for k, v in batch.items() if k[1] != last}
    assert len(want) == 499  # 500 sessions, one still open
    assert got == want
