"""Streaming gap sessionization — custom stateful session-window operator.

The batch twin is ``plans/entry_queries.q_events_sessionize`` (DuckDB
hash-oracle-checked); this module is the STREAMING side of the same
semantics: an events stream flows through ``applyInPandasWithState`` keyed
by ``user_id``, the per-user state row holds the ONE currently-open
session, and a finished session row is emitted the moment an event arrives
more than ``gap_sec`` after the previous one (closing the elapsed session
and opening the next). With an event-time watermark the operator ALSO
flushes an open session once the watermark passes its close deadline
(``EventTimeTimeout``), so idle users' last sessions are emitted instead
of being held in state forever.

Correctness contract vs the batch twin (property-tested in
``tests/test_streaming_sessions.py``): after an in-order replay of a
bounded event set,

* WITHOUT timeout flush, the emitted rows are exactly the batch twin's
  sessions minus each user's final session (which is still open);
* WITH the watermark flush, a user whose close deadline the watermark
  passed has that final session emitted too — identical fields, same
  ``session_no`` numbering (both sides number in event order).

Scale design: state is keyed by ``user_id`` directly — session state is a
single fixed-width row per user (never a growing collection, unlike the
frontier's visited set), and a user's event rate is human-bounded, so
per-key state cannot become a hot-spot payload; the shuffle is the one
keyed exchange any sessionizer needs. Late (out-of-order) events belong to
the watermark contract: events later than the configured delay are subject
to the same drop/misattribution semantics as Spark's built-in session
windows — the batch twin over the full log remains the exactness
reference.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

SESSION_GAP_SEC = 1800  # same default as the batch twin

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_no", LongType()),
        StructField("n_events", LongType()),
        StructField("t_start", LongType()),
        StructField("t_end", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)
# the ONE open session of this user — fixed width, O(1) per key
STATE_SCHEMA = StructType(
    [
        StructField("session_no", LongType()),
        StructField("t_start", LongType()),
        StructField("t_last", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def _session_fn_factory(gap_sec: int, use_timeout: bool):
    def fn(key, pdf_iter, state: GroupState):
        user_id = int(key[0])

        def row(sn, ts, tl, n, sv):
            return pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_no": [sn],
                    "n_events": [n],
                    "t_start": [ts],
                    "t_end": [tl],
                    "sum_value": [round(sv, 4)],
                }
            )

        if use_timeout and state.hasTimedOut:
            # watermark passed the open session's close deadline: flush it.
            # Keep a CLOSED-marker state row (n_events = 0) so a returning
            # user's numbering continues where the batch twin's would —
            # per-user residue is one fixed-width row, not a growing set.
            sn, ts, tl, n, sv = state.get
            state.update((sn, 0, 0, 0, 0.0))
            yield row(sn, ts, tl, n, sv)
            return

        events = [pdf for pdf in pdf_iter if len(pdf)]
        out = []
        sn = ts = tl = n = None
        sv = 0.0
        last_closed_no = 0
        if state.exists:
            sn, ts, tl, n, sv = state.get
            if n == 0:  # closed marker: no open session, remember numbering
                last_closed_no, sn = sn, None
        if events:
            pdf = pd.concat(events, ignore_index=True)
            ts_ser = pd.to_datetime(pdf["_ts"])
            if getattr(ts_ser.dt, "tz", None) is not None:
                ts_ser = ts_ser.dt.tz_convert("UTC").dt.tz_localize(None)
            pdf = pdf.assign(
                t=ts_ser.astype("datetime64[ns]").astype("int64")
                // 1_000_000_000
            ).sort_values(["t", "event_id"])
            for t, v in zip(pdf["t"], pdf["value"]):
                t = int(t)
                if sn is None:
                    sn, ts, tl, n, sv = last_closed_no + 1, t, t, 1, float(v)
                elif t - tl > gap_sec:
                    out.append(row(sn, ts, tl, n, sv))
                    sn, ts, tl, n, sv = sn + 1, t, t, 1, float(v)
                else:
                    # A late event inside the open session (possible across
                    # micro-batches: watermarks gate timeouts but do not drop
                    # late rows before applyInPandasWithState) must not
                    # rewind t_last — keep t_end monotone so the next
                    # on-time event's gap is measured against the true
                    # latest event time — and symmetrically must pull
                    # t_start back if it precedes the session's first seen
                    # event, so (t_start, t_end) match what the batch
                    # sessionizer computes over the same rows.  The
                    # late-event caveat in the module docstring then covers
                    # attribution only.
                    ts, tl, n, sv = min(ts, t), max(tl, t), n + 1, sv + float(v)
        if sn is not None:
            deadline_ms = (tl + gap_sec) * 1000
            if use_timeout and deadline_ms <= state.getCurrentWatermarkMs():
                # already expired by event time — emit now, keep only the
                # closed numbering marker
                out.append(row(sn, ts, tl, n, sv))
                state.update((sn, 0, 0, 0, 0.0))
            else:
                state.update((sn, ts, tl, n, sv))
                if use_timeout:
                    state.setTimeoutTimestamp(deadline_ms)
        for o in out:
            yield o

    return fn


def sessionize_stream(
    events: DataFrame,
    gap_sec: int = SESSION_GAP_SEC,
    watermark_delay: str | None = "0 seconds",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming events (event_id, user_id, ts, value) → CLOSED session
    rows (user_id, session_no, n_events, t_start, t_end, sum_value —
    epoch-second bounds, the batch twin's exact schema).

    ``watermark_delay=None`` disables the event-time flush (sessions close
    only when a later event arrives past the gap); any delay string
    enables ``EventTimeTimeout``, flushing an open session once the
    watermark passes ``t_last + gap_sec``."""
    e = events.select(
        "event_id",
        "user_id",
        F.col(ts_col).cast("timestamp").alias("_ts"),
        "value",
    )
    use_timeout = watermark_delay is not None
    if use_timeout:
        # the watermarked ATTRIBUTE must reach the stateful operator for
        # EventTimeTimeout to be allowed — _ts is kept in the frame and
        # converted to epoch seconds inside the kernel
        e = e.withWatermark("_ts", watermark_delay)
    return e.groupBy("user_id").applyInPandasWithState(
        _session_fn_factory(gap_sec, use_timeout),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if use_timeout
            else GroupStateTimeout.NoTimeout
        ),
    )


def hourly_rollup_stream(
    events: DataFrame,
    watermark_delay: str = "0 seconds",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming tumbling 1-hour rollup — the built-in-operator twin of
    ``q_events_hourly`` (where sessionization above needs a CUSTOM stateful
    kernel, this needs none: ``groupBy(window(...))`` + a watermark is the
    whole operator, and Spark manages the window state). Append mode emits
    each (hour, event_type) row exactly once, when the watermark passes
    the hour's end. Output schema matches the batch twin: (hour_start
    epoch-seconds, event_type, n_events, sum_value)."""
    e = events.select(
        F.col(ts_col).cast("timestamp").alias("_ts"), "event_type", "value"
    ).withWatermark("_ts", watermark_delay)
    return (
        e.groupBy(F.window("_ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
