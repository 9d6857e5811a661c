"""Custom stateful streaming operator: gap-based sessionization with
applyInPandasWithState — the streaming twin of
operators/cdc_apply.sessionize.

State per key: the open session (start, end, n_events, sum_value).
A micro-batch closes a session when it sees a gap > 30 min; closed
sessions are emitted (append mode), the trailing open session stays
in state for the next batch. This is the Arrow-batched, idiomatic
replacement for the reference's driver-side per-table loops.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

GAP_US = 30 * 60 * 1_000_000

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("key_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def _sessionize_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Vectorized gap-sessionization of one key's batch rows.

    Session boundaries are where the inter-event gap exceeds GAP_US —
    np.diff + reduceat instead of a per-row Python loop (the loop was
    the throughput ceiling of the Arrow worker: ~3x slower at sf0.1).
    """
    import numpy as np

    (key_id,) = key
    if state.exists:
        start_us, end_us, n_events, sum_value = state.get
    else:
        start_us, end_us, n_events, sum_value = None, None, 0, 0.0

    chunks = [pdf for pdf in pdfs if len(pdf)]
    closed: list[tuple] = []
    if chunks:
        pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
        pdf = pdf.sort_values(["ts", "seq"])
        ts = pdf["ts"].to_numpy("datetime64[ns]").astype("int64") // 1000
        vals = pdf["value"].to_numpy("float64")

        # row 0 ALWAYS starts the first segment for segmentation —
        # whether that segment continues the carried session is a
        # separate flag. (Folding the continuation test into
        # new_sess[0] made the first segment vanish from starts_idx
        # whenever the batch continued a carried session: an empty
        # index crash if the batch had no later gap, silently dropped
        # rows if it did — seen at maxFilesPerTrigger=4.)
        new_sess = np.zeros(len(ts), dtype=bool)
        new_sess[1:] = np.diff(ts) > GAP_US
        new_sess[0] = True
        continues = start_us is not None and (ts[0] - end_us) <= GAP_US

        starts_idx = np.flatnonzero(new_sess)
        bounds = np.append(starts_idx, len(ts))
        seg_start = ts[bounds[:-1]]
        seg_end = ts[bounds[1:] - 1]
        seg_n = np.diff(bounds)
        seg_sum = np.add.reduceat(vals, bounds[:-1])

        if start_us is not None:
            if continues:
                # first segment continues the carried session
                seg_start[0] = start_us
                seg_n[0] += n_events
                seg_sum[0] += sum_value
            else:
                # gap before this batch: the carried session closes
                closed.append((key_id, start_us, end_us, n_events, sum_value))
        closed.extend(
            (key_id, int(seg_start[j]), int(seg_end[j]), int(seg_n[j]),
             float(seg_sum[j]))
            for j in range(len(seg_start) - 1)
        )
        last = len(seg_start) - 1
        start_us, end_us = int(seg_start[last]), int(seg_end[last])
        n_events, sum_value = int(seg_n[last]), float(seg_sum[last])

    state.update((start_us, end_us, n_events, float(sum_value)))
    if closed:
        out = pd.DataFrame(
            closed,
            columns=["key_id", "start_us", "end_us", "n_events", "sum_value"],
        )
        yield pd.DataFrame(
            {
                "key_id": out["key_id"].astype("int64"),
                "session_start": pd.to_datetime(out["start_us"], unit="us"),
                "session_end": pd.to_datetime(out["end_us"], unit="us"),
                "n_events": out["n_events"].astype("int64"),
                "sum_value": out["sum_value"].astype("float64"),
            }
        )


def sessionize_stream(stream: DataFrame) -> DataFrame:
    """stream: typed CDC log (key_id, seq, operation, event_type,
    ts, value) → closed sessions, append mode.

    r10 (guide §4.1): project to the four columns the state function
    reads BEFORE the stateful exchange — groupBy+applyInPandasWithState
    is opaque to Catalyst, so without the explicit select the
    operation/event_type strings cross the per-batch shuffle AND the
    JVM→Python Arrow boundary only to be ignored."""
    return (
        stream.select("key_id", "seq", "ts", "value")
        .groupBy("key_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas variant (Spark 4.x stateful API)
# ---------------------------------------------------------------------------

try:  # pyspark >= 4.0, and the TWS state-server protocol needs protobuf
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    HAS_TWS = True
except ImportError:  # pragma: no cover - older pyspark / no protobuf
    StatefulProcessor = object  # type: ignore[assignment,misc]
    HAS_TWS = False


class SessionizeProcessor(StatefulProcessor):
    """Same gap-sessionization semantics as ``_sessionize_group`` on
    the transformWithState API: ValueState holds the open session;
    closed sessions are emitted. The new API adds RocksDB-backed
    state, timers and TTL — this processor needs only ValueState, so
    it stays a drop-in twin (state layout identical, outputs equal;
    pytest asserts both)."""

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._open = handle.getValueState("open_session", SESSION_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        (key_id,) = key
        if self._open.exists():
            start_us, end_us, n_events, sum_value = self._open.get()
        else:
            start_us, end_us, n_events, sum_value = None, None, 0, 0.0

        closed: list[tuple] = []
        # One key's rows can span multiple Arrow chunks (~10k rows each);
        # sorting each chunk independently is NOT a global ts order and
        # would let end_us move backwards. Concat first, sort once —
        # exactly what _sessionize_group does.
        chunks = [pdf for pdf in rows if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values(["ts", "seq"])
            ts_us = (pdf["ts"].astype("int64") // 1000).tolist()
            vals = pdf["value"].tolist()
            for t, v in zip(ts_us, vals):
                if start_us is None:
                    start_us, end_us, n_events, sum_value = t, t, 1, v
                elif t - end_us > GAP_US:
                    closed.append((key_id, start_us, end_us, n_events, sum_value))
                    start_us, end_us, n_events, sum_value = t, t, 1, v
                else:
                    end_us, n_events, sum_value = t, n_events + 1, sum_value + v

        self._open.update((start_us, end_us, n_events, float(sum_value)))
        if closed:
            out = pd.DataFrame(
                closed,
                columns=["key_id", "start_us", "end_us", "n_events", "sum_value"],
            )
            yield pd.DataFrame(
                {
                    "key_id": out["key_id"].astype("int64"),
                    "session_start": pd.to_datetime(out["start_us"], unit="us"),
                    "session_end": pd.to_datetime(out["end_us"], unit="us"),
                    "n_events": out["n_events"].astype("int64"),
                    "sum_value": out["sum_value"].astype("float64"),
                }
            )

    def close(self) -> None:
        pass


def sessionize_stream_tws(stream: DataFrame) -> DataFrame:
    """transformWithStateInPandas twin of :func:`sessionize_stream`.
    Requires the RocksDB state store provider (set by the caller):
    spark.sql.streaming.stateStore.providerClass =
    ...RocksDBStateStoreProvider"""
    return stream.select(
        "key_id", "seq", "ts", "value"
    ).groupBy("key_id").transformWithStateInPandas(
        SessionizeProcessor(),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
