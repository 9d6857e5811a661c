"""Property-based tests (hypothesis): the algebraic laws the CDC
pipeline rests on, checked over arbitrary small logs — the
generalization of the example-based suites.

Laws:
1. Incrementality: merging a snapshot of the prefix with the net of
   the suffix == latest-state of the whole log, for ANY split point.
2. Idempotence: re-applying the same net change batch is a no-op.
3. Empty inputs flow through every core operator.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from aurora_cdc_demo_spark.operators.cdc_apply import (
    dedup_exactly_once,
    latest_state,
    net_changes,
    sessionize,
    upsert_merge,
)

EVENT = st.tuples(
    st.integers(min_value=0, max_value=5),  # key_id
    st.sampled_from(["INSERT", "UPDATE", "DELETE"]),
    st.integers(min_value=0, max_value=10_000),  # ts offset seconds
    st.integers(min_value=0, max_value=9900),  # value cents
)


def _log_df(spark, events):
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    rows = [
        (
            k,
            i,  # seq = arrival order
            op,
            "generated",
            base + timedelta(seconds=ts_off),
            cents / 100.0,
        )
        for i, (k, op, ts_off, cents) in enumerate(events)
    ]
    return spark.createDataFrame(
        rows,
        "key_id long, seq long, operation string, event_type string, "
        "ts timestamp, value double",
    )


def _states_equal(a, b) -> bool:
    cols = ["key_id", "seq", "operation", "ts"]
    pa = a.select(cols).toPandas().sort_values(cols).reset_index(drop=True)
    pb = b.select(cols).toPandas().sort_values(cols).reset_index(drop=True)
    return pa.equals(pb)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(EVENT, min_size=1, max_size=40),
    split_ts=st.integers(0, 10_000),
)
def test_merge_incrementality(spark, events, split_ts):
    """latest(all) == merge(latest(before T), net(from T)) for ANY
    time cutoff T — the law the batch pipeline's MERGE_SPLIT relies
    on. The split must be on event TIME: MERGE takes the change row
    unconditionally (reference semantics), so a seq-split that
    delivers an out-of-order OLDER change would overwrite a newer
    snapshot row (hypothesis found exactly that counterexample)."""
    log = _log_df(spark, events)
    from datetime import datetime, timedelta

    cut = datetime(2024, 1, 1) + timedelta(seconds=split_ts)
    prefix = log.where(F.col("ts") < F.lit(cut))
    suffix = log.where(F.col("ts") >= F.lit(cut))
    full = latest_state(log)
    incremental = upsert_merge(latest_state(prefix), net_changes(suffix))
    assert _states_equal(full, incremental)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=st.lists(EVENT, min_size=1, max_size=30))
def test_merge_idempotence(spark, events):
    """Applying the same net batch twice == applying it once."""
    log = _log_df(spark, events)
    net = net_changes(log)
    once = upsert_merge(latest_state(log.limit(0)), net)
    twice = upsert_merge(once, net)
    assert _states_equal(once, twice)


@pytest.mark.parametrize(
    "op",
    [latest_state, net_changes, dedup_exactly_once, sessionize],
    ids=["latest_state", "net_changes", "dedup_exactly_once", "sessionize"],
)
def test_operators_accept_empty_input(spark, op):
    empty = _log_df(spark, [(0, "INSERT", 0, 0)]).limit(0)
    out = op(empty)
    assert out.count() == 0


# -- TRUNCATE incrementality -------------------------------------------------

TEVENT = st.tuples(
    st.integers(min_value=0, max_value=5),  # key (key%2 routes the table)
    st.sampled_from(
        ["INSERT", "UPDATE", "UPDATE", "DELETE", "TRUNCATE"]
    ),
    st.integers(min_value=0, max_value=100),  # ts gap seconds
    st.integers(min_value=0, max_value=9900),  # value cents
)


def _tlog_df(spark, events):
    """Binlog-ordered log: ts is the cumulative gap sum, so seq order
    == time order (real binlog delivery). TRUNCATE rows are
    table-wide: key/value NULL, table routed by the generated key."""
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    rows, t = [], 0
    for i, (k, op, gap, cents) in enumerate(events):
        t += gap
        rows.append(
            (
                f"t{k % 2}",
                None if op == "TRUNCATE" else k,
                i,
                op,
                "generated",
                base + timedelta(seconds=t),
                None if op == "TRUNCATE" else cents / 100.0,
            )
        )
    return spark.createDataFrame(
        rows,
        "tbl string, key_id long, seq long, operation string, "
        "event_type string, ts timestamp, value double",
    )


def _apply_suffix_with_truncate(state, suffix):
    """One micro-batch apply over an existing state — the exact logic
    EvolvingCDCStateStore.apply_batch runs per batch (truncate
    frontier, drop truncated tables' state, merge net live rows)."""
    from aurora_cdc_demo_spark.operators.cdc_apply import (
        net_changes,
        upsert_merge,
    )

    key = ["tbl", "key_id"]
    truncs = (
        suffix.where(F.col("operation") == "TRUNCATE")
        .groupBy("tbl")
        .agg(F.max("seq").alias("_tseq"))
    )
    live = (
        suffix.join(truncs, "tbl", "left")
        .where(
            (F.col("operation") != "TRUNCATE")
            & (F.col("seq") > F.coalesce(F.col("_tseq"), F.lit(-1)))
        )
        .drop("_tseq")
    )
    state = (
        state.join(truncs, "tbl", "left")
        .where(F.col("_tseq").isNull())
        .drop("_tseq")
    )
    return upsert_merge(state, net_changes(live, key=key), key=key)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    events=st.lists(TEVENT, min_size=1, max_size=40),
    split_frac=st.integers(0, 100),
)
def test_truncate_incrementality(spark, events, split_frac):
    """latest_state_with_truncate(whole log) == streaming-style apply
    of the suffix over the prefix state, for ANY binlog-position
    split — the law EvolvingCDCStateStore's per-batch TRUNCATE
    handling relies on. Valid for SEQ splits (unlike the MERGE time
    law above) because binlog delivery is seq==time ordered."""
    from aurora_cdc_demo_spark.operators.cdc_apply import (
        latest_state_with_truncate,
    )

    log = _tlog_df(spark, events)
    cut = (len(events) * split_frac) // 100
    prefix = log.where(F.col("seq") < cut)
    suffix = log.where(F.col("seq") >= cut)
    full = latest_state_with_truncate(log)
    incremental = _apply_suffix_with_truncate(
        latest_state_with_truncate(prefix), suffix
    )
    cols = ["tbl", "key_id", "seq", "operation", "ts"]
    pa = full.select(cols).toPandas().sort_values(cols).reset_index(drop=True)
    pb = (
        incremental.select(cols)
        .toPandas()
        .sort_values(cols)
        .reset_index(drop=True)
    )
    assert pa.equals(pb)
